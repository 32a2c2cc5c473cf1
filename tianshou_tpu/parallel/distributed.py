"""Multi-host (multi-process) scaling via ``jax.distributed``.

This is the replacement for the reference's ``RayVectorEnv``/``RayEnvWorker``
cluster path (reference env/venvs.py:449-473, env/worker/ray.py): instead of
shipping envs to ray actors and gathering transitions over RPC, every host
runs the SAME SPMD program over the global device mesh. Each process owns its
local env shard and its local slice of the replay ring; XLA routes gradient
psums over ICI within a host and DCN across hosts. No hand-written
communication layer exists — the per-host code is identical to the
single-host code, modulo :func:`initialize` and :func:`make_global_mesh`.

Tested without a cluster by the two-process CPU harness in
``tests/test_distributed.py`` (each process gets 4 virtual CPU devices via
``--xla_force_host_platform_device_count``), mirroring how the reference
tests its "distributed" env layer in-process (SURVEY.md §4.5).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize",
    "make_global_mesh",
    "process_env_slice",
    "host_local_to_global",
    "global_to_host_local",
]


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_ids: Sequence[int] | None = None,
) -> None:
    """Join the jax.distributed cluster (idempotent).

    On TPU pods the three arguments are auto-detected and callers can pass
    the values straight from the scheduler; on CPU/GPU test rigs they are
    explicit. After this returns, ``jax.devices()`` is the GLOBAL device
    list and collectives span hosts.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:  # already initialized — allow warm re-entry
        if "already initialized" not in str(e).lower():
            raise


def make_global_mesh(axis_name: str = "dp") -> Mesh:
    """1-D data-parallel mesh over ALL devices of ALL processes."""
    return Mesh(np.array(jax.devices()), (axis_name,))


def process_env_slice(total_envs: int) -> tuple[int, int]:
    """(start, count) of the env indices this process owns.

    Envs are sharded contiguously by process so that a ``[E, ...]`` global
    array sharded over the mesh's dp axis has exactly this process's rows
    addressable locally.
    """
    n, pid = jax.process_count(), jax.process_index()
    assert total_envs % n == 0, f"total_envs={total_envs} must divide by process_count={n}"
    per = total_envs // n
    return pid * per, per


def host_local_to_global(local: Any, mesh: Mesh, axis_name: str = "dp") -> Any:
    """Assemble a GLOBAL array (sharded on the leading axis) from each
    process's local shard — the entry point for feeding per-host env state
    or replay shards into a jitted SPMD program."""
    sharding = NamedSharding(mesh, P(axis_name))

    def build(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(build, local)


def global_to_host_local(global_tree: Any) -> Any:
    """Pull this process's addressable rows of a leading-axis-sharded global
    array back to host numpy (e.g. for per-host logging or env resets)."""

    def take(x):
        shards = [s for s in x.addressable_shards]
        shards.sort(key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    return jax.tree.map(take, global_tree)
