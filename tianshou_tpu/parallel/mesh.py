"""Device-mesh scaling utilities.

The reference scales with worker processes (``SubprocVectorEnv``), ray actors
and ``nn.DataParallel`` (SURVEY.md §2b). Here scaling is SPMD over a
``jax.sharding.Mesh``: the environment axis of the collector and the batch
axis of updates are sharded across devices; parameters are replicated; XLA
inserts the gradient all-reduces (psum over ICI) during partitioning. No
hand-written communication layer exists or is needed — the same jitted
collect->update program runs on 1 chip or N.

``make_dp_train_step`` builds the data-parallel PPO-style megastep used by
``__graft_entry__.dryrun_multichip`` and by multi-chip training runs.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "replicate",
    "shard_leading",
    "shard_params_tp",
    "make_dp_train_step",
    "make_dp_offpolicy_train_step",
]


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def make_mesh_2d(n_devices: int, mp: int = 2, axis_names: tuple[str, str] = ("dp", "mp")) -> Mesh:
    """2-D mesh for data x model (tensor) parallelism."""
    assert n_devices % mp == 0
    devs = np.array(jax.devices()[:n_devices]).reshape(n_devices // mp, mp)
    return Mesh(devs, axis_names)


def shard_params_tp(params: Any, mesh: Mesh, axis_name: str = "mp") -> Any:
    """Megatron-style tensor-parallel placement for dense params: 2-D
    kernels shard their output dim over the model axis, biases/1-D params
    replicate. XLA inserts the activation all-reduces during partitioning —
    the sharding-annotation recipe of the scaling playbook, no hand-written
    collectives."""

    mp = mesh.shape[axis_name]

    def place(x):
        if hasattr(x, "ndim") and x.ndim == 2 and x.shape[1] % mp == 0:
            return jax.device_put(x, NamedSharding(mesh, P(None, axis_name)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, params)


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_leading(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def _constrain_leading(tree: Any, mesh: Mesh, axis_name: str) -> Any:
    sh = NamedSharding(mesh, P(axis_name))

    def c(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.lax.with_sharding_constraint(x, sh)
        return x

    return jax.tree.map(c, tree)


def make_dp_train_step(
    algo, collector, mesh: Mesh, n_steps: int, repeat: int, batch_size: int,
    axis_name: str = "dp", tp_axis: str | None = None,
):
    """One data-parallel on-policy megastep: collect -> update_rollout.

    Env-state/obs leaves are sharded on their leading (env) axis; the train
    state is replicated (pure DP) or, when ``tp_axis`` names a second mesh
    axis, dense kernels stay sharded over it (tensor parallelism via
    :func:`shard_params_tp` — apply it to ``ts.params`` before calling). XLA
    partitions the whole program and emits the psum/all-gather collectives —
    the analogue of the reference's DataParallelNet (net/common.py:473)
    without a replication wrapper.
    """

    def step(ts, cstate, key):
        cstate = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(axis_name)))
            if hasattr(x, "ndim") and x.ndim >= 1
            else x,
            cstate,
        )
        if tp_axis is not None:
            mp = mesh.shape[tp_axis]

            def keep_tp(x):
                if hasattr(x, "ndim") and x.ndim == 2 and x.shape[1] % mp == 0:
                    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(None, tp_axis)))
                return x

            ts = ts.replace(params=jax.tree.map(keep_tp, ts.params))
        k1, k2 = jax.random.split(key)
        (cstate, _), out = _collect_scan(ts, cstate, k1)
        ts, stats = algo.update_rollout(ts, out.rollout, k2, repeat=repeat, batch_size=batch_size)
        return ts, cstate, stats

    def _collect_scan(ts, cstate, key):
        keys = jax.random.split(key, n_steps)

        def body(carry, k):
            return collector._step_fn(ts, carry, k, training=True, store=False, keep_rollout=True)

        return jax.lax.scan(body, (cstate, None), keys)

    return jax.jit(step)


def make_dp_offpolicy_train_step(
    algo, collector, buffer, mesh: Mesh, n_steps: int, n_updates: int, batch_size: int,
    axis_name: str = "dp",
):
    """One data-parallel OFF-policy megastep: collect into a SHARDED replay
    buffer, then a burst of gradient steps — the mesh analogue of
    ``OffPolicyTrainer._build_megastep``.

    The ring storage ``[E, C, ...]`` and the per-env cursors ``[E]`` are
    sharded on their leading env axis over ``axis_name``; the train state is
    replicated. The big arrays (buffer storage, env state) never move:
    writes during the collect scan are shard-local, and only the sampled
    minibatch (tiny) crosses shards — XLA inserts those gathers plus the
    gradient psum during partitioning. This is the replacement for the
    reference's replay-on-host + ``nn.DataParallel`` split
    (net/common.py:473) with a single SPMD program.
    """

    def _constrain_buf(buf_state):
        # every BufferState leaf (data [E,C,...], cursor/size/last_idx [E])
        # carries the env axis in front
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(axis_name)))
            if hasattr(x, "ndim") and x.ndim >= 1
            else x,
            buf_state,
        )

    def step(ts, cstate, buf_state, key):
        cstate = _constrain_leading(cstate, mesh, axis_name)
        buf_state = _constrain_buf(buf_state)
        k_c, k_u = jax.random.split(key)
        keys = jax.random.split(k_c, n_steps)

        def c_body(carry, k):
            return collector._step_fn(ts, carry, k, training=True, store=True, keep_rollout=False)

        (cstate, buf_state), out = jax.lax.scan(c_body, (cstate, buf_state), keys)
        buf_state = _constrain_buf(buf_state)

        def u_body(carry, k):
            ts, buf_state = carry
            ts, buf_state, stats = algo.update(ts, buffer, buf_state, k, batch_size)
            return (ts, buf_state), stats

        (ts, buf_state), ustats = jax.lax.scan(
            u_body, (ts, buf_state), jax.random.split(k_u, n_updates)
        )
        return ts, cstate, buf_state, out, ustats

    return jax.jit(step)
