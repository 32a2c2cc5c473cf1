"""Checkpoint / persistence.

Rebuild of the reference's multi-level persistence (SURVEY.md §5):
- train-state checkpoints (params + target params + OPTIMIZER state +
  hparams/step, matching ``Algorithm.state_dict`` algorithm_base.py:523-543)
  via orbax;
- replay-buffer save/load to HDF5 (buffer_base.py:252-263) and
  ``buffer_from_data`` for offline datasets (:265-295).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import json
import numpy as np

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import BufferState

__all__ = [
    "save_train_state",
    "restore_train_state",
    "save_buffer_hdf5",
    "load_buffer_hdf5",
    "buffer_from_data",
    "buffer_from_d4rl",
    "load_d4rl_hdf5",
]


def save_train_state(path: str, ts: Any) -> str:
    """Orbax checkpoint of a TrainState pytree (incl. optimizer state)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(ts), force=True)
    ckptr.wait_until_finished()
    return path


def restore_train_state(path: str, ts_template: Any) -> Any:
    """Restore into the structure of ``ts_template`` (from ``algo.init``)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), ts_template)


# ---------------------------------------------------------------------------
# HDF5 buffer persistence (reference buffer_base.py:252, utils/converter.py)
# ---------------------------------------------------------------------------


def _write_tree(group, name: str, tree: Any) -> None:
    if isinstance(tree, tuple) and hasattr(tree, "_fields"):  # NamedTuple state
        sub = group.create_group(name)
        sub.attrs["__type__"] = type(tree).__name__
        for k in tree._fields:
            _write_tree(sub, k, getattr(tree, k))
    elif isinstance(tree, Batch):
        sub = group.create_group(name)
        sub.attrs["__type__"] = "Batch"
        # preserve key order: Batch key order is part of the pytree treedef,
        # so a load that alphabetizes keys would not match the live jit cache
        sub.attrs["__keys__"] = json.dumps(list(tree.keys()))
        for k, v in tree.items():
            _write_tree(sub, k, v)
    else:
        group.create_dataset(name, data=np.asarray(tree))


_STATE_TYPES: dict[str, Any] = {}


def _state_type(name: str):
    if not _STATE_TYPES:
        from tianshou_tpu.data.buffer.base import BufferState as _B
        from tianshou_tpu.data.buffer.cached import CachedState as _C
        from tianshou_tpu.data.buffer.prio import PrioState as _P

        _STATE_TYPES.update({"BufferState": _B, "PrioState": _P, "CachedState": _C})
    return _STATE_TYPES[name]


def _read_tree(node, to_device: bool = True) -> Any:
    import h5py

    if isinstance(node, h5py.Group):
        typ = node.attrs.get("__type__", "Batch")
        if typ == "Batch":
            keys = node.attrs.get("__keys__")
            order = json.loads(keys) if keys is not None else list(node)
            b = Batch()
            for k in order:
                b[k] = _read_tree(node[k], to_device)
            return b.to_jax() if to_device else b
        cls = _state_type(typ)
        return cls(**{k: _read_tree(node[k], to_device) for k in node})
    arr = np.asarray(node)
    return jnp.asarray(arr) if to_device else arr


def save_buffer_hdf5(path: str, state: Any) -> None:
    """Persist ANY buffer state (plain ``BufferState``, PER ``PrioState``
    incl. sum tree + max/min priority, ``CachedState``) — reference
    buffer_base.py:252-263 saves whole buffer objects."""
    import h5py

    with h5py.File(path, "w") as f:
        _write_tree(f, "state", state)


def load_buffer_hdf5(path: str, to_device: bool = True) -> Any:
    import h5py

    with h5py.File(path, "r") as f:
        if "state" in f:
            return _read_tree(f["state"], to_device)
        # legacy round-1 layout (flat BufferState fields)
        data = _read_tree(f["data"], to_device)
        return BufferState(
            data=data,
            cursor=jnp.asarray(np.asarray(f["cursor"])),
            size=jnp.asarray(np.asarray(f["size"])),
            last_idx=jnp.asarray(np.asarray(f["last_idx"])),
        )


def buffer_from_data(
    buffer_cls,
    obs: np.ndarray,
    act: np.ndarray,
    rew: np.ndarray,
    terminated: np.ndarray,
    truncated: np.ndarray,
    obs_next: np.ndarray,
) -> tuple[Any, BufferState]:
    """Build a full device buffer from flat offline arrays
    (reference ReplayBuffer.from_data buffer_base.py:265)."""
    n = len(obs)
    buf = buffer_cls(n) if not hasattr(buffer_cls, "capacity") else buffer_cls
    done = np.logical_or(terminated, truncated)
    data = Batch(
        obs=jnp.asarray(obs)[None], act=jnp.asarray(act)[None], rew=jnp.asarray(rew, np.float32)[None],
        terminated=jnp.asarray(terminated)[None], truncated=jnp.asarray(truncated)[None],
        done=jnp.asarray(done)[None], obs_next=jnp.asarray(obs_next)[None],
    )
    state = BufferState(
        data=data,
        cursor=jnp.zeros(1, jnp.int32),
        size=jnp.full(1, n, jnp.int32),
        last_idx=jnp.full(1, n - 1, jnp.int32),
    )
    return buf, state


def buffer_from_d4rl(dataset, buffer_cls=None) -> tuple[Any, BufferState]:
    """Device buffer from a d4rl-layout dataset (in-memory dict or open
    h5py.File): ``observations / actions / rewards / terminals /
    next_observations`` (+ optional ``timeouts``), exactly the contract of
    ``d4rl.qlearning_dataset`` that the reference's offline examples consume
    (reference examples/offline/utils.py:10-33)."""
    from tianshou_tpu.data.buffer.base import ReplayBuffer

    terminals = np.asarray(dataset["terminals"], bool)
    timeouts = (
        np.asarray(dataset["timeouts"], bool)
        if "timeouts" in dataset
        else np.zeros(len(terminals), bool)
    )
    return buffer_from_data(
        buffer_cls or ReplayBuffer,
        obs=np.asarray(dataset["observations"]),
        act=np.asarray(dataset["actions"]),
        rew=np.asarray(dataset["rewards"]),
        terminated=terminals,
        truncated=timeouts & ~terminals,
        obs_next=np.asarray(dataset["next_observations"]),
    )


def load_d4rl_hdf5(path: str, buffer_cls=None) -> tuple[Any, BufferState]:
    """Ingest an external d4rl-format HDF5 dataset file into a device buffer
    (reference examples/offline/utils.py:23 ``load_buffer``)."""
    import h5py

    with h5py.File(path, "r") as f:
        return buffer_from_d4rl(f, buffer_cls)
