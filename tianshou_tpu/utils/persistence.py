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
import numpy as np

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import BufferState

__all__ = [
    "save_train_state",
    "restore_train_state",
    "save_buffer_hdf5",
    "load_buffer_hdf5",
    "buffer_from_data",
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
    if isinstance(tree, Batch):
        sub = group.create_group(name)
        sub.attrs["__type__"] = "Batch"
        for k, v in tree.items():
            _write_tree(sub, k, v)
    else:
        group.create_dataset(name, data=np.asarray(tree))


def _read_tree(node) -> Any:
    import h5py

    if isinstance(node, h5py.Group):
        b = Batch()
        for k in node:
            b[k] = _read_tree(node[k])
        return b
    return np.asarray(node)


def save_buffer_hdf5(path: str, state: BufferState) -> None:
    import h5py

    with h5py.File(path, "w") as f:
        _write_tree(f, "data", state.data)
        f.create_dataset("cursor", data=np.asarray(state.cursor))
        f.create_dataset("size", data=np.asarray(state.size))
        f.create_dataset("last_idx", data=np.asarray(state.last_idx))


def load_buffer_hdf5(path: str, to_device: bool = True) -> BufferState:
    import h5py

    with h5py.File(path, "r") as f:
        data = _read_tree(f["data"])
        state = BufferState(
            data=data.to_jax() if to_device else data,
            cursor=jnp.asarray(np.asarray(f["cursor"])),
            size=jnp.asarray(np.asarray(f["size"])),
            last_idx=jnp.asarray(np.asarray(f["last_idx"])),
        )
    return state


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
    example = Batch(
        obs=jnp.asarray(obs[0]), act=jnp.asarray(act[0]), rew=jnp.float32(rew[0]),
        terminated=jnp.bool_(terminated[0]), truncated=jnp.bool_(truncated[0]),
        obs_next=jnp.asarray(obs_next[0]),
    )
    state = buf.init(example)
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
