"""Prioritized experience replay (arXiv:1511.05952) on device.

Rebuild of the reference's ``PrioritizedReplayBuffer`` (data/buffer/prio.py:12)
+ ``PrioritizedReplayBufferManager`` (manager.py:239): alpha/beta scheduling,
max-priority init on add, prefix-sum inverse sampling through the XLA segment
tree, importance weights normalized by the minimum priority (weight_norm).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import AddInfo, BufferState, ReplayBuffer
from tianshou_tpu.ops.segtree import SegmentTree

__all__ = ["PrioState", "PrioritizedReplayBuffer", "PrioritizedVectorReplayBuffer"]


class PrioState(NamedTuple):
    base: BufferState
    tree: jnp.ndarray      # sum tree over total_size leaves (priority^alpha)
    max_prio: jnp.ndarray  # scalar
    min_prio: jnp.ndarray  # scalar


class PrioritizedReplayBuffer(ReplayBuffer):
    def __init__(
        self,
        size: int,
        alpha: float = 0.6,
        beta: float = 0.4,
        num_envs: int = 1,
        weight_norm: bool = True,
        eps: float = 1e-5,
        **kwargs,
    ) -> None:
        super().__init__(size, num_envs=num_envs, **kwargs)
        self.alpha = alpha
        self.beta = beta
        self.weight_norm = weight_norm
        self.eps = eps
        self.segtree = SegmentTree(self.total_size)

    # ------------------------------------------------------------------
    def init(self, example: Batch) -> PrioState:  # type: ignore[override]
        base = super().init(example)
        return PrioState(
            base=base,
            tree=self.segtree.init(),
            max_prio=jnp.float32(1.0),
            min_prio=jnp.float32(1.0),
        )

    # ------------------------------------------------------------------
    def add(
        self, state: PrioState, transitions: Batch, mask: jnp.ndarray | None = None
    ) -> tuple[PrioState, AddInfo]:  # type: ignore[override]
        base, info = ReplayBuffer.add(self, state.base, transitions, mask)
        # new samples get max priority (reference prio.py:46 init_weight);
        # masked-out envs carry -1 indices, which the segtree drops
        prio = jnp.full(info.indices.shape, state.max_prio**self.alpha)
        tree = self.segtree.update(state.tree, info.indices, prio)
        return PrioState(base, tree, state.max_prio, state.min_prio), info

    # ------------------------------------------------------------------
    def sample_indices(self, state: PrioState, key: jax.Array, batch_size: int) -> jnp.ndarray:  # type: ignore[override]
        total = self.segtree.total(state.tree)
        u = (jax.random.uniform(key, (batch_size,)) + jnp.arange(batch_size)) / batch_size
        return self.segtree.get_prefix_sum_idx(state.tree, u * total)

    def get_weight(self, state: PrioState, flat_idx: jnp.ndarray) -> jnp.ndarray:
        """Importance-sampling weight (reference prio.py:69-80)."""
        leaf = state.tree[flat_idx + self.segtree.bound]
        weight = (leaf / jnp.maximum(state.min_prio, 1e-12)) ** (-self.beta)
        if self.weight_norm:
            weight = weight / jnp.maximum(weight.max(), 1e-12)
        return weight

    def sample(self, state: PrioState, key: jax.Array, batch_size: int, drop_keys: tuple[str, ...] = ()) -> tuple[Batch, jnp.ndarray]:  # type: ignore[override]
        idx = self.sample_indices(state, key, batch_size)
        batch = self.get(state.base, idx, drop_keys=drop_keys)
        batch.weight = self.get_weight(state, idx)
        return batch, idx

    def get(self, state, flat_idx, stack_num=None, keys=None, drop_keys=()):  # type: ignore[override]
        base = state.base if isinstance(state, PrioState) else state
        return ReplayBuffer.get(self, base, flat_idx, stack_num, keys=keys, drop_keys=drop_keys)

    # ------------------------------------------------------------------
    def update_weight(self, state: PrioState, flat_idx: jnp.ndarray, td_error: jnp.ndarray) -> PrioState:
        """Write back new priorities after a gradient step (prio.py:81)."""
        prio = jnp.abs(td_error) + self.eps
        tree = self.segtree.update(state.tree, flat_idx, prio**self.alpha)
        return PrioState(
            base=state.base,
            tree=tree,
            max_prio=jnp.maximum(state.max_prio, prio.max()),
            min_prio=jnp.minimum(state.min_prio, prio.min()),
        )

    def set_beta(self, beta: float) -> None:
        self.beta = beta


def PrioritizedVectorReplayBuffer(
    total_size: int, buffer_num: int, alpha: float = 0.6, beta: float = 0.4, **kwargs
) -> PrioritizedReplayBuffer:
    """Signature parity with reference vecbuf.py:40."""
    return PrioritizedReplayBuffer(total_size, alpha=alpha, beta=beta, num_envs=buffer_num, **kwargs)
