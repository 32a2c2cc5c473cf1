"""Hindsight experience replay (arXiv:1707.01495) on device.

Rebuild of reference ``HERReplayBuffer`` (data/buffer/her.py:11). The
reference temporarily rewrites whole episodes in the buffer and restores
them after sampling (``rewrite_transitions:100`` + ``_restore_cache:48``);
here relabeling is a pure function of the SAMPLED batch ('future' strategy):
walk each sampled index's ``next``-chain (bounded by ``horizon``), pick a
uniform future achieved goal, splice it in as the desired goal and recompute
the reward — no buffer mutation, so it composes with jit and vector buffers
for free (SURVEY.md §7 hard part 4).

Observations must be goal-structured Batches with keys
``observation / achieved_goal / desired_goal`` (reference MyGoalEnv,
test/base/env.py:209).
"""

from __future__ import annotations

from collections.abc import Callable

import jax
import jax.numpy as jnp

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import BufferState, ReplayBuffer

__all__ = ["HERReplayBuffer", "HERVectorReplayBuffer"]


class HERReplayBuffer(ReplayBuffer):
    relabels_on_sample = True

    def __init__(
        self,
        size: int,
        compute_reward_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
        horizon: int,
        future_k: float = 8.0,
        num_envs: int = 1,
        **kwargs,
    ) -> None:
        super().__init__(size, num_envs=num_envs, **kwargs)
        self.compute_reward_fn = compute_reward_fn
        self.horizon = horizon
        self.future_p = 1.0 - 1.0 / future_k

    def sample(self, state: BufferState, key: jax.Array, batch_size: int) -> tuple[Batch, jnp.ndarray]:
        k_idx, k_her = jax.random.split(key)
        idx = self.sample_indices(state, k_idx, batch_size)
        batch = self.get(state, idx)
        batch = self.rewrite(state, batch, idx, k_her)
        return batch, idx

    def rewrite(self, state: BufferState, batch: Batch, idx: jnp.ndarray, key: jax.Array) -> Batch:
        """Future-strategy relabel of the sampled transitions."""
        B = idx.shape[0]
        k_off, k_mask = jax.random.split(key)

        # follow the next-chain for `horizon` steps: chain [H, B]
        def step(cur, _):
            nxt = self.next(state, cur)
            return nxt, nxt

        _, chain_tail = jax.lax.scan(step, idx, None, length=self.horizon - 1)
        chain = jnp.concatenate([idx[None], chain_tail], axis=0)  # [H, B]

        # valid future positions: while the chain still advances (+ self)
        moved = chain[1:] != chain[:-1]
        valid = jnp.concatenate([jnp.ones((1, B), bool), jnp.cumprod(moved, axis=0).astype(bool)])
        n_future = valid.sum(0)  # [B] >= 1

        # uniform future offset in [0, n_future)
        u = jax.random.uniform(k_off, (B,))
        offset = jnp.floor(u * n_future).astype(jnp.int32)
        future_idx = chain[jnp.minimum(offset, self.horizon - 1), jnp.arange(B)]

        env_f, slot_f = self._split(future_idx)
        future_obs_next = jax.tree.map(lambda a: a[env_f, slot_f], state.data.obs_next) \
            if "obs_next" in state.data else None
        if future_obs_next is None:
            nxt = self.next(state, future_idx)
            env_n, slot_n = self._split(nxt)
            future_obs_next = jax.tree.map(lambda a: a[env_n, slot_n], state.data.obs)
        new_goal = future_obs_next.achieved_goal

        relabel = jax.random.uniform(k_mask, (B,)) < self.future_p

        def splice(goal_new, goal_old):
            m = relabel.reshape((B,) + (1,) * (goal_old.ndim - 1))
            return jnp.where(m, goal_new, goal_old)

        batch = batch.copy()
        batch.obs = batch.obs.copy()
        batch.obs_next = batch.obs_next.copy()
        batch.obs.desired_goal = splice(new_goal, batch.obs.desired_goal)
        batch.obs_next.desired_goal = splice(new_goal, batch.obs_next.desired_goal)
        new_rew = self.compute_reward_fn(batch.obs_next.achieved_goal, batch.obs_next.desired_goal)
        batch.rew = jnp.where(relabel, new_rew, batch.rew)
        return batch


def HERVectorReplayBuffer(total_size: int, buffer_num: int, **kwargs) -> HERReplayBuffer:
    """Signature parity with reference vecbuf.py:69."""
    return HERReplayBuffer(total_size, num_envs=buffer_num, **kwargs)
