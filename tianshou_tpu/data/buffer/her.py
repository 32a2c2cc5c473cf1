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

    def sample(
        self,
        state: BufferState,
        key: jax.Array,
        batch_size: int,
        drop_keys: tuple[str, ...] = (),
    ) -> tuple[Batch, jnp.ndarray]:
        # drop_keys accepted for base-class signature parity; relabeling
        # reads obs_next/achieved goals, so callers pass () for HER buffers
        # (algorithm/base.py clears the drop list when relabels_on_sample)
        k_idx, k_her = jax.random.split(key)
        idx = self.sample_indices(state, k_idx, batch_size)
        batch = self.get(state, idx, drop_keys=drop_keys)
        new_goal, relabel = self.relabel_plan(state, idx, k_her)
        batch = self.apply_relabel(batch, new_goal, relabel)
        # expose the plan so OffPolicyAlgorithm.preprocess can relabel the
        # SAME episode chain for n-step targets (the reference gets this for
        # free by rewriting the buffer in place, her.py:100 +
        # algorithm_base.py:721); popped there before the update step
        batch.her_new_goal = new_goal
        batch.her_relabel = relabel
        return batch, idx

    def relabel_plan(self, state: BufferState, idx: jnp.ndarray, key: jax.Array) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Future-strategy relabel decision per sampled index: returns
        (new_goal [B, ...goal], relabel mask [B] bool). One decision per
        sampled index covers its whole forward chain, matching the
        reference's episode-granular rewrite (her.py:100)."""
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

        new_goal = self._achieved_next(state, future_idx)
        relabel = jax.random.uniform(k_mask, (B,)) < self.future_p
        return new_goal, relabel

    def _achieved_next(self, state: BufferState, idx: jnp.ndarray) -> jnp.ndarray:
        """achieved_goal of obs_next at ``idx`` (falls back to next-index
        obs when obs_next is not stored)."""
        if "obs_next" in state.data:
            env, slot = self._split(idx)
            return state.data.obs_next.achieved_goal[env, slot]
        nxt = self.next(state, idx)
        env, slot = self._split(nxt)
        return state.data.obs.achieved_goal[env, slot]

    @staticmethod
    def _splice(goal_new: jnp.ndarray, goal_old: jnp.ndarray, relabel: jnp.ndarray) -> jnp.ndarray:
        m = relabel.reshape(relabel.shape + (1,) * (goal_old.ndim - relabel.ndim))
        return jnp.where(m, goal_new, goal_old)

    def apply_relabel(self, batch: Batch, new_goal: jnp.ndarray, relabel: jnp.ndarray) -> Batch:
        """Splice the relabel plan into a gathered transition batch."""
        batch = batch.copy()
        batch.obs = batch.obs.copy()
        batch.obs_next = batch.obs_next.copy()
        batch.obs.desired_goal = self._splice(new_goal, batch.obs.desired_goal, relabel)
        batch.obs_next.desired_goal = self._splice(new_goal, batch.obs_next.desired_goal, relabel)
        new_rew = self.compute_reward_fn(batch.obs_next.achieved_goal, batch.obs_next.desired_goal)
        batch.rew = jnp.where(relabel, new_rew, batch.rew)
        return batch

    def rewrite(self, state: BufferState, batch: Batch, idx: jnp.ndarray, key: jax.Array) -> Batch:
        """Future-strategy relabel of the sampled transitions (one-shot
        convenience wrapper around relabel_plan + apply_relabel)."""
        new_goal, relabel = self.relabel_plan(state, idx, key)
        return self.apply_relabel(batch, new_goal, relabel)

    def n_step_gather_relabeled(
        self,
        state: BufferState,
        flat_idx: jnp.ndarray,
        n: int,
        new_goal: jnp.ndarray,
        relabel: jnp.ndarray,
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """``n_step_gather`` with rewards recomputed under the relabel plan.

        Every chain step shares the sampled index's new goal (the reference
        semantics: rewrite_transitions sets the episode's desired goal from
        the sampled step onward, her.py:100, so its numba n-step gather
        reads relabeled rewards). Steps past the episode end keep whatever
        reward they had — ``nstep_returns`` cuts accumulation at ``ends``.
        """
        rews, ends = [], []
        idx = flat_idx
        for i in range(n):
            env, slot = self._split(idx)
            raw_rew = state.data.rew[env, slot]
            rel_rew = self.compute_reward_fn(self._achieved_next(state, idx), new_goal)
            rews.append(jnp.where(relabel, rel_rew, raw_rew))
            ends.append(state.data.done[env, slot])
            if i < n - 1:
                idx = self.next(state, idx)
        return jnp.stack(rews), jnp.stack(ends).astype(jnp.float32), idx


def HERVectorReplayBuffer(total_size: int, buffer_num: int, **kwargs) -> HERReplayBuffer:
    """Signature parity with reference vecbuf.py:69."""
    return HERReplayBuffer(total_size, num_envs=buffer_num, **kwargs)
