"""BDQN (branching dueling Q-network, arXiv:1711.08946).

Rebuild of reference ``modelfree/bdqn.py`` (``BDQNPolicy:29``, ``BDQN:106``):
per-branch argmax actions over a ``BranchingNet``, shared scalar target
(mean over branches of the target branch-Q at the online argmax).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.base import ActOut, TrainState
from tianshou_tpu.algorithm.modelfree.dqn import QLearningOffPolicyAlgorithm
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.prio import PrioritizedReplayBuffer

__all__ = ["BDQN"]


class BDQN(QLearningOffPolicyAlgorithm):
    """model: obs -> [B, num_branches, action_per_branch]."""

    def __init__(self, *args, is_double: bool = True, **kwargs) -> None:
        kwargs.setdefault("n_step_return_horizon", 1)
        super().__init__(*args, **kwargs)
        self.is_double = is_double

    def forward(self, ts: TrainState, obs: jnp.ndarray, key: jax.Array, state=None, deterministic: bool = False) -> ActOut:
        q = self.model.apply(ts.params["model"], obs)  # [B, K, A]
        act = jnp.argmax(q, axis=-1).astype(jnp.int32)  # [B, K]
        return ActOut(act=act, state=state, info=Batch(q=q))

    def exploration_noise(
        self, ts: TrainState, act: jnp.ndarray, obs: jnp.ndarray, key: jax.Array, training: bool = True
    ) -> jnp.ndarray:
        """Per-sample eps-greedy over the whole branch vector (bdqn.py:74)."""
        k1, k2 = jax.random.split(key)
        q_shape = act.shape  # [B, K]
        n_per_branch = self.model.action_per_branch
        rand_act = jax.random.randint(k1, q_shape, 0, n_per_branch, dtype=act.dtype)
        eps = ts.hparams.eps_training if training else ts.hparams.eps_inference
        explore = jax.random.uniform(k2, (q_shape[0],)) < eps
        return jnp.where(explore[:, None], rand_act, act)

    def _target_q(self, ts: TrainState, obs_next: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        tparams = ts.target_params["model"] if self.use_target else ts.params["model"]
        q_t = self.model.apply(tparams, obs_next)  # [B, K, A]
        if self.is_double:
            a_star = jnp.argmax(self.model.apply(ts.params["model"], obs_next), axis=-1)
        else:
            a_star = jnp.argmax(q_t, axis=-1)
        picked = jnp.take_along_axis(q_t, a_star[..., None], axis=-1)[..., 0]  # [B, K]
        return picked.mean(-1)  # shared scalar target (bdqn.py:152)

    def update_step(self, ts: TrainState, batch: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        weight = batch.get("weight", jnp.ones_like(batch.returns))

        def loss_fn(params):
            q = self.model.apply(params, batch.obs)  # [B, K, A]
            q_a = jnp.take_along_axis(q, batch.act.astype(jnp.int32)[..., None], axis=-1)[..., 0]  # [B,K]
            td = batch.returns[:, None] - q_a
            return (weight * (td**2).mean(-1)).mean(), td.mean(-1)

        (loss, td), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params["model"])
        new_params, new_opt = self._apply_grads(self.optim, ts.params["model"], grads, ts.opt_state["model"])
        ts = ts.replace(params={"model": new_params}, opt_state={"model": new_opt}, step=ts.step + 1)
        ts = self._sync_target(ts)
        return ts, Batch(loss=loss, td_error=td)

    def postprocess(self, ts, buffer, buf_state, batch, indices, stats):
        if isinstance(buffer, PrioritizedReplayBuffer):
            return buffer.update_weight(buf_state, indices, stats.td_error)
        return buf_state
