"""C51 categorical DQN (arXiv:1707.06887) + Rainbow.

Rebuild of reference ``modelfree/c51.py`` (``C51Policy:16`` support atoms,
``C51:70`` distributional projection) and ``modelfree/rainbow.py:18``
(C51 + noisy layers). The Bellman shift runs the n-step kernel over the
support atoms (reference ``_target_q`` returns the support, c51.py:121) and
the projection uses the clamp trick (c51.py:137-146).

One deliberate fix vs the reference: the next-state distribution is
evaluated at the n-step terminal index's ``obs_next`` (the same state the
shifted support corresponds to), where the reference uses the 1-step
``batch.obs_next`` even for n_step>1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.base import TrainState
from tianshou_tpu.algorithm.modelfree.dqn import QLearningOffPolicyAlgorithm
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.prio import PrioritizedReplayBuffer
from tianshou_tpu.ops.returns import nstep_returns, value_mask

__all__ = ["C51", "RainbowDQN"]


class C51(QLearningOffPolicyAlgorithm):
    """Model must map obs -> [B, A, num_atoms] probabilities (softmax last)."""

    def __init__(self, *args, num_atoms: int = 51, v_min: float = -10.0, v_max: float = 10.0, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.num_atoms = num_atoms
        self.v_min = v_min
        self.v_max = v_max
        self.support = jnp.linspace(v_min, v_max, num_atoms)
        self.delta_z = (v_max - v_min) / (num_atoms - 1)

    def _probs(self, params, obs: jnp.ndarray, key: jax.Array | None = None) -> jnp.ndarray:
        return self.model.apply(params, obs)

    def _q(self, params, obs: jnp.ndarray) -> jnp.ndarray:
        return (self._probs(params, obs) * self.support).sum(-1)

    # ------------------------------------------------------------------
    def preprocess(self, ts: TrainState, buffer, buf_state, batch: Batch, indices, key) -> Batch:
        rews, ends, obs_next_t, terminated_t = self._nstep_terminal(buffer, buf_state, batch, indices)
        B = rews.shape[1]
        mask = value_mask(terminated_t.astype(jnp.float32))
        support_b = jnp.broadcast_to(self.support, (B, self.num_atoms)) * mask[:, None]
        returns = nstep_returns(rews, ends, support_b, self.gamma)
        target_support = jnp.clip(returns, self.v_min, self.v_max)  # [B, atoms]

        # next-state distribution at greedy action (double selection)
        tparams = ts.target_params["model"] if self.use_target else ts.params["model"]
        probs_sel = self._probs(ts.params["model"], obs_next_t)
        a_star = jnp.argmax((probs_sel * self.support).sum(-1), axis=-1)
        probs_t = self._probs(tparams, obs_next_t)
        next_dist = jnp.take_along_axis(probs_t, a_star[:, None, None], axis=1)[:, 0]  # [B, atoms]

        # projection (clamp trick, c51.py:137)
        proj = jnp.clip(
            1.0 - jnp.abs(target_support[:, None, :] - self.support[None, :, None]) / self.delta_z,
            0.0,
            1.0,
        )  # [B, atoms_i, atoms_j]
        batch.target_dist = (proj * next_dist[:, None, :]).sum(-1)  # [B, atoms]
        return batch

    # ------------------------------------------------------------------
    def update_step(self, ts: TrainState, batch: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        weight = batch.get("weight", jnp.ones(batch.target_dist.shape[0]))

        def loss_fn(params):
            probs = self._probs(params, batch.obs, key)
            curr = jnp.take_along_axis(probs, batch.act.astype(jnp.int32)[:, None, None], axis=1)[:, 0]
            ce = -(batch.target_dist * jnp.log(curr + 1e-8)).sum(-1)
            return (weight * ce).mean(), ce

        (loss, ce), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params["model"])
        new_params, new_opt = self._apply_grads(self.optim, ts.params["model"], grads, ts.opt_state["model"])
        ts = ts.replace(params={"model": new_params}, opt_state={"model": new_opt}, step=ts.step + 1)
        ts = self._sync_target(ts)
        return ts, Batch(loss=loss, td_error=ce)

    def postprocess(self, ts, buffer, buf_state, batch, indices, stats):
        if isinstance(buffer, PrioritizedReplayBuffer):
            # cross-entropy as priority (reference c51.py:155 Rainbow trick)
            return buffer.update_weight(buf_state, indices, stats.td_error)
        return buf_state


class RainbowDQN(C51):
    """C51 over a noisy/dueling net (reference rainbow.py:18). The model's
    ``apply`` accepts ``noise_key``; updates resample factorized noise, while
    action selection uses the mean weights (noisy-net exploration acts
    through the divergence of the trained noisy heads)."""

    def _probs(self, params, obs: jnp.ndarray, key: jax.Array | None = None) -> jnp.ndarray:
        return self.model.apply(params, obs, noise_key=key)
