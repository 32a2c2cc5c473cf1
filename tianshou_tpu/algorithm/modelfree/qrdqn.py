"""QRDQN (quantile regression DQN, arXiv:1710.10044).

Rebuild of reference ``modelfree/qrdqn.py`` (``QRDQNPolicy:18``,
``QRDQN:26`` quantile Huber loss). Model maps obs -> [B, A, n_quantiles];
the n-step kernel shifts the target quantiles directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.base import TrainState
from tianshou_tpu.algorithm.modelfree.dqn import QLearningOffPolicyAlgorithm
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.prio import PrioritizedReplayBuffer

__all__ = ["QRDQN", "quantile_huber_loss"]


def quantile_huber_loss(curr: jnp.ndarray, target: jnp.ndarray, taus: jnp.ndarray, kappa: float = 1.0) -> jnp.ndarray:
    """curr [B, K], target [B, K'], taus [B, K] -> per-sample loss [B].

    Element-wise Huber weighted by |tau - 1{u<0}|, mean over target
    quantiles, sum over current quantiles (standard QR-DQN form,
    reference qrdqn.py:96-108).
    """
    u = target[:, None, :] - curr[:, :, None]  # [B, K, K']
    huber = jnp.where(jnp.abs(u) <= kappa, 0.5 * u**2, kappa * (jnp.abs(u) - 0.5 * kappa))
    w = jnp.abs(taus[:, :, None] - (u < 0).astype(jnp.float32))
    return (w * huber).mean(-1).sum(-1)


class QRDQN(QLearningOffPolicyAlgorithm):
    def __init__(self, *args, num_quantiles: int = 200, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.num_quantiles = num_quantiles
        self.taus = (jnp.arange(num_quantiles) + 0.5) / num_quantiles

    def _quantiles(self, params, obs: jnp.ndarray) -> jnp.ndarray:
        return self.model.apply(params, obs)  # [B, A, K]

    def _q(self, params, obs: jnp.ndarray) -> jnp.ndarray:
        return self._quantiles(params, obs).mean(-1)

    def _target_q(self, ts: TrainState, obs_next: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        tparams = ts.target_params["model"] if self.use_target else ts.params["model"]
        zt = self._quantiles(tparams, obs_next)  # [B, A, K]
        a_star = jnp.argmax(zt.mean(-1), axis=-1)
        return jnp.take_along_axis(zt, a_star[:, None, None], axis=1)[:, 0]  # [B, K]

    def update_step(self, ts: TrainState, batch: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        B = batch.returns.shape[0]
        weight = batch.get("weight", jnp.ones(B))
        taus = jnp.broadcast_to(self.taus, (B, self.num_quantiles))

        def loss_fn(params):
            z = self._quantiles(params, batch.obs)
            curr = jnp.take_along_axis(z, batch.act.astype(jnp.int32)[:, None, None], axis=1)[:, 0]
            per = quantile_huber_loss(curr, batch.returns, taus)
            td = jnp.abs(batch.returns.mean(-1) - curr.mean(-1))
            return (weight * per).mean(), td

        (loss, td), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params["model"])
        new_params, new_opt = self._apply_grads(self.optim, ts.params["model"], grads, ts.opt_state["model"])
        ts = ts.replace(params={"model": new_params}, opt_state={"model": new_opt}, step=ts.step + 1)
        ts = self._sync_target(ts)
        return ts, Batch(loss=loss, td_error=td)

    def postprocess(self, ts, buffer, buf_state, batch, indices, stats):
        if isinstance(buffer, PrioritizedReplayBuffer):
            return buffer.update_weight(buf_state, indices, stats.td_error)
        return buf_state
