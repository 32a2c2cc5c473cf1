"""Discrete CQL (arXiv:2006.04779) on top of QRDQN.

Rebuild of reference ``imitation/discrete_cql.py:23``: quantile-regression TD
loss plus the conservative penalty ``min_q_weight * (logsumexp Q - Q(a))``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.base import TrainState
from tianshou_tpu.algorithm.modelfree.qrdqn import QRDQN, quantile_huber_loss
from tianshou_tpu.data.batch import Batch

__all__ = ["DiscreteCQL"]


class DiscreteCQL(QRDQN):
    run_mode = "offline"

    def __init__(self, *args, min_q_weight: float = 10.0, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.min_q_weight = min_q_weight

    def update_step(self, ts: TrainState, batch: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        B = batch.returns.shape[0]
        weight = batch.get("weight", jnp.ones(B))
        taus = jnp.broadcast_to(self.taus, (B, self.num_quantiles))
        act = batch.act.astype(jnp.int32)

        def loss_fn(params):
            z = self._quantiles(params, batch.obs)  # [B, A, K]
            curr = jnp.take_along_axis(z, act[:, None, None], axis=1)[:, 0]
            qr = (weight * quantile_huber_loss(curr, batch.returns, taus)).mean()
            q = z.mean(-1)  # [B, A]
            q_a = jnp.take_along_axis(q, act[:, None], axis=1)[:, 0]
            cql = (jax.scipy.special.logsumexp(q, axis=-1) - q_a).mean()
            td = jnp.abs(batch.returns.mean(-1) - curr.mean(-1))
            return qr + self.min_q_weight * cql, (qr, cql, td)

        (loss, (qr, cql, td)), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params["model"])
        new_params, new_opt = self._apply_grads(self.optim, ts.params["model"], grads, ts.opt_state["model"])
        ts = ts.replace(params={"model": new_params}, opt_state={"model": new_opt}, step=ts.step + 1)
        ts = self._sync_target(ts)
        return ts, Batch(loss=loss, qr_loss=qr, cql_loss=cql, td_error=td)
