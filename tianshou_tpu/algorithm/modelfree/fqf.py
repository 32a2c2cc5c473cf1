"""FQF (fully parameterized quantile function, arXiv:1911.02140).

Rebuild of reference ``modelfree/fqf.py`` (``FQFPolicy:27``, ``FQF:109``):
fraction proposal net over the shared feature trunk, quantile Huber loss at
the proposed tau-hats, fraction loss from the tau-gradient formula, entropy
regularization, separate fraction optimizer (RMSprop in the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from tianshou_tpu.algorithm.base import ActOut, TrainState, tree_copy
from tianshou_tpu.algorithm.modelfree.dqn import QLearningOffPolicyAlgorithm
from tianshou_tpu.algorithm.modelfree.qrdqn import quantile_huber_loss
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.prio import PrioritizedReplayBuffer
from tianshou_tpu.models.discrete import FractionProposalNetwork

__all__ = ["FQF"]


class FQF(QLearningOffPolicyAlgorithm):
    """``model`` is an ImplicitQuantileNetwork (features/quantiles methods)."""

    def __init__(
        self,
        *args,
        num_fractions: int = 32,
        ent_coef: float = 10.0,
        fraction_optim: optax.GradientTransformation | None = None,
        **kwargs,
    ) -> None:
        super().__init__(*args, **kwargs)
        self.num_fractions = num_fractions
        self.ent_coef = ent_coef
        self.fraction_net = FractionProposalNetwork(num_fractions)
        self.fraction_optim = fraction_optim if fraction_optim is not None else optax.rmsprop(2.5e-9)

    # ------------------------------------------------------------------
    def init(self, key: jax.Array, obs_example: jnp.ndarray) -> TrainState:
        from tianshou_tpu.algorithm.base import batch_obs_example
        obs = batch_obs_example(obs_example)
        k1, k2 = jax.random.split(key)
        taus = jnp.linspace(0.0, 1.0, self.num_fractions)[None]
        m_params = self.model.init(k1, obs, taus)
        feat = self.model.apply(m_params, obs, method="features")
        f_params = self.fraction_net.init(k2, feat)
        params = {"model": m_params, "fraction": f_params}
        return TrainState(
            params=params,
            target_params={"model": tree_copy(m_params)} if self.use_target else {},
            opt_state={
                "model": self.optim.init(m_params),
                "fraction": self.fraction_optim.init(f_params),
            },
            hparams=Batch(eps_training=jnp.float32(self.eps_training), eps_inference=jnp.float32(self.eps_inference)),
            extra=Batch(),
            step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def _fractions(self, params, obs: jnp.ndarray):
        feat = self.model.apply(params["model"], obs, method="features")
        return self.fraction_net.apply(params["fraction"], feat), feat

    def _weighted_q(self, params, obs: jnp.ndarray):
        (taus, tau_hats, ent), feat = self._fractions(params, obs)
        z = self.model.apply(params["model"], feat, tau_hats, method="quantiles")  # [B,K,A]
        widths = (taus[:, 1:] - taus[:, :-1])[:, :, None]
        q = (widths * z).sum(1)  # [B, A]
        return q, z, taus, tau_hats, ent, feat

    def forward(self, ts: TrainState, obs: jnp.ndarray, key: jax.Array, state=None, deterministic: bool = False) -> ActOut:
        q, *_ = self._weighted_q(ts.params, obs)
        return ActOut(act=jnp.argmax(q, axis=-1).astype(jnp.int32), state=state, info=Batch(q=q))

    def _target_q(self, ts: TrainState, obs_next: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        # fractions always come from the online fraction net (reference fqf.py:162)
        (taus, tau_hats, _), _ = self._fractions(ts.params, obs_next)
        tm = ts.target_params["model"] if self.use_target else ts.params["model"]
        feat_t = self.model.apply(tm, obs_next, method="features")
        z_t = self.model.apply(tm, feat_t, tau_hats, method="quantiles")  # [B,K,A]
        widths = (taus[:, 1:] - taus[:, :-1])[:, :, None]
        a_star = jnp.argmax((widths * z_t).sum(1), axis=-1)
        return jnp.take_along_axis(z_t, a_star[:, None, None], axis=2)[..., 0]  # [B, K]

    # ------------------------------------------------------------------
    def update_step(self, ts: TrainState, batch: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        B = batch.returns.shape[0]
        weight = batch.get("weight", jnp.ones(B))
        act = batch.act.astype(jnp.int32)

        def loss_fn(m_params, f_params):
            params = {"model": m_params, "fraction": f_params}
            feat = self.model.apply(m_params, batch.obs, method="features")
            taus, tau_hats, ent = self.fraction_net.apply(f_params, feat)
            z = self.model.apply(m_params, feat, tau_hats, method="quantiles")
            curr = jnp.take_along_axis(z, act[:, None, None], axis=2)[..., 0]  # [B,K]
            q_loss_per = quantile_huber_loss(curr, batch.returns, tau_hats)
            q_loss = (weight * q_loss_per).mean()
            # fraction loss: d(W1)/d(tau_k) ~ 2 z(tau_k) - z(tau_hat_{k-1}) - z(tau_hat_k)
            z_tau = self.model.apply(m_params, feat, taus[:, 1:-1], method="quantiles")
            z_tau_a = jnp.take_along_axis(z_tau, act[:, None, None], axis=2)[..., 0]
            sg = jax.lax.stop_gradient
            grad_tau = 2.0 * sg(z_tau_a) - sg(curr[:, :-1]) - sg(curr[:, 1:])
            frac_loss = (grad_tau * taus[:, 1:-1]).sum(-1).mean()
            frac_loss = frac_loss - self.ent_coef * ent.mean()
            td = jnp.abs(batch.returns.mean(-1) - curr.mean(-1))
            return q_loss + frac_loss, (q_loss, frac_loss, td)

        (loss, (q_loss, frac_loss, td)), (gm, gf) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(ts.params["model"], ts.params["fraction"])
        new_m, new_mo = self._apply_grads(self.optim, ts.params["model"], gm, ts.opt_state["model"])
        new_f, new_fo = self._apply_grads(self.fraction_optim, ts.params["fraction"], gf, ts.opt_state["fraction"])
        ts = ts.replace(
            params={"model": new_m, "fraction": new_f},
            opt_state={"model": new_mo, "fraction": new_fo},
            step=ts.step + 1,
        )
        ts = self._sync_target(ts)
        return ts, Batch(loss=loss, q_loss=q_loss, fraction_loss=frac_loss, td_error=td)

    def postprocess(self, ts, buffer, buf_state, batch, indices, stats):
        if isinstance(buffer, PrioritizedReplayBuffer):
            return buffer.update_weight(buf_state, indices, stats.td_error)
        return buf_state
