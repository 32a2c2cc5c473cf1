"""CQL (conservative Q-learning, arXiv:2006.04779), continuous.

Rebuild of reference ``imitation/cql.py:32``: SAC-style actor/critics plus
the CQL(H) conservative penalty — logsumexp over random/current/next-policy
actions with importance corrections, optional Lagrange multiplier tuning.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from tianshou_tpu.algorithm.base import TrainState
from tianshou_tpu.algorithm.modelfree.sac import SAC
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.models.distributions import TanhNormal

__all__ = ["CQL"]


class CQL(SAC):
    run_mode = "offline"

    def __init__(
        self,
        *args,
        cql_alpha_lr: float = 1e-4,
        cql_weight: float = 1.0,
        with_lagrange: bool = True,
        lagrange_threshold: float = 10.0,
        temperature: float = 1.0,
        num_repeat_actions: int = 10,
        **kwargs: Any,
    ) -> None:
        super().__init__(*args, **kwargs)
        self.cql_weight = cql_weight
        self.with_lagrange = with_lagrange
        self.lagrange_threshold = lagrange_threshold
        self.temperature = temperature
        self.num_repeat_actions = num_repeat_actions
        self.cql_alpha_optim = optax.adam(cql_alpha_lr)

    def init(self, key: jax.Array, obs_example: jnp.ndarray) -> TrainState:
        ts = super().init(key, obs_example)
        if self.with_lagrange:
            params = dict(ts.params)
            opt = dict(ts.opt_state)
            params["log_cql_alpha"] = jnp.zeros(())
            opt["log_cql_alpha"] = self.cql_alpha_optim.init(params["log_cql_alpha"])
            ts = ts.replace(params=params, opt_state=opt)
        return ts

    # offline: 1-step target from batch directly (no buffer chain needed)
    def preprocess(self, ts, buffer, buf_state, batch, indices, key):
        tq = self._target_q(ts, batch.obs_next, key)
        mask = 1.0 - batch.terminated.astype(jnp.float32)
        batch.returns = batch.rew + self.gamma * mask * tq
        return batch

    def update_step(self, ts: TrainState, batch: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        B = batch.obs.shape[0]
        R = self.num_repeat_actions
        act_dim = self.action_dim
        k_actor, k_rand, k_cur, k_next = jax.random.split(key, 4)

        alpha = self._alpha(ts.params)

        # --- actor update (SAC-style) against current critics
        def actor_loss_fn(ap):
            mu, sigma = self.actor.apply(ap, batch.obs)
            a, logp = TanhNormal(mu, sigma).sample_and_log_prob(k_actor)
            q1 = self.critic.apply(ts.params["critic"], batch.obs, a)
            q2 = self.critic.apply(ts.params["critic2"], batch.obs, a)
            return (alpha * logp - jnp.minimum(q1, q2)).mean(), logp

        (a_loss, logp), ag = jax.value_and_grad(actor_loss_fn, has_aux=True)(ts.params["actor"])
        new_actor, new_ao = self._apply_grads(self.policy_optim, ts.params["actor"], ag, ts.opt_state["actor"])

        # --- candidate actions for the conservative penalty
        def sampled_logp(params_actor, obs, k):
            mu, sigma = self.actor.apply(params_actor, obs)
            mu_r = jnp.repeat(mu, R, axis=0)
            sg_r = jnp.repeat(sigma, R, axis=0)
            a, lp = TanhNormal(mu_r, sg_r).sample_and_log_prob(k)
            return a, lp  # [B*R, A], [B*R]

        rand_act = jax.random.uniform(k_rand, (B * R, act_dim), minval=-1.0, maxval=1.0)
        cur_act, cur_logp = sampled_logp(new_actor, batch.obs, k_cur)
        next_act, next_logp = sampled_logp(new_actor, batch.obs_next, k_next)
        obs_rep = jnp.repeat(batch.obs, R, axis=0)
        log_rand_density = act_dim * jnp.log(0.5)

        cql_alpha = (
            jnp.clip(jnp.exp(ts.params["log_cql_alpha"]), 0.0, 1e6)
            if self.with_lagrange
            else jnp.float32(1.0)
        )

        def critic_loss(cp, cp2):
            q1d = self.critic.apply(cp, batch.obs, batch.act)
            q2d = self.critic.apply(cp2, batch.obs, batch.act)
            td1 = ((q1d - batch.returns) ** 2).mean()
            td2 = ((q2d - batch.returns) ** 2).mean()

            def cat_q(cp_):
                qr = self.critic.apply(cp_, obs_rep, rand_act).reshape(B, R) - log_rand_density
                qc = self.critic.apply(cp_, obs_rep, cur_act).reshape(B, R) - jax.lax.stop_gradient(cur_logp).reshape(B, R)
                qn = self.critic.apply(cp_, obs_rep, next_act).reshape(B, R) - jax.lax.stop_gradient(next_logp).reshape(B, R)
                return jnp.concatenate([qr, qc, qn], axis=1)  # [B, 3R]

            lse1 = jax.scipy.special.logsumexp(cat_q(cp) / self.temperature, axis=1)
            lse2 = jax.scipy.special.logsumexp(cat_q(cp2) / self.temperature, axis=1)
            cql1 = (lse1.mean() * self.temperature - q1d.mean()) * self.cql_weight
            cql2 = (lse2.mean() * self.temperature - q2d.mean()) * self.cql_weight
            loss = td1 + td2 + jax.lax.stop_gradient(cql_alpha) * (cql1 + cql2)
            return loss, (td1 + td2, cql1 + cql2, (q1d + q2d) / 2 - batch.returns)

        (c_loss, (td, cql_pen, td_err)), (g1, g2) = jax.value_and_grad(
            critic_loss, argnums=(0, 1), has_aux=True
        )(ts.params["critic"], ts.params["critic2"])
        new_c1, new_o1 = self._apply_grads(self.critic_optim, ts.params["critic"], g1, ts.opt_state["critic"])
        new_c2, new_o2 = self._apply_grads(self.critic_optim, ts.params["critic2"], g2, ts.opt_state["critic2"])

        new_params = dict(ts.params)
        new_opt = dict(ts.opt_state)
        new_params.update(actor=new_actor, critic=new_c1, critic2=new_c2)
        new_opt.update(actor=new_ao, critic=new_o1, critic2=new_o2)

        # --- lagrange multiplier for the penalty budget (cql.py:330)
        if self.with_lagrange:
            def cql_alpha_loss(la):
                return -(jnp.exp(la) * (jax.lax.stop_gradient(cql_pen) - 2 * self.lagrange_threshold)).mean() / 2.0

            _, lg = jax.value_and_grad(cql_alpha_loss)(ts.params["log_cql_alpha"])
            new_la, new_lao = self._apply_grads(
                self.cql_alpha_optim, ts.params["log_cql_alpha"], lg, ts.opt_state["log_cql_alpha"]
            )
            new_params["log_cql_alpha"] = new_la
            new_opt["log_cql_alpha"] = new_lao

        # --- entropy alpha
        if self.auto_alpha:
            def alpha_loss(la):
                return -(la * (jax.lax.stop_gradient(logp) + self.target_entropy)).mean()

            _, alg = jax.value_and_grad(alpha_loss)(ts.params["log_alpha"])
            new_laa, new_laao = self._apply_grads(self.alpha_optim, ts.params["log_alpha"], alg, ts.opt_state["log_alpha"])
            new_params["log_alpha"] = new_laa
            new_opt["log_alpha"] = new_laao

        ts = ts.replace(params=new_params, opt_state=new_opt, step=ts.step + 1)
        ts = self._polyak(ts)
        return ts, Batch(loss=c_loss, actor_loss=a_loss, td_loss=td, cql_penalty=cql_pen, td_error=td_err)
