"""REDQ (randomized ensembled double Q-learning, arXiv:2101.05982).

Rebuild of reference ``modelfree/redq.py`` (``REDQPolicy:37``, ``REDQ:134``):
ensemble of N critics (one batched einsum via EnsembleCritic), random subset
of M for the min-target, SAC-style stochastic actor with auto alpha. High
update-to-data ratios come from the trainer's ``update_per_step``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from tianshou_tpu.algorithm.base import ActOut, TrainState, tree_copy
from tianshou_tpu.algorithm.modelfree.ddpg import ContinuousOffPolicyBase
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.models.distributions import TanhNormal

__all__ = ["REDQ"]


class REDQ(ContinuousOffPolicyBase):
    """``critic`` must be an EnsembleCritic with ``ensemble_size`` members."""

    def __init__(
        self,
        *args,
        ensemble_size: int = 10,
        subset_size: int = 2,
        alpha: float | str = "auto",
        alpha_optim: optax.GradientTransformation | None = None,
        target_entropy: float | None = None,
        actor_delay: int = 20,
        deterministic_eval: bool = True,
        target_mode: str = "min",
        **kwargs: Any,
    ) -> None:
        kwargs.setdefault("exploration_noise", None)
        kwargs.setdefault("action_bound_method", None)
        super().__init__(*args, **kwargs)
        assert target_mode in ("min", "mean")
        self.ensemble_size = ensemble_size
        self.subset_size = subset_size
        self.auto_alpha = alpha == "auto"
        self.fixed_alpha = 0.2 if self.auto_alpha else float(alpha)
        self.alpha_optim = alpha_optim if alpha_optim is not None else optax.adam(3e-4)
        self.target_entropy = target_entropy if target_entropy is not None else -float(self.action_dim)
        self.actor_delay = actor_delay
        self.deterministic_eval = deterministic_eval
        self.target_mode = target_mode

    def init(self, key: jax.Array, obs_example: jnp.ndarray) -> TrainState:
        from tianshou_tpu.algorithm.base import batch_obs_example
        obs = batch_obs_example(obs_example)
        act = jnp.zeros((1,) + self.action_space.shape)
        k1, k2 = jax.random.split(key)
        params = {
            "actor": self.actor.init(k1, obs),
            "critic": self.critic.init(k2, obs, act),
        }
        opt_state = {
            "actor": self.policy_optim.init(params["actor"]),
            "critic": self.critic_optim.init(params["critic"]),
        }
        if self.auto_alpha:
            params["log_alpha"] = jnp.zeros(())
            opt_state["log_alpha"] = self.alpha_optim.init(params["log_alpha"])
        return TrainState(
            params=params,
            target_params=tree_copy({"critic": params["critic"]}),
            opt_state=opt_state,
            hparams=Batch(),
            extra=Batch(),
            step=jnp.int32(0),
        )

    def _alpha(self, params) -> jnp.ndarray:
        return jnp.exp(params["log_alpha"]) if self.auto_alpha else jnp.float32(self.fixed_alpha)

    def _dist(self, params, obs: jnp.ndarray) -> TanhNormal:
        mu, sigma = self.actor.apply(params["actor"], obs)
        return TanhNormal(loc=mu, scale=sigma)

    def forward(self, ts: TrainState, obs: jnp.ndarray, key: jax.Array, state=None, deterministic: bool = False) -> ActOut:
        dist = self._dist(ts.params, obs)
        act = dist.mode() if (deterministic and self.deterministic_eval) else dist.sample(key)
        return ActOut(act=act, state=state, info=Batch())

    def _target_q(self, ts: TrainState, obs_next: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        k1, k2 = jax.random.split(key)
        dist = self._dist(ts.params, obs_next)
        a_next, logp = dist.sample_and_log_prob(k1)
        q_all = self.critic.apply(ts.target_params["critic"], obs_next, a_next)  # [N, B]
        subset = jax.random.permutation(k2, self.ensemble_size)[: self.subset_size]
        q_sub = q_all[subset]  # [M, B]
        q = q_sub.min(0) if self.target_mode == "min" else q_sub.mean(0)
        return q - self._alpha(ts.params) * logp

    def update_step(self, ts: TrainState, batch: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        weight = batch.get("weight", jnp.ones_like(batch.returns))
        k_actor = key

        def critic_loss(cp):
            q = self.critic.apply(cp, batch.obs, batch.act)  # [N, B]
            td = batch.returns[None, :] - q
            return (weight[None, :] * td**2).mean(), td.mean(0)

        (c_loss, td), c_grads = jax.value_and_grad(critic_loss, has_aux=True)(ts.params["critic"])
        new_critic, new_copt = self._apply_grads(self.critic_optim, ts.params["critic"], c_grads, ts.opt_state["critic"])

        alpha = self._alpha(ts.params)

        def actor_loss(ap):
            mu, sigma = self.actor.apply(ap, batch.obs)
            a, logp = TanhNormal(mu, sigma).sample_and_log_prob(k_actor)
            q = self.critic.apply(new_critic, batch.obs, a).mean(0)
            return (alpha * logp - q).mean(), logp

        (a_loss, logp), a_grads = jax.value_and_grad(actor_loss, has_aux=True)(ts.params["actor"])
        cand_actor, cand_aopt = self._apply_grads(self.policy_optim, ts.params["actor"], a_grads, ts.opt_state["actor"])
        do_actor = (ts.step % self.actor_delay) == 0
        new_actor = jax.tree.map(lambda n, o: jnp.where(do_actor, n, o), cand_actor, ts.params["actor"])
        new_aopt = jax.tree.map(lambda n, o: jnp.where(do_actor, n, o), cand_aopt, ts.opt_state["actor"])

        new_params = dict(ts.params)
        new_opt = dict(ts.opt_state)
        new_params.update(actor=new_actor, critic=new_critic)
        new_opt.update(actor=new_aopt, critic=new_copt)

        if self.auto_alpha:
            def alpha_loss(la):
                return -(la * (jax.lax.stop_gradient(logp) + self.target_entropy)).mean()

            _, al_grad = jax.value_and_grad(alpha_loss)(ts.params["log_alpha"])
            cand_la, cand_laopt = self._apply_grads(self.alpha_optim, ts.params["log_alpha"], al_grad, ts.opt_state["log_alpha"])
            new_params["log_alpha"] = jnp.where(do_actor, cand_la, ts.params["log_alpha"])
            new_opt["log_alpha"] = jax.tree.map(lambda n, o: jnp.where(do_actor, n, o), cand_laopt, ts.opt_state["log_alpha"])

        ts = ts.replace(params=new_params, opt_state=new_opt, step=ts.step + 1)
        ts = self._polyak(ts)
        return ts, Batch(loss=c_loss, actor_loss=a_loss, critic_loss=c_loss, td_error=td)
