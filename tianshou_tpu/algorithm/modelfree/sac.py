"""SAC (soft actor-critic, arXiv:1812.05905) with auto entropy tuning.

Rebuild of reference ``modelfree/sac.py``: ``SACPolicy`` (:54, tanh-squashed
Gaussian with log-prob correction :25), ``Alpha/FixedAlpha/AutoAlpha``
(:134-209) and ``SAC`` (:212). ``log_alpha`` is a learned scalar in the
params tree with its own optimizer; target entropy defaults to -action_dim.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tianshou_tpu.algorithm.base import ActOut, TrainState, tree_copy
from tianshou_tpu.algorithm.modelfree.ddpg import ContinuousOffPolicyBase
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.prio import PrioritizedReplayBuffer
from tianshou_tpu.env.core import Space
from tianshou_tpu.models.distributions import TanhNormal

__all__ = ["SAC"]


class SAC(ContinuousOffPolicyBase):
    def __init__(
        self,
        actor: nn.Module,
        critic: nn.Module,
        action_space: Space,
        alpha: float | str = "auto",
        alpha_optim: optax.GradientTransformation | None = None,
        target_entropy: float | None = None,
        deterministic_eval: bool = True,
        **kwargs: Any,
    ) -> None:
        kwargs.setdefault("exploration_noise", None)  # stochastic policy explores itself
        kwargs.setdefault("action_bound_method", None)  # tanh already bounds
        super().__init__(actor=actor, critic=critic, action_space=action_space, **kwargs)
        self.auto_alpha = alpha == "auto"
        self.fixed_alpha = 0.2 if self.auto_alpha else float(alpha)
        self.alpha_optim = alpha_optim if alpha_optim is not None else optax.adam(3e-4)
        self.target_entropy = target_entropy if target_entropy is not None else -float(self.action_dim)
        self.deterministic_eval = deterministic_eval

    # ------------------------------------------------------------------
    def init(self, key: jax.Array, obs_example: jnp.ndarray) -> TrainState:
        from tianshou_tpu.algorithm.base import batch_obs_example
        obs = batch_obs_example(obs_example)
        act = jnp.zeros((1,) + self.action_space.shape)
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            "actor": self.actor.init(k1, obs),
            "critic": self.critic.init(k2, obs, act),
            "critic2": self.critic.init(k3, obs, act),
        }
        opt_state = {
            "actor": self.policy_optim.init(params["actor"]),
            "critic": self.critic_optim.init(params["critic"]),
            "critic2": self.critic_optim.init(params["critic2"]),
        }
        if self.auto_alpha:
            params["log_alpha"] = jnp.zeros(())
            opt_state["log_alpha"] = self.alpha_optim.init(params["log_alpha"])
        targets = tree_copy({"critic": params["critic"], "critic2": params["critic2"]})
        return TrainState(
            params=params,
            target_params=targets,
            opt_state=opt_state,
            hparams=Batch(),
            extra=Batch(),
            step=jnp.int32(0),
        )

    def _alpha(self, params) -> jnp.ndarray:
        if self.auto_alpha:
            return jnp.exp(params["log_alpha"])
        return jnp.float32(self.fixed_alpha)

    def _dist(self, params, obs: jnp.ndarray) -> TanhNormal:
        mu, sigma = self.actor.apply(params["actor"], obs)
        return TanhNormal(loc=mu, scale=sigma)

    def forward(self, ts: TrainState, obs: jnp.ndarray, key: jax.Array, state=None, deterministic: bool = False) -> ActOut:
        dist = self._dist(ts.params, obs)
        if deterministic and self.deterministic_eval:
            act = dist.mode()
        else:
            act = dist.sample(key)
        return ActOut(act=act, state=state, info=Batch())

    # ------------------------------------------------------------------
    def _target_q(self, ts: TrainState, obs_next: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        dist = self._dist(ts.params, obs_next)
        a_next, logp = dist.sample_and_log_prob(key)
        q1 = self.critic.apply(ts.target_params["critic"], obs_next, a_next)
        q2 = self.critic.apply(ts.target_params["critic2"], obs_next, a_next)
        return jnp.minimum(q1, q2) - self._alpha(ts.params) * logp

    def update_step(self, ts: TrainState, batch: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        weight = batch.get("weight", jnp.ones_like(batch.returns))
        k_actor = key

        def critic_loss(cp, cp2):
            q1 = self.critic.apply(cp, batch.obs, batch.act)
            q2 = self.critic.apply(cp2, batch.obs, batch.act)
            td1 = batch.returns - q1
            td2 = batch.returns - q2
            return (weight * (td1**2 + td2**2)).mean() / 2.0, (td1 + td2) / 2.0

        (c_loss, td), (g1, g2) = jax.value_and_grad(critic_loss, argnums=(0, 1), has_aux=True)(
            ts.params["critic"], ts.params["critic2"]
        )
        new_c1, new_o1 = self._apply_grads(self.critic_optim, ts.params["critic"], g1, ts.opt_state["critic"])
        new_c2, new_o2 = self._apply_grads(self.critic_optim, ts.params["critic2"], g2, ts.opt_state["critic2"])

        alpha = self._alpha(ts.params)

        def actor_loss(ap):
            mu, sigma = self.actor.apply(ap, batch.obs)
            a, logp = TanhNormal(mu, sigma).sample_and_log_prob(k_actor)
            q1 = self.critic.apply(new_c1, batch.obs, a)
            q2 = self.critic.apply(new_c2, batch.obs, a)
            return (alpha * logp - jnp.minimum(q1, q2)).mean(), logp

        (a_loss, logp), a_grads = jax.value_and_grad(actor_loss, has_aux=True)(ts.params["actor"])
        new_actor, new_aopt = self._apply_grads(self.policy_optim, ts.params["actor"], a_grads, ts.opt_state["actor"])

        new_params = dict(ts.params)
        new_opt = dict(ts.opt_state)
        new_params.update(actor=new_actor, critic=new_c1, critic2=new_c2)
        new_opt.update(actor=new_aopt, critic=new_o1, critic2=new_o2)
        stats_alpha = alpha

        if self.auto_alpha:
            # alpha loss: -log_alpha * (logp + target_entropy) (sac.py:188)
            def alpha_loss(la):
                return -(la * (jax.lax.stop_gradient(logp) + self.target_entropy)).mean()

            al_loss, al_grad = jax.value_and_grad(alpha_loss)(ts.params["log_alpha"])
            new_la, new_laopt = self._apply_grads(self.alpha_optim, ts.params["log_alpha"], al_grad, ts.opt_state["log_alpha"])
            new_params["log_alpha"] = new_la
            new_opt["log_alpha"] = new_laopt
            stats_alpha = jnp.exp(new_la)

        ts = ts.replace(params=new_params, opt_state=new_opt, step=ts.step + 1)
        ts = self._polyak(ts)
        return ts, Batch(
            loss=c_loss, actor_loss=a_loss, critic_loss=c_loss,
            alpha=stats_alpha, entropy=-logp.mean(), td_error=td,
        )

    def postprocess(self, ts, buffer, buf_state, batch, indices, stats):
        if isinstance(buffer, PrioritizedReplayBuffer) and "td_error" in stats:
            return buffer.update_weight(buf_state, indices, stats.td_error)
        return buf_state
