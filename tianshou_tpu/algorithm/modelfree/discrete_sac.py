"""Discrete SAC (arXiv:1910.07207).

Rebuild of reference ``modelfree/discrete_sac.py`` (``DiscreteSACPolicy:31``,
``DiscreteSAC:83``): categorical actor, twin per-action Q critics, targets
and actor loss as exact expectations over the categorical distribution.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tianshou_tpu.algorithm.base import ActOut, OffPolicyAlgorithm, TrainState, polyak_update, tree_copy
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.prio import PrioritizedReplayBuffer
from tianshou_tpu.env.core import Discrete, Space
from tianshou_tpu.models.distributions import Categorical

__all__ = ["DiscreteSAC"]


class DiscreteSAC(OffPolicyAlgorithm):
    def __init__(
        self,
        actor: nn.Module,          # obs -> logits [B, A]
        critic: nn.Module,         # obs -> Q [B, A]
        action_space: Space,
        policy_optim: optax.GradientTransformation | None = None,
        critic_optim: optax.GradientTransformation | None = None,
        gamma: float = 0.99,
        tau: float = 0.005,
        n_step_return_horizon: int = 1,
        alpha: float | str = "auto",
        alpha_optim: optax.GradientTransformation | None = None,
        target_entropy: float | None = None,
        deterministic_eval: bool = True,
        **kwargs: Any,
    ) -> None:
        assert isinstance(action_space, Discrete)
        super().__init__(action_space=action_space, gamma=gamma, **kwargs)
        self.actor = actor
        self.critic = critic
        self.policy_optim = policy_optim if policy_optim is not None else optax.adam(1e-3)
        self.critic_optim = critic_optim if critic_optim is not None else optax.adam(1e-3)
        self.tau = tau
        self.n_step = n_step_return_horizon
        self.auto_alpha = alpha == "auto"
        self.fixed_alpha = 0.2 if self.auto_alpha else float(alpha)
        self.alpha_optim = alpha_optim if alpha_optim is not None else optax.adam(3e-4)
        # reference discrete_sac.py: 0.98 * entropy of uniform policy
        self.target_entropy = (
            target_entropy if target_entropy is not None else 0.98 * float(jnp.log(action_space.n))
        )
        self.deterministic_eval = deterministic_eval

    def init(self, key: jax.Array, obs_example: jnp.ndarray) -> TrainState:
        from tianshou_tpu.algorithm.base import batch_obs_example
        obs = batch_obs_example(obs_example)
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            "actor": self.actor.init(k1, obs),
            "critic": self.critic.init(k2, obs),
            "critic2": self.critic.init(k3, obs),
        }
        opt_state = {
            "actor": self.policy_optim.init(params["actor"]),
            "critic": self.critic_optim.init(params["critic"]),
            "critic2": self.critic_optim.init(params["critic2"]),
        }
        if self.auto_alpha:
            params["log_alpha"] = jnp.zeros(())
            opt_state["log_alpha"] = self.alpha_optim.init(params["log_alpha"])
        return TrainState(
            params=params,
            target_params=tree_copy({"critic": params["critic"], "critic2": params["critic2"]}),
            opt_state=opt_state,
            hparams=Batch(),
            extra=Batch(),
            step=jnp.int32(0),
        )

    def _alpha(self, params) -> jnp.ndarray:
        return jnp.exp(params["log_alpha"]) if self.auto_alpha else jnp.float32(self.fixed_alpha)

    def forward(self, ts: TrainState, obs: jnp.ndarray, key: jax.Array, state=None, deterministic: bool = False) -> ActOut:
        dist = Categorical(logits=self.actor.apply(ts.params["actor"], obs))
        act = dist.mode() if (deterministic and self.deterministic_eval) else dist.sample(key)
        return ActOut(act=act.astype(jnp.int32), state=state, info=Batch())

    def _target_q(self, ts: TrainState, obs_next: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        dist = Categorical(logits=self.actor.apply(ts.params["actor"], obs_next))
        probs = dist.probs
        q1 = self.critic.apply(ts.target_params["critic"], obs_next)
        q2 = self.critic.apply(ts.target_params["critic2"], obs_next)
        q = jnp.minimum(q1, q2)
        logp = jax.nn.log_softmax(dist.logits, axis=-1)
        return (probs * (q - self._alpha(ts.params) * logp)).sum(-1)

    def update_step(self, ts: TrainState, batch: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        weight = batch.get("weight", jnp.ones_like(batch.returns))
        act = batch.act.astype(jnp.int32)

        def critic_loss(cp, cp2):
            q1 = jnp.take_along_axis(self.critic.apply(cp, batch.obs), act[:, None], axis=1)[:, 0]
            q2 = jnp.take_along_axis(self.critic.apply(cp2, batch.obs), act[:, None], axis=1)[:, 0]
            td1, td2 = batch.returns - q1, batch.returns - q2
            return (weight * (td1**2 + td2**2)).mean() / 2.0, (td1 + td2) / 2.0

        (c_loss, td), (g1, g2) = jax.value_and_grad(critic_loss, argnums=(0, 1), has_aux=True)(
            ts.params["critic"], ts.params["critic2"]
        )
        new_c1, new_o1 = self._apply_grads(self.critic_optim, ts.params["critic"], g1, ts.opt_state["critic"])
        new_c2, new_o2 = self._apply_grads(self.critic_optim, ts.params["critic2"], g2, ts.opt_state["critic2"])

        alpha = self._alpha(ts.params)

        def actor_loss(ap):
            logits = self.actor.apply(ap, batch.obs)
            probs = jax.nn.softmax(logits, axis=-1)
            logp = jax.nn.log_softmax(logits, axis=-1)
            q = jnp.minimum(self.critic.apply(new_c1, batch.obs), self.critic.apply(new_c2, batch.obs))
            ent = -(probs * logp).sum(-1)
            loss = (probs * (alpha * logp - q)).sum(-1).mean()
            return loss, ent

        (a_loss, ent), a_grads = jax.value_and_grad(actor_loss, has_aux=True)(ts.params["actor"])
        new_actor, new_aopt = self._apply_grads(self.policy_optim, ts.params["actor"], a_grads, ts.opt_state["actor"])

        new_params = dict(ts.params)
        new_opt = dict(ts.opt_state)
        new_params.update(actor=new_actor, critic=new_c1, critic2=new_c2)
        new_opt.update(actor=new_aopt, critic=new_o1, critic2=new_o2)

        if self.auto_alpha:
            def alpha_loss(la):
                return -(la * (self.target_entropy - jax.lax.stop_gradient(ent))).mean()

            _, al_grad = jax.value_and_grad(alpha_loss)(ts.params["log_alpha"])
            new_la, new_laopt = self._apply_grads(self.alpha_optim, ts.params["log_alpha"], al_grad, ts.opt_state["log_alpha"])
            new_params["log_alpha"] = new_la
            new_opt["log_alpha"] = new_laopt

        ts = ts.replace(params=new_params, opt_state=new_opt, step=ts.step + 1)
        ts = ts.replace(
            target_params=polyak_update(
                ts.target_params, {"critic": new_c1, "critic2": new_c2}, self.tau
            )
        )
        return ts, Batch(loss=c_loss, actor_loss=a_loss, critic_loss=c_loss, entropy=ent.mean(), td_error=td)

    def postprocess(self, ts, buffer, buf_state, batch, indices, stats):
        if isinstance(buffer, PrioritizedReplayBuffer):
            return buffer.update_weight(buf_state, indices, stats.td_error)
        return buf_state
