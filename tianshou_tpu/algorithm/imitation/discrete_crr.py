"""Discrete CRR (critic-regularized regression, arXiv:2006.15134).

Rebuild of reference ``imitation/discrete_crr.py:33``: advantage-weighted
cross-entropy policy loss (exp or binary mode) + TD critic loss with a
lagged target network.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tianshou_tpu.algorithm.base import ActOut, OfflineAlgorithm, TrainState, tree_copy
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.env.core import Discrete, Space
from tianshou_tpu.models.distributions import Categorical

__all__ = ["DiscreteCRR"]


class DiscreteCRR(OfflineAlgorithm):
    def __init__(
        self,
        actor: nn.Module,      # obs -> logits [B, A]
        critic: nn.Module,     # obs -> Q [B, A]
        action_space: Space,
        optim: optax.GradientTransformation | None = None,
        gamma: float = 0.99,
        policy_improvement_mode: str = "exp",  # "exp" | "binary" | "all"
        ratio_upper_bound: float = 20.0,
        beta: float = 1.0,
        min_q_weight: float = 10.0,
        target_update_freq: int = 0,
        **kwargs,
    ) -> None:
        assert isinstance(action_space, Discrete)
        assert policy_improvement_mode in ("exp", "binary", "all")
        super().__init__(action_space=action_space, gamma=gamma, optim=optim, **kwargs)
        self.actor = actor
        self.critic = critic
        self.mode = policy_improvement_mode
        self.ratio_upper_bound = ratio_upper_bound
        self.beta = beta
        self.min_q_weight = min_q_weight
        self.target_update_freq = target_update_freq
        self.use_target = target_update_freq > 0

    def init(self, key: jax.Array, obs_example: jnp.ndarray) -> TrainState:
        from tianshou_tpu.algorithm.base import batch_obs_example
        obs = batch_obs_example(obs_example)
        k1, k2 = jax.random.split(key)
        params = {"actor": self.actor.init(k1, obs), "critic": self.critic.init(k2, obs)}
        return TrainState(
            params=params,
            target_params=tree_copy(params) if self.use_target else {},
            opt_state={"all": self.optim.init(params)},
            hparams=Batch(),
            extra=Batch(),
            step=jnp.int32(0),
        )

    def forward(self, ts: TrainState, obs: jnp.ndarray, key: jax.Array, state=None, deterministic: bool = False) -> ActOut:
        dist = Categorical(logits=self.actor.apply(ts.params["actor"], obs))
        act = dist.mode() if deterministic else dist.sample(key)
        return ActOut(act=act.astype(jnp.int32), state=state, info=Batch())

    def update_step(self, ts: TrainState, batch: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        act = batch.act.astype(jnp.int32)
        tp = ts.target_params if self.use_target else ts.params

        # one-step TD target from the lagged actor/critic (crr.py:140)
        q_t = self.critic.apply(tp["critic"], batch.obs_next)
        probs_t = Categorical(logits=self.actor.apply(tp["actor"], batch.obs_next)).probs
        v_next = (q_t * probs_t).sum(-1)
        mask = 1.0 - batch.terminated.astype(jnp.float32)
        target = batch.rew + self.gamma * mask * v_next

        def loss_fn(params):
            q = self.critic.apply(params["critic"], batch.obs)
            q_a = jnp.take_along_axis(q, act[:, None], axis=1)[:, 0]
            critic_loss = ((q_a - jax.lax.stop_gradient(target)) ** 2).mean()
            logits = self.actor.apply(params["actor"], batch.obs)
            dist = Categorical(logits=logits)
            logp = dist.log_prob(act)
            v = jax.lax.stop_gradient((q * dist.probs).sum(-1))
            adv = jax.lax.stop_gradient(q_a) - v
            if self.mode == "exp":
                w = jnp.clip(jnp.exp(adv / self.beta), 0.0, self.ratio_upper_bound)
            elif self.mode == "binary":
                w = (adv > 0).astype(jnp.float32)
            else:
                w = jnp.ones_like(adv)
            actor_loss = -(w * logp).mean()
            # min_q regularization (crr.py:168)
            cql = (jax.scipy.special.logsumexp(q, axis=-1) - q_a).mean()
            return actor_loss + critic_loss + self.min_q_weight * cql, (actor_loss, critic_loss)

        (loss, (a_loss, c_loss)), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        new_params, new_opt = self._apply_grads(self.optim, ts.params, grads, ts.opt_state["all"])
        ts = ts.replace(params=new_params, opt_state={"all": new_opt}, step=ts.step + 1)
        if self.use_target:
            sync = (ts.step % self.target_update_freq) == 0
            ts = ts.replace(
                target_params=jax.tree.map(lambda t, o: jnp.where(sync, o, t), ts.target_params, ts.params)
            )
        return ts, Batch(loss=loss, actor_loss=a_loss, critic_loss=c_loss)
