"""DDPG family base + DDPG.

Rebuild of reference ``modelfree/ddpg.py``: ``ContinuousPolicyWith
ExplorationNoise`` (:45), ``ContinuousDeterministicPolicy`` (:114),
``ActorCriticOffPolicyAlgorithm`` (:196, lagged critic + ``_target_q`` :327 +
``_minimize_critic_squared_loss`` :266) and ``DDPG`` (:342).

Separate actor/critic optimizers mirror the reference's policy_optim /
critic_optim; target nets sync by polyak every step (tau)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tianshou_tpu.algorithm.base import ActOut, OffPolicyAlgorithm, TrainState, polyak_update, tree_copy
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.prio import PrioritizedReplayBuffer
from tianshou_tpu.env.core import Space
from tianshou_tpu.exploration.noise import GaussianNoise

__all__ = ["DDPG", "ContinuousOffPolicyBase"]


class ContinuousOffPolicyBase(OffPolicyAlgorithm):
    """Shared: deterministic/stochastic actor + (twin) critics + polyak."""

    def __init__(
        self,
        actor: nn.Module,
        critic: nn.Module,
        action_space: Space,
        policy_optim: optax.GradientTransformation | None = None,
        critic_optim: optax.GradientTransformation | None = None,
        gamma: float = 0.99,
        tau: float = 0.005,
        n_step_return_horizon: int = 1,
        exploration_noise: GaussianNoise | None = GaussianNoise(sigma=0.1),
        **kwargs: Any,
    ) -> None:
        kwargs.setdefault("action_scaling", True)
        super().__init__(action_space=action_space, gamma=gamma, **kwargs)
        self.actor = actor
        self.critic = critic
        self.policy_optim = policy_optim if policy_optim is not None else optax.adam(1e-3)
        self.critic_optim = critic_optim if critic_optim is not None else optax.adam(1e-3)
        self.tau = tau
        self.n_step = n_step_return_horizon
        self.noise = exploration_noise

    def exploration_noise(
        self, ts: TrainState, act: jnp.ndarray, obs: jnp.ndarray, key: jax.Array, training: bool = True
    ) -> jnp.ndarray:
        if self.noise is None or not training:
            return act
        return act + self.noise.sample(key, act.shape)

    def _polyak(self, ts: TrainState) -> TrainState:
        return ts.replace(target_params=polyak_update(ts.target_params, {k: ts.params[k] for k in ts.target_params}, self.tau))


class DDPG(ContinuousOffPolicyBase):
    def init(self, key: jax.Array, obs_example: jnp.ndarray) -> TrainState:
        from tianshou_tpu.algorithm.base import batch_obs_example
        obs = batch_obs_example(obs_example)
        act = jnp.zeros((1,) + self.action_space.shape)
        k1, k2 = jax.random.split(key)
        params = {
            "actor": self.actor.init(k1, obs),
            "critic": self.critic.init(k2, obs, act),
        }
        return TrainState(
            params=params,
            target_params=tree_copy(params),
            opt_state={
                "actor": self.policy_optim.init(params["actor"]),
                "critic": self.critic_optim.init(params["critic"]),
            },
            hparams=Batch(),
            extra=Batch(),
            step=jnp.int32(0),
        )

    def forward(self, ts: TrainState, obs: jnp.ndarray, key: jax.Array, state=None, deterministic: bool = False) -> ActOut:
        act = self.actor.apply(ts.params["actor"], obs)
        return ActOut(act=act, state=state, info=Batch())

    def _target_q(self, ts: TrainState, obs_next: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        a_next = self.actor.apply(ts.target_params["actor"], obs_next)
        return self.critic.apply(ts.target_params["critic"], obs_next, a_next)

    def update_step(self, ts: TrainState, batch: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        weight = batch.get("weight", jnp.ones_like(batch.returns))

        def critic_loss(cp):
            q = self.critic.apply(cp, batch.obs, batch.act)
            td = batch.returns - q
            return (weight * td**2).mean(), td

        (c_loss, td), c_grads = jax.value_and_grad(critic_loss, has_aux=True)(ts.params["critic"])
        new_critic, new_copt = self._apply_grads(self.critic_optim, ts.params["critic"], c_grads, ts.opt_state["critic"])

        def actor_loss(ap):
            a = self.actor.apply(ap, batch.obs)
            return -self.critic.apply(new_critic, batch.obs, a).mean()

        a_loss, a_grads = jax.value_and_grad(actor_loss)(ts.params["actor"])
        new_actor, new_aopt = self._apply_grads(self.policy_optim, ts.params["actor"], a_grads, ts.opt_state["actor"])

        ts = ts.replace(
            params={"actor": new_actor, "critic": new_critic},
            opt_state={"actor": new_aopt, "critic": new_copt},
            step=ts.step + 1,
        )
        ts = self._polyak(ts)
        return ts, Batch(loss=c_loss + a_loss, actor_loss=a_loss, critic_loss=c_loss, td_error=td)

    def postprocess(self, ts, buffer, buf_state, batch, indices, stats):
        if isinstance(buffer, PrioritizedReplayBuffer) and "td_error" in stats:
            return buffer.update_weight(buf_state, indices, stats.td_error)
        return buf_state
