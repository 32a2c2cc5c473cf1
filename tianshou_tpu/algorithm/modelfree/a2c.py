"""A2C (advantage actor-critic).

Rebuild of reference ``modelfree/a2c.py:156``: policy-gradient loss with GAE
advantages, value MSE with vf_coef, entropy bonus with ent_coef; gradient
clipping composes in the optax chain (reference passes max_grad_norm)."""

from __future__ import annotations

import jax

from tianshou_tpu.algorithm.modelfree.onpolicy import OnPolicyActorCritic
from tianshou_tpu.data.batch import Batch

__all__ = ["A2C"]


class A2C(OnPolicyActorCritic):
    def __init__(self, actor, critic, action_space, optim=None, gamma: float = 0.99,
                 gae_lambda: float = 0.95, vf_coef: float = 0.5, ent_coef: float = 0.01,
                 **kwargs) -> None:
        super().__init__(
            actor=actor, critic=critic, action_space=action_space, optim=optim,
            gamma=gamma, gae_lambda=gae_lambda, vf_coef=vf_coef, ent_coef=ent_coef,
            **kwargs,
        )

    def loss_minibatch(self, params, mb: Batch, key: jax.Array):
        dist = self._dist(params, mb.obs)
        logp = dist.log_prob(mb.act)
        actor_loss = -(logp * mb.adv).mean()
        v = self._value(params, mb.obs)
        vf_loss = ((mb.returns - v) ** 2).mean()
        ent = dist.entropy().mean()
        loss = actor_loss + self.vf_coef * vf_loss - self.ent_coef * ent
        return loss, Batch(loss=loss, actor_loss=actor_loss, vf_loss=vf_loss, entropy=ent)
