"""REINFORCE (vanilla policy gradient).

Rebuild of reference ``modelfree/reinforce.py``: ``Reinforce`` (:315) with
Monte-Carlo returns (``DiscountedReturnComputation`` :249) and optional
return standardization."""

from __future__ import annotations

import jax

from tianshou_tpu.algorithm.modelfree.onpolicy import OnPolicyActorCritic
from tianshou_tpu.data.batch import Batch

__all__ = ["Reinforce"]


class Reinforce(OnPolicyActorCritic):
    def __init__(self, actor, action_space, optim=None, gamma: float = 0.99,
                 return_standardization: bool = True, **kwargs) -> None:
        super().__init__(
            actor=actor,
            critic=None,
            action_space=action_space,
            optim=optim,
            gamma=gamma,
            return_standardization=return_standardization,
            **kwargs,
        )

    def loss_minibatch(self, params, mb: Batch, key: jax.Array):
        dist = self._dist(params, mb.obs)
        logp = dist.log_prob(mb.act)
        loss = -(logp * mb.returns).mean()
        return loss, Batch(loss=loss)
