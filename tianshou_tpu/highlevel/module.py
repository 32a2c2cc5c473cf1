"""Default actor/critic module factories (reference highlevel/module/
actor.py:53-284 and critic.py:17-256): build flax nets from env spaces."""

from __future__ import annotations

import dataclasses
from collections.abc import Sequence

from tianshou_tpu.env.core import Discrete, Space
from tianshou_tpu.models.continuous import (
    ContinuousActorDeterministic,
    ContinuousActorProbabilistic,
    ContinuousCritic,
)
from tianshou_tpu.models.discrete import DiscreteActor, DiscreteCritic
from tianshou_tpu.models.mlp import Net

__all__ = ["ActorFactoryDefault", "CriticFactoryDefault", "QNetFactoryDefault"]


@dataclasses.dataclass
class ActorFactoryDefault:
    hidden_sizes: Sequence[int] = (64, 64)
    continuous_deterministic: bool = False
    conditioned_sigma: bool = False

    def create(self, obs_space: Space, act_space: Space):
        if isinstance(act_space, Discrete):
            return DiscreteActor(hidden_sizes=tuple(self.hidden_sizes), action_dim=act_space.n)
        dim = int(act_space.shape[0]) if act_space.shape else 1
        if self.continuous_deterministic:
            return ContinuousActorDeterministic(hidden_sizes=tuple(self.hidden_sizes), action_dim=dim)
        return ContinuousActorProbabilistic(
            hidden_sizes=tuple(self.hidden_sizes), action_dim=dim, conditioned_sigma=self.conditioned_sigma
        )


@dataclasses.dataclass
class CriticFactoryDefault:
    hidden_sizes: Sequence[int] = (64, 64)
    use_action: bool = False

    def create(self, obs_space: Space, act_space: Space):
        if self.use_action:
            return ContinuousCritic(hidden_sizes=tuple(self.hidden_sizes), use_action=True)
        return DiscreteCritic(hidden_sizes=tuple(self.hidden_sizes))


@dataclasses.dataclass
class QNetFactoryDefault:
    hidden_sizes: Sequence[int] = (64, 64)
    num_atoms: int = 1
    softmax: bool = False

    def create(self, obs_space: Space, act_space: Space):
        assert isinstance(act_space, Discrete)
        return Net(
            hidden_sizes=tuple(self.hidden_sizes),
            output_dim=act_space.n,
            num_atoms=self.num_atoms,
            softmax=self.softmax,
        )
