"""Deterministic test environments, mirroring the reference's fixtures
(test/base/env.py): MoveToRightEnv makes collector/buffer behavior exactly
predictable (obs == position index).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.env.core import Box, Discrete, Env, EnvStep


class MoveState(NamedTuple):
    index: jnp.ndarray
    t: jnp.ndarray


class MoveToRightEnv(Env):
    """1-D walk: action 1 moves right, action 0 stays; episode ends at
    ``size`` with reward 1 (reference test/base/env.py:12).
    """

    def __init__(self, size: int = 5, max_episode_steps: int = 100) -> None:
        self.size = size
        self.max_episode_steps = max_episode_steps
        self.observation_space = Box(low=[0.0], high=[float(size)])
        self.action_space = Discrete(2)

    def _obs(self, s: MoveState) -> jnp.ndarray:
        return s.index.astype(jnp.float32)[None]

    def reset(self, key: jax.Array):
        s = MoveState(jnp.int32(0), jnp.int32(0))
        return s, self._obs(s)

    def step(self, state: MoveState, action: jnp.ndarray, key: jax.Array) -> EnvStep:
        index = jnp.minimum(state.index + (action > 0).astype(jnp.int32), self.size)
        t = state.t + 1
        terminated = index >= self.size
        new = MoveState(index, t)
        return EnvStep(
            state=new,
            obs=self._obs(new),
            reward=jnp.where(terminated, 1.0, 0.0).astype(jnp.float32),
            terminated=terminated,
            truncated=(t >= self.max_episode_steps) & ~terminated,
            info=Batch(),
        )
