"""GoalReach: a sparse-reward 2-D goal-conditioned env (FetchReach-style),
the device analogue of the reference's MyGoalEnv HER fixture
(test/base/env.py:209). Reward is -1 until the agent is within ``eps`` of
the goal — unsolvable without HER-style relabeling at long horizons.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.env.core import Box, Env, EnvStep


class GoalReachState(NamedTuple):
    pos: jnp.ndarray   # [2]
    goal: jnp.ndarray  # [2]
    t: jnp.ndarray


class GoalReach(Env):
    max_episode_steps = 40

    def __init__(self, size: float = 1.0, step_size: float = 0.1, eps: float = 0.1,
                 max_episode_steps: int = 40) -> None:
        self.size = size
        self.step_size = step_size
        self.eps = eps
        self.max_episode_steps = max_episode_steps
        self.observation_space = Box(low=[-size] * 2, high=[size] * 2)  # of 'observation'
        self.action_space = Box(low=[-1.0, -1.0], high=[1.0, 1.0])

    def compute_reward(self, achieved: jnp.ndarray, desired: jnp.ndarray) -> jnp.ndarray:
        d = jnp.linalg.norm(achieved - desired, axis=-1)
        return jnp.where(d < self.eps, 0.0, -1.0).astype(jnp.float32)

    def _obs(self, s: GoalReachState) -> Batch:
        return Batch(observation=s.pos, achieved_goal=s.pos, desired_goal=s.goal)

    def reset(self, key: jax.Array):
        k1, k2 = jax.random.split(key)
        pos = jax.random.uniform(k1, (2,), minval=-self.size, maxval=self.size)
        goal = jax.random.uniform(k2, (2,), minval=-self.size, maxval=self.size)
        s = GoalReachState(pos, goal, jnp.int32(0))
        return s, self._obs(s)

    def step(self, state: GoalReachState, action: jnp.ndarray, key: jax.Array) -> EnvStep:
        act = jnp.clip(action, -1.0, 1.0) * self.step_size
        pos = jnp.clip(state.pos + act, -self.size, self.size)
        t = state.t + 1
        new = GoalReachState(pos, state.goal, t)
        rew = self.compute_reward(pos, state.goal)
        reached = rew >= 0.0
        return EnvStep(
            state=new,
            obs=self._obs(new),
            reward=rew,
            terminated=reached,
            truncated=(t >= self.max_episode_steps) & ~reached,
            info=Batch(),
        )
