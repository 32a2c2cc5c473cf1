"""MountainCar (discrete and continuous): pure-JAX, Gymnasium-compatible
constants (Moore's classic dynamics)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.env.core import Box, Discrete, Env, EnvStep


class MountainCarState(NamedTuple):
    position: jnp.ndarray
    velocity: jnp.ndarray
    t: jnp.ndarray


class MountainCar(Env):
    max_episode_steps = 200

    def __init__(self, max_episode_steps: int = 200) -> None:
        self.max_episode_steps = max_episode_steps
        self.min_position, self.max_position = -1.2, 0.6
        self.max_speed = 0.07
        self.goal_position = 0.5
        self.force = 0.001
        self.gravity = 0.0025
        self.observation_space = Box(low=[self.min_position, -self.max_speed], high=[self.max_position, self.max_speed])
        self.action_space = Discrete(3)

    def _obs(self, s: MountainCarState) -> jnp.ndarray:
        return jnp.stack([s.position, s.velocity]).astype(jnp.float32)

    def reset(self, key: jax.Array):
        pos = jax.random.uniform(key, (), minval=-0.6, maxval=-0.4)
        s = MountainCarState(pos, jnp.float32(0.0), jnp.int32(0))
        return s, self._obs(s)

    def step(self, state: MountainCarState, action: jnp.ndarray, key: jax.Array) -> EnvStep:
        velocity = state.velocity + (action - 1) * self.force + jnp.cos(3 * state.position) * (-self.gravity)
        velocity = jnp.clip(velocity, -self.max_speed, self.max_speed)
        position = jnp.clip(state.position + velocity, self.min_position, self.max_position)
        velocity = jnp.where((position == self.min_position) & (velocity < 0), 0.0, velocity)
        t = state.t + 1
        new = MountainCarState(position, velocity, t)
        terminated = position >= self.goal_position
        return EnvStep(
            state=new,
            obs=self._obs(new),
            reward=jnp.float32(-1.0),
            terminated=terminated,
            truncated=(t >= self.max_episode_steps) & ~terminated,
            info=Batch(),
        )


class MountainCarContinuous(Env):
    max_episode_steps = 999

    def __init__(self, max_episode_steps: int = 999) -> None:
        self.max_episode_steps = max_episode_steps
        self.min_position, self.max_position = -1.2, 0.6
        self.max_speed = 0.07
        self.goal_position = 0.45
        self.power = 0.0015
        self.observation_space = Box(low=[self.min_position, -self.max_speed], high=[self.max_position, self.max_speed])
        self.action_space = Box(low=[-1.0], high=[1.0])

    def _obs(self, s: MountainCarState) -> jnp.ndarray:
        return jnp.stack([s.position, s.velocity]).astype(jnp.float32)

    def reset(self, key: jax.Array):
        pos = jax.random.uniform(key, (), minval=-0.6, maxval=-0.4)
        s = MountainCarState(pos, jnp.float32(0.0), jnp.int32(0))
        return s, self._obs(s)

    def step(self, state: MountainCarState, action: jnp.ndarray, key: jax.Array) -> EnvStep:
        force = jnp.clip(jnp.reshape(action, ()), -1.0, 1.0)
        velocity = state.velocity + force * self.power - 0.0025 * jnp.cos(3 * state.position)
        velocity = jnp.clip(velocity, -self.max_speed, self.max_speed)
        position = jnp.clip(state.position + velocity, self.min_position, self.max_position)
        velocity = jnp.where((position == self.min_position) & (velocity < 0), 0.0, velocity)
        t = state.t + 1
        new = MountainCarState(position, velocity, t)
        terminated = position >= self.goal_position
        reward = jnp.where(terminated, 100.0, 0.0) - 0.1 * force**2
        return EnvStep(
            state=new,
            obs=self._obs(new),
            reward=reward.astype(jnp.float32),
            terminated=terminated,
            truncated=(t >= self.max_episode_steps) & ~terminated,
            info=Batch(),
        )
