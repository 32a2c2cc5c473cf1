"""Pendulum: pure-JAX swing-up task with Gymnasium Pendulum-v1 constants, so
the reference's continuous-control threshold (-250, test/continuous/
test_sac_with_il.py:86) applies directly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.env.core import Box, Env, EnvStep


def _angle_normalize(x: jnp.ndarray) -> jnp.ndarray:
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


class PendulumState(NamedTuple):
    theta: jnp.ndarray
    theta_dot: jnp.ndarray
    t: jnp.ndarray


class Pendulum(Env):
    max_episode_steps = 200

    def __init__(self, max_episode_steps: int = 200, g: float = 10.0) -> None:
        self.max_episode_steps = max_episode_steps
        self.max_speed = 8.0
        self.max_torque = 2.0
        self.dt = 0.05
        self.g = g
        self.m = 1.0
        self.l = 1.0
        self.observation_space = Box(low=[-1.0, -1.0, -self.max_speed], high=[1.0, 1.0, self.max_speed])
        self.action_space = Box(low=[-self.max_torque], high=[self.max_torque])

    def _obs(self, s: PendulumState) -> jnp.ndarray:
        return jnp.stack([jnp.cos(s.theta), jnp.sin(s.theta), s.theta_dot]).astype(jnp.float32)

    def reset(self, key: jax.Array):
        init = jax.random.uniform(key, (2,))
        theta = init[0] * 2 * jnp.pi - jnp.pi
        theta_dot = init[1] * 2.0 - 1.0
        s = PendulumState(theta, theta_dot, jnp.int32(0))
        return s, self._obs(s)

    def step(self, state: PendulumState, action: jnp.ndarray, key: jax.Array) -> EnvStep:
        u = jnp.clip(jnp.reshape(action, ()), -self.max_torque, self.max_torque)
        th, thdot = state.theta, state.theta_dot
        cost = _angle_normalize(th) ** 2 + 0.1 * thdot**2 + 0.001 * u**2
        newthdot = thdot + (3 * self.g / (2 * self.l) * jnp.sin(th) + 3.0 / (self.m * self.l**2) * u) * self.dt
        newthdot = jnp.clip(newthdot, -self.max_speed, self.max_speed)
        newth = th + newthdot * self.dt
        t = state.t + 1
        new = PendulumState(newth, newthdot, t)
        return EnvStep(
            state=new,
            obs=self._obs(new),
            reward=-cost.astype(jnp.float32),
            terminated=jnp.bool_(False),
            truncated=t >= self.max_episode_steps,
            info=Batch(),
        )
