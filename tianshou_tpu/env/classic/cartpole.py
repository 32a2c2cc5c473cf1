"""CartPole: pure-JAX implementation of the classic cart-pole balancing task
(standard Barto-Sutton-Anderson dynamics, matching Gymnasium's CartPole-v1
constants so the reference's CartPole reward thresholds apply directly,
e.g. test/discrete/test_dqn.py:69 threshold 195).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.env.core import Box, Discrete, Env, EnvStep


class CartPoleState(NamedTuple):
    x: jnp.ndarray
    x_dot: jnp.ndarray
    theta: jnp.ndarray
    theta_dot: jnp.ndarray
    t: jnp.ndarray  # step counter for truncation


class CartPole(Env):
    max_episode_steps = 500

    def __init__(self, max_episode_steps: int = 500) -> None:
        self.max_episode_steps = max_episode_steps
        self.gravity = 9.8
        self.masscart = 1.0
        self.masspole = 0.1
        self.total_mass = self.masscart + self.masspole
        self.length = 0.5  # half pole length
        self.polemass_length = self.masspole * self.length
        self.force_mag = 10.0
        self.tau = 0.02
        self.theta_threshold = 12 * 2 * jnp.pi / 360
        self.x_threshold = 2.4
        high = [self.x_threshold * 2, 3.4e38, float(self.theta_threshold) * 2, 3.4e38]
        self.observation_space = Box(low=[-h for h in high], high=high)
        self.action_space = Discrete(2)

    def _obs(self, s: CartPoleState) -> jnp.ndarray:
        return jnp.stack([s.x, s.x_dot, s.theta, s.theta_dot]).astype(jnp.float32)

    def reset(self, key: jax.Array):
        init = jax.random.uniform(key, (4,), minval=-0.05, maxval=0.05)
        s = CartPoleState(init[0], init[1], init[2], init[3], jnp.int32(0))
        return s, self._obs(s)

    def step(self, state: CartPoleState, action: jnp.ndarray, key: jax.Array) -> EnvStep:
        force = jnp.where(action == 1, self.force_mag, -self.force_mag)
        costheta = jnp.cos(state.theta)
        sintheta = jnp.sin(state.theta)
        temp = (force + self.polemass_length * state.theta_dot**2 * sintheta) / self.total_mass
        thetaacc = (self.gravity * sintheta - costheta * temp) / (
            self.length * (4.0 / 3.0 - self.masspole * costheta**2 / self.total_mass)
        )
        xacc = temp - self.polemass_length * thetaacc * costheta / self.total_mass
        # Euler integration, kinematics-first ("euler" mode in gymnasium)
        x = state.x + self.tau * state.x_dot
        x_dot = state.x_dot + self.tau * xacc
        theta = state.theta + self.tau * state.theta_dot
        theta_dot = state.theta_dot + self.tau * thetaacc
        t = state.t + 1
        new = CartPoleState(x, x_dot, theta, theta_dot, t)
        terminated = (
            (jnp.abs(x) > self.x_threshold) | (jnp.abs(theta) > self.theta_threshold)
        )
        truncated = (t >= self.max_episode_steps) & ~terminated
        return EnvStep(
            state=new,
            obs=self._obs(new),
            reward=jnp.float32(1.0),
            terminated=terminated,
            truncated=truncated,
            info=Batch(),
        )
