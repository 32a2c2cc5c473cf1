"""Acrobot: two-link underactuated swing-up (Sutton's classic dynamics with
the RK4 integration and Gymnasium Acrobot-v1 constants)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.env.core import Box, Discrete, Env, EnvStep


class AcrobotState(NamedTuple):
    theta1: jnp.ndarray
    theta2: jnp.ndarray
    dtheta1: jnp.ndarray
    dtheta2: jnp.ndarray
    t: jnp.ndarray


def _wrap(x, lo, hi):
    return lo + (x - lo) % (hi - lo)


class Acrobot(Env):
    max_episode_steps = 500

    LINK_LENGTH_1 = 1.0
    LINK_MASS_1 = 1.0
    LINK_MASS_2 = 1.0
    LINK_COM_POS_1 = 0.5
    LINK_COM_POS_2 = 0.5
    LINK_MOI = 1.0
    MAX_VEL_1 = 4 * jnp.pi
    MAX_VEL_2 = 9 * jnp.pi
    dt = 0.2
    g = 9.8

    def __init__(self, max_episode_steps: int = 500) -> None:
        self.max_episode_steps = max_episode_steps
        high = [1.0, 1.0, 1.0, 1.0, float(self.MAX_VEL_1), float(self.MAX_VEL_2)]
        self.observation_space = Box(low=[-h for h in high], high=high)
        self.action_space = Discrete(3)

    def _obs(self, s: AcrobotState) -> jnp.ndarray:
        return jnp.stack([
            jnp.cos(s.theta1), jnp.sin(s.theta1),
            jnp.cos(s.theta2), jnp.sin(s.theta2),
            s.dtheta1, s.dtheta2,
        ]).astype(jnp.float32)

    def reset(self, key: jax.Array):
        init = jax.random.uniform(key, (4,), minval=-0.1, maxval=0.1)
        s = AcrobotState(init[0], init[1], init[2], init[3], jnp.int32(0))
        return s, self._obs(s)

    def _dsdt(self, s_aug: jnp.ndarray) -> jnp.ndarray:
        m1, m2 = self.LINK_MASS_1, self.LINK_MASS_2
        l1 = self.LINK_LENGTH_1
        lc1, lc2 = self.LINK_COM_POS_1, self.LINK_COM_POS_2
        I1 = I2 = self.LINK_MOI
        g = self.g
        a = s_aug[4]
        theta1, theta2, dtheta1, dtheta2 = s_aug[0], s_aug[1], s_aug[2], s_aug[3]
        d1 = m1 * lc1**2 + m2 * (l1**2 + lc2**2 + 2 * l1 * lc2 * jnp.cos(theta2)) + I1 + I2
        d2 = m2 * (lc2**2 + l1 * lc2 * jnp.cos(theta2)) + I2
        phi2 = m2 * lc2 * g * jnp.cos(theta1 + theta2 - jnp.pi / 2.0)
        phi1 = (
            -m2 * l1 * lc2 * dtheta2**2 * jnp.sin(theta2)
            - 2 * m2 * l1 * lc2 * dtheta2 * dtheta1 * jnp.sin(theta2)
            + (m1 * lc1 + m2 * l1) * g * jnp.cos(theta1 - jnp.pi / 2)
            + phi2
        )
        # "book" dynamics variant (gymnasium default)
        ddtheta2 = (
            a + d2 / d1 * phi1 - m2 * l1 * lc2 * dtheta1**2 * jnp.sin(theta2) - phi2
        ) / (m2 * lc2**2 + I2 - d2**2 / d1)
        ddtheta1 = -(d2 * ddtheta2 + phi1) / d1
        return jnp.stack([dtheta1, dtheta2, ddtheta1, ddtheta2, jnp.zeros_like(a)])

    def step(self, state: AcrobotState, action: jnp.ndarray, key: jax.Array) -> EnvStep:
        torque = (action - 1).astype(jnp.float32)  # {-1, 0, +1}
        s_aug = jnp.stack([state.theta1, state.theta2, state.dtheta1, state.dtheta2, torque])
        # RK4
        dt = self.dt
        k1 = self._dsdt(s_aug)
        k2 = self._dsdt(s_aug + dt / 2 * k1)
        k3 = self._dsdt(s_aug + dt / 2 * k2)
        k4 = self._dsdt(s_aug + dt * k3)
        ns = s_aug + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        theta1 = _wrap(ns[0], -jnp.pi, jnp.pi)
        theta2 = _wrap(ns[1], -jnp.pi, jnp.pi)
        dtheta1 = jnp.clip(ns[2], -self.MAX_VEL_1, self.MAX_VEL_1)
        dtheta2 = jnp.clip(ns[3], -self.MAX_VEL_2, self.MAX_VEL_2)
        t = state.t + 1
        new = AcrobotState(theta1, theta2, dtheta1, dtheta2, t)
        terminated = (-jnp.cos(theta1) - jnp.cos(theta2 + theta1)) > 1.0
        return EnvStep(
            state=new,
            obs=self._obs(new),
            reward=jnp.where(terminated, 0.0, -1.0).astype(jnp.float32),
            terminated=terminated,
            truncated=(t >= self.max_episode_steps) & ~terminated,
            info=Batch(),
        )
