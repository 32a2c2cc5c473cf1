"""Device MuJoCo-class benchmark environments.

Observation layouts, reward terms, healthy ranges, control costs, horizons,
and reset-noise follow the Gymnasium v4 envs used by the reference's MuJoCo
benchmark tables (/root/reference/examples/mujoco/README.md:107-394,
mujoco_env.py in the reference examples). Ant exposes a quaternion in its
observation (converted from the internal rotation-vector coordinates) so the
27-dim layout matches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tianshou_tpu.env.mujoco.base import MujocoEnv, PhysState
from tianshou_tpu.env.physics.algebra import rotvec_to_quat, rotvec_to_mat
from tianshou_tpu.env.physics.dynamics import _rotvec_jacobian

__all__ = ["HalfCheetah", "Hopper", "Walker2d", "Ant", "Swimmer", "Reacher", "Humanoid"]


class HalfCheetah(MujocoEnv):
    """HalfCheetah-v4 task: obs = (qpos[1:], qvel) [17], reward =
    x-velocity - 0.1*||a||^2, no termination, 1000-step horizon."""

    xml = "half_cheetah.xml"
    frame_skip = 5
    reset_noise_scale = 0.1
    ctrl_cost_weight = 0.1

    def _obs(self, q, qd):
        return jnp.concatenate([q[1:], qd]).astype(jnp.float32)

    def _reward(self, q0, qd0, q1, qd1, action):
        x_vel = (q1[0] - q0[0]) / self.dt
        return x_vel - self.ctrl_cost_weight * jnp.sum(action * action)


class Hopper(MujocoEnv):
    """Hopper-v4: obs = (qpos[1:], clip(qvel, +-10)) [11]; healthy z>0.7,
    |angle|<0.2, |state|<100; reward = 1 + x_vel - 1e-3*||a||^2."""

    xml = "hopper.xml"
    frame_skip = 4
    reset_noise_scale = 5e-3
    reset_noise_kind = "both_uniform"
    ctrl_cost_weight = 1e-3
    healthy_reward = 1.0

    def _obs(self, q, qd):
        return jnp.concatenate([q[1:], jnp.clip(qd, -10.0, 10.0)]).astype(jnp.float32)

    def _healthy(self, q, qd):
        state = jnp.concatenate([q[2:], qd])
        return (
            jnp.all(jnp.abs(state) < 100.0)
            & (q[1] > 0.7)
            & (jnp.abs(q[2]) < 0.2)
        )

    def _reward(self, q0, qd0, q1, qd1, action):
        x_vel = (q1[0] - q0[0]) / self.dt
        return x_vel + self.healthy_reward * 1.0 - self.ctrl_cost_weight * jnp.sum(action * action)

    def _terminated(self, q, qd):
        return ~self._healthy(q, qd)


class Walker2d(MujocoEnv):
    """Walker2d-v4: obs [17]; healthy 0.8<z<2.0, |angle|<1.0;
    reward = 1 + x_vel - 1e-3*||a||^2."""

    xml = "walker2d.xml"
    frame_skip = 4
    reset_noise_scale = 5e-3
    reset_noise_kind = "both_uniform"
    ctrl_cost_weight = 1e-3
    healthy_reward = 1.0

    def _obs(self, q, qd):
        return jnp.concatenate([q[1:], jnp.clip(qd, -10.0, 10.0)]).astype(jnp.float32)

    def _healthy(self, q, qd):
        return (q[1] > 0.8) & (q[1] < 2.0) & (jnp.abs(q[2]) < 1.0)

    def _reward(self, q0, qd0, q1, qd1, action):
        x_vel = (q1[0] - q0[0]) / self.dt
        return x_vel + self.healthy_reward * 1.0 - self.ctrl_cost_weight * jnp.sum(action * action)

    def _terminated(self, q, qd):
        return ~self._healthy(q, qd)


class Ant(MujocoEnv):
    """Ant-v4: obs [27] = (z, quat, joint angles, qvel with body-frame
    angular velocity); healthy 0.2<z<1.0 and all finite;
    reward = 1 + x_vel - 0.5*||a||^2."""

    xml = "ant.xml"
    frame_skip = 5
    contact_iterations = 30
    reset_noise_scale = 0.1
    ctrl_cost_weight = 0.5
    healthy_reward = 1.0

    def _obs(self, q, qd):
        # internal coords: q = (pos3, rotvec3, 8 joints); gym layout is
        # qpos[2:] = (z, quat4, joints8) and qvel = (v3, omega3, joints8)
        quat = rotvec_to_quat(q[3:6])
        omega_world = _rotvec_jacobian(q[3:6]) @ qd[3:6]
        omega_body = rotvec_to_mat(q[3:6]).T @ omega_world
        return jnp.concatenate(
            [q[2:3], quat, q[6:], qd[:3], omega_body, qd[6:]]
        ).astype(jnp.float32)

    def _healthy(self, q, qd):
        return (
            jnp.isfinite(q).all()
            & jnp.isfinite(qd).all()
            & (q[2] > 0.2)
            & (q[2] < 1.0)
        )

    def _reward(self, q0, qd0, q1, qd1, action):
        x_vel = (q1[0] - q0[0]) / self.dt
        return x_vel + self.healthy_reward * 1.0 - self.ctrl_cost_weight * jnp.sum(action * action)

    def _terminated(self, q, qd):
        return ~self._healthy(q, qd)


class Humanoid(MujocoEnv):
    """Humanoid-v4 task: 17-DoF biped (free joint + 17 hinges, nq=23 in
    the rotation-vector chart). Reward = 5.0 (healthy) + 1.25 * COM
    x-velocity - 0.1*||a||^2; terminate outside 1.0 < z < 2.0; 1000-step
    horizon; reset noise U(-0.01, 0.01) on qpos AND qvel
    (reference row: SAC 5,488.5 +- 81.2, examples/mujoco/README.md:147).

    Observation: qpos[2:] (z excluded x/y; quaternion from the rotvec
    chart) + qvel (angular velocity in body frame, MuJoCo layout) +
    per-body COM 6D velocities (the informative core of gym's ``cvel``
    block) + actuator forces (``qfrc_actuator``). Gym's remaining
    ``cinert``/``cfrc_ext`` blocks (static pose functions / contact force
    readback) are omitted — documented deviation; the env is
    self-consistent for training and evaluation.
    """

    xml = "humanoid.xml"
    frame_skip = 5
    contact_iterations = 30
    # humanoid.xml body geoms are condim=1/contype=1/conaffinity=1: real
    # MuJoCo resolves frictionless self-contacts (foot-vs-other-shin,
    # forearm-vs-waist, foot-vs-butt — measured in the parity probe); the
    # 109 candidate pair rows close the worst per-dof parity errors (arm
    # dofs) and remove the cross-through gait exploit
    enable_pair_contacts = True
    reset_noise_scale = 1e-2
    reset_noise_kind = "both_uniform"
    ctrl_cost_weight = 0.1
    healthy_reward = 5.0
    forward_reward_weight = 1.25

    def _com(self, q):
        from tianshou_tpu.env.physics.dynamics import _fk_com

        pcom, _ = _fk_com(self.model, q)
        m = jnp.asarray(self.model.body_mass)
        return (m[:, None] * pcom).sum(0) / m.sum()

    def _obs(self, q, qd):
        from tianshou_tpu.env.physics.dynamics import _body_velocities, actuation

        quat = rotvec_to_quat(q[3:6])
        omega_world = _rotvec_jacobian(q[3:6]) @ qd[3:6]
        omega_body = rotvec_to_mat(q[3:6]).T @ omega_world
        qvel = jnp.concatenate([qd[:3], omega_body, qd[6:]])
        _, _, vcom, omega = _body_velocities(self.model, q, qd)
        return jnp.concatenate([
            q[2:3], quat, q[6:], qvel, vcom.reshape(-1), omega.reshape(-1),
        ]).astype(jnp.float32)

    def _healthy(self, q, qd):
        return (q[2] > 1.0) & (q[2] < 2.0)

    def _reward(self, q0, qd0, q1, qd1, action):
        x_vel = (self._com(q1)[0] - self._com(q0)[0]) / self.dt
        return (
            self.forward_reward_weight * x_vel
            + self.healthy_reward
            - self.ctrl_cost_weight * jnp.sum(action * action)
        )

    def _terminated(self, q, qd):
        return ~self._healthy(q, qd)


class Swimmer(MujocoEnv):
    """Swimmer-v4: obs [8] = (qpos[2:], qvel); reward = x_vel - 1e-4*||a||^2;
    no termination. Propulsion comes from the anisotropic fluid drag
    (option density/viscosity in the model)."""

    xml = "swimmer.xml"
    frame_skip = 4
    reset_noise_scale = 0.1
    reset_noise_kind = "both_uniform"
    ctrl_cost_weight = 1e-4

    def _obs(self, q, qd):
        return jnp.concatenate([q[2:], qd]).astype(jnp.float32)

    def _reward(self, q0, qd0, q1, qd1, action):
        x_vel = (q1[0] - q0[0]) / self.dt
        return x_vel - self.ctrl_cost_weight * jnp.sum(action * action)


class Reacher(MujocoEnv):
    """Reacher-v4: two-link arm reaching a random target; obs [11];
    reward = -(dist + ||a||^2); 50-step horizon, no termination."""

    xml = "reacher.xml"
    frame_skip = 2
    max_episode_steps = 50
    reset_noise_scale = 0.1

    def _fingertip(self, q):
        from tianshou_tpu.env.physics.dynamics import forward_kinematics

        p, _ = forward_kinematics(self.model, q)
        return p[3]  # fingertip body

    def _obs(self, q, qd):
        target = q[2:4]
        tip = self._fingertip(q)
        vec = tip - jnp.concatenate([target, jnp.array([0.01])])
        return jnp.concatenate(
            [jnp.cos(q[:2]), jnp.sin(q[:2]), target, qd[:2], vec]
        ).astype(jnp.float32)

    def reset(self, key: jax.Array):
        k1, k2, k3 = jax.random.split(key, 3)
        q = jnp.asarray(self.model.qpos0, jnp.float32)
        q = q.at[:2].add(jax.random.uniform(k1, (2,), minval=-0.1, maxval=0.1))
        # target uniform in the radius-0.2 disk (gym resamples a square)
        u = jax.random.uniform(k2, (2,))
        r = 0.2 * jnp.sqrt(u[0])
        th = 2 * jnp.pi * u[1]
        q = q.at[2].set(r * jnp.cos(th)).at[3].set(r * jnp.sin(th))
        qd = jax.random.uniform(k3, (self.model.nq,), minval=-0.005, maxval=0.005)
        qd = qd.at[2:4].set(0.0)
        st = PhysState(q, qd.astype(jnp.float32), jnp.int32(0))
        return st, self._obs(st.q, st.qd)

    def _reward(self, q0, qd0, q1, qd1, action):
        tip = self._fingertip(q0)
        vec = tip - jnp.concatenate([q0[2:4], jnp.array([0.01])])
        return -jnp.linalg.norm(vec) - jnp.sum(action * action)
