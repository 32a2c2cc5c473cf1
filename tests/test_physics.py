"""Physics-core correctness tests: analytic mass matrix/gravity on a
pendulum, double-pendulum energy conservation (exercises the Coriolis
path), free-fall kinematics, contact statics, rotation-vector remapping,
MJCF loading against known MuJoCo values, and stability + obs-layout checks
for every benchmark env."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tianshou_tpu.env.physics import forward_kinematics, init_state, load_mjcf, step
from tianshou_tpu.env.physics.algebra import rotvec_to_mat
from tianshou_tpu.env.physics.dynamics import (
    _remap_free_rotations,
    _rotvec_jacobian,
    kinetic_energy,
    mass_matrix,
    potential_energy,
)
from tianshou_tpu.env.physics.model import HINGE, Geom, Joint, Model


def _pendulum(n=1, contact=False, timestep=0.001):
    geoms, joints = [], []
    for b in range(n):
        geoms.append(Geom(gtype="capsule", body=b, size=np.array([0.02, 0.25]),
                          pos=np.array([0, 0, -0.25]), rot=np.eye(3), contact=contact))
        joints.append(Joint(jtype=HINGE, body=b, axis=np.array([0, 1, 0.0]),
                            pos=np.zeros(3), q_idx=b))
    return Model(
        nbody=n, parent=[-1] + list(range(n - 1)),
        body_pos=np.array([[0, 0, 0.0]] + [[0, 0, -0.5]] * (n - 1)),
        body_quat=np.tile([1.0, 0, 0, 0], (n, 1)),
        body_names=[f"b{i}" for i in range(n)], joints=joints, geoms=geoms,
        actuators=[], nq=n, qpos0=np.zeros(n), timestep=timestep,
    ).finalize()


def test_pendulum_analytics():
    m = _pendulum(1)
    q = jnp.array([0.3])
    # M == I about the pivot (parallel axis, COM at l=0.25 below the hinge)
    I_pivot = m.body_inertia[0][1, 1] + m.body_mass[0] * 0.25**2
    M = mass_matrix(m, q)
    np.testing.assert_allclose(float(M[0, 0]), I_pivot, rtol=1e-4)
    # dV/dq == m g l sin(q)
    dV = jax.grad(lambda q_: potential_energy(m, q_))(q)
    np.testing.assert_allclose(
        float(dV[0]), m.body_mass[0] * 9.81 * 0.25 * np.sin(0.3), rtol=1e-4
    )
    # kinetic energy quadratic: T(qd=1) == I/2
    T = kinetic_energy(m, q, jnp.array([1.0]))
    np.testing.assert_allclose(float(T), I_pivot / 2, rtol=1e-4)


def test_double_pendulum_energy_conservation():
    m = _pendulum(2, timestep=0.0005)
    q, qd = jnp.array([2.0, 0.5]), jnp.zeros(2)
    E0 = float(kinetic_energy(m, q, qd) + potential_energy(m, q))
    sj = jax.jit(lambda q, qd: step(m, q, qd, jnp.zeros(0), frame_skip=2000))
    q, qd = sj(q, qd)  # 1 second of chaotic swinging
    E1 = float(kinetic_energy(m, q, qd) + potential_energy(m, q))
    assert abs(E1 - E0) / abs(E0) < 0.05, (E0, E1)


def test_free_fall_parabola():
    """Ant dropped with gravity only: its CENTER OF MASS follows
    z = z0 - g t^2 / 2 exactly, regardless of internal leg motion
    (joint-limit springs swing the legs, but those are internal forces)."""
    from tianshou_tpu.env.physics.dynamics import _fk_com

    m = load_mjcf("ant.xml")

    def com_z(q):
        pcom, _ = _fk_com(m, q)
        mass = jnp.asarray(m.body_mass)
        return float(jnp.sum(mass * pcom[:, 2]) / mass.sum())

    q, qd = init_state(m)
    q = q.at[2].set(3.0)  # well above ground, no contacts
    z0 = com_z(q)
    sj = jax.jit(lambda q, qd: step(m, q, qd, jnp.zeros(8), frame_skip=10))
    q1, qd1 = sj(q, qd)  # 0.1 s
    t = 10 * m.timestep
    # semi-implicit Euler discrete free fall: dz = -g dt^2 * n(n+1)/2
    import numpy as _np

    substeps = max(1, int(_np.ceil(m.timestep / 0.002 - 1e-9)))  # step() default
    n = 10 * substeps
    dt = m.timestep / substeps
    dz = 9.81 * dt * dt * n * (n + 1) / 2
    np.testing.assert_allclose(com_z(q1), z0 - dz, atol=2e-3)


def test_contact_statics():
    """Hopper dropped from rest settles (bounded penetration, no blow-up)."""
    m = load_mjcf("hopper.xml")
    q, qd = init_state(m)
    sj = jax.jit(lambda q, qd: step(m, q, qd, jnp.zeros(3), frame_skip=4))
    for _ in range(250):  # 2 simulated seconds
        q, qd = sj(q, qd)
    assert not bool(jnp.isnan(q).any())
    assert -0.1 < float(q[1]) < 1.3  # collapsed onto the floor, not through it
    assert float(jnp.abs(qd).max()) < 5.0  # settled


def test_rotvec_remap_preserves_rotation_and_omega():
    m = load_mjcf("ant.xml")
    q, qd = init_state(m)
    q = q.at[3:6].set(jnp.array([3.0, 2.0, 1.5]))
    qd = qd.at[3:6].set(jnp.array([3.0, -1.0, 0.5]))
    q2, qd2 = _remap_free_rotations(m, q, qd)
    assert float(jnp.linalg.norm(q2[3:6])) < np.pi
    R1, R2 = rotvec_to_mat(q[3:6]), rotvec_to_mat(q2[3:6])
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-5)
    w1 = _rotvec_jacobian(q[3:6]) @ qd[3:6]
    w2 = _rotvec_jacobian(q2[3:6]) @ qd2[3:6]
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)


def test_mjcf_known_mujoco_values():
    """Parsed models match MuJoCo-computed quantities."""
    ant = load_mjcf("ant.xml")
    # MuJoCo's ant torso mass (density 5, r=0.25 sphere)
    np.testing.assert_allclose(ant.body_mass[0], 0.32724923, rtol=1e-5)
    assert ant.nq == 14 and len(ant.actuators) == 8
    cheetah = load_mjcf("half_cheetah.xml")
    np.testing.assert_allclose(cheetah.total_mass, 14.0, rtol=1e-6)  # settotalmass
    assert cheetah.nq == 9
    gears = [a.gear for a in cheetah.actuators]
    assert gears == [120, 90, 60, 120, 60, 30]
    hopper = load_mjcf("hopper.xml")
    assert hopper.timestep == 0.002 and hopper.nq == 6
    # hopper rootz has ref=1.25 -> qpos0
    np.testing.assert_allclose(hopper.qpos0[1], 1.25)


ENVS = None


def _envs():
    global ENVS
    if ENVS is None:
        from tianshou_tpu.env.mujoco import Ant, HalfCheetah, Hopper, Reacher, Swimmer, Walker2d

        ENVS = {
            "HalfCheetah": (HalfCheetah, 17),
            "Hopper": (Hopper, 11),
            "Walker2d": (Walker2d, 17),
            "Ant": (Ant, 27),
            "Swimmer": (Swimmer, 8),
            "Reacher": (Reacher, 11),
        }
    return ENVS


@pytest.mark.parametrize("name", ["HalfCheetah", "Hopper", "Walker2d", "Ant", "Swimmer", "Reacher"])
def test_env_obs_layout_and_stability(name):
    """Gym-v4 obs dims; 50 random control steps with no NaN, vmapped."""
    cls, obs_dim = _envs()[name]
    env = cls()
    from tianshou_tpu.env.core import VectorDeviceEnv

    venv = VectorDeviceEnv(env, 4)
    st, obs = venv.reset(jax.random.key(0))
    assert obs.shape == (4, obs_dim)

    @jax.jit
    def roll(st, key):
        def body(carry, k):
            st = carry
            a = jax.random.uniform(k, (4,) + env.action_space.shape, minval=-1, maxval=1)
            out = venv.step(st, a, k)
            return out.state, (out.obs, out.reward)
        st, (obss, rews) = jax.lax.scan(body, st, jax.random.split(key, 50))
        return obss, rews

    obss, rews = roll(st, jax.random.key(1))
    assert not bool(jnp.isnan(obss).any())
    assert not bool(jnp.isnan(rews).any())


def test_hopper_healthy_termination():
    """Dropping hopper becomes unhealthy (z < 0.7) and terminates."""
    from tianshou_tpu.env.mujoco import Hopper

    env = Hopper()
    st, obs = env.reset(jax.random.key(0))
    stepj = jax.jit(env.step)
    terminated = False
    for i in range(300):
        out = stepj(st, jnp.zeros(3), jax.random.key(i))
        st = out.state
        if bool(out.terminated):
            terminated = True
            break
    assert terminated


def test_physics_step_pins_fp32_matmul_precision():
    """Every dot in a device-env step must carry Precision.HIGHEST: the TPU
    backend lowers default-precision fp32 matmuls to bf16 multiplicands,
    which corrupts the dynamics (measured: scripted-gait Swimmer drifted to
    x=1.455 vs real MuJoCo 0.337 on-chip before the pin in dynamics.step).
    This guard is CPU-runnable because the precision attribute is part of
    the traced jaxpr, not the backend."""
    import re

    import jax
    import jax.numpy as jnp

    from tianshou_tpu.env import mujoco as dm

    env = dm.Swimmer()
    st, _ = env.reset(jax.random.key(0))
    txt = str(jax.make_jaxpr(lambda s, a, k: env.step(s, a, k))(st, jnp.zeros(2), jax.random.key(0)))
    n_dots = txt.count("dot_general")
    n_highest = len(re.findall(r"precision=\(Precision.HIGHEST, Precision.HIGHEST\)", txt))
    # The dynamics now express every tiny contraction as mul+reduce (VPU
    # native fp32, no MXU tile padding — see env/physics/linalg.py), so the
    # ideal jaxpr has ZERO dot_generals; any residual dot must carry the
    # fp32 pin.
    assert n_highest == n_dots, (n_dots, n_highest)
