"""Parity: env-last batched dynamics (batched.py) vs vmapped dynamics.step.

The env-last layout (struct dims in sublanes, envs in lanes) exists for the
fused Pallas step kernel; under plain jit it must be bit-for-bit the same
math as `dynamics.step` batched with vmap (up to fp32 reassociation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tianshou_tpu.env.mujoco import make
from tianshou_tpu.env.physics import dynamics
from tianshou_tpu.env.physics import batched as B

TASKS = ["HalfCheetah", "Hopper", "Walker2d", "Ant", "Humanoid", "Swimmer"]


def _rand_state(model, E, seed):
    rng = np.random.default_rng(seed)
    q0 = np.asarray(model.qpos0, np.float32)
    q = jnp.asarray(q0[None, :] + 0.05 * rng.standard_normal((E, model.nq)), jnp.float32)
    qd = jnp.asarray(0.1 * rng.standard_normal((E, model.nq)), jnp.float32)
    nu = len(model.actuators)
    ctrl = jnp.asarray(rng.uniform(-1, 1, (E, nu)), jnp.float32)
    return q, qd, ctrl


@pytest.mark.parametrize("task", TASKS)
def test_step_parity(task):
    env = make(task)
    model = env.model
    # step_b does not implement geom-pair rows (Humanoid enables them and
    # uses the vmapped path in benchmarks); parity covers the shared subset
    model.enable_pair_contacts = False
    E = 4
    q, qd, ctrl = _rand_state(model, E, seed=hash(task) % 2**31)

    fs = int(getattr(env, "frame_skip", 1))
    sub = getattr(env, "substeps", None)

    ref = jax.jit(
        jax.vmap(lambda q, qd, c: dynamics.step(model, q, qd, c, frame_skip=fs, substeps=sub))
    )
    q_ref, qd_ref = ref(q, qd, ctrl)

    with jax.default_matmul_precision("float32"):
        got = jax.jit(
            lambda q, qd, c: B.step_b(model, q.T, qd.T, c.T, frame_skip=fs, substeps=sub)
        )
        q_b, qd_b = got(q, qd, ctrl)
    q_b, qd_b = q_b.T, qd_b.T

    np.testing.assert_allclose(np.asarray(q_b), np.asarray(q_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(qd_b), np.asarray(qd_ref), rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("task", ["HalfCheetah", "Humanoid"])
def test_mass_matrix_parity(task):
    model = make(task).model
    E = 3
    q, _, _ = _rand_state(model, E, seed=7)
    M_ref = jax.vmap(lambda q: dynamics.mass_matrix(model, q))(q)
    M_b = B.mass_matrix_b(model, q.T)  # [nq, nq, E]
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(M_b, -1, 0)), np.asarray(M_ref), rtol=1e-4, atol=1e-5
    )


def test_multi_step_trajectory_parity():
    """8 env-steps of Hopper stay in lockstep (catches drift/remap bugs)."""
    env = make("Hopper")
    model = env.model
    E = 2
    q, qd, ctrl = _rand_state(model, E, seed=3)
    fs = int(getattr(env, "frame_skip", 1))
    sub = getattr(env, "substeps", None)

    step_ref = jax.jit(
        jax.vmap(lambda q, qd, c: dynamics.step(model, q, qd, c, frame_skip=fs, substeps=sub))
    )
    with jax.default_matmul_precision("float32"):
        step_bat = jax.jit(
            lambda qT, qdT, cT: B.step_b(model, qT, qdT, cT, frame_skip=fs, substeps=sub)
        )
        qr, qdr = q, qd
        qb, qdb = q.T, qd.T
        for i in range(8):
            qr, qdr = step_ref(qr, qdr, ctrl)
            qb, qdb = step_bat(qb, qdb, ctrl.T)
        np.testing.assert_allclose(np.asarray(qb.T), np.asarray(qr), rtol=1e-3, atol=1e-3)
