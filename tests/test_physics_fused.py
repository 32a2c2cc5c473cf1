"""Fused Pallas step kernel: interpret-mode parity vs dynamics.step.

The Mosaic-compiled path needs real TPU hardware (probed by
scripts/physics_fused_probe.py); interpret mode validates the kernel's
trace (blocking, padding, fori_loop carry) against the vmapped reference
on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tianshou_tpu.env.mujoco import make
from tianshou_tpu.env.physics import dynamics
from tianshou_tpu.ops.pallas.physics_fused import fused_step


@pytest.mark.parametrize("task", ["HalfCheetah", "Hopper"])
def test_fused_interpret_parity(task):
    env = make(task)
    model = env.model
    E = 6  # deliberately not a multiple of block_e: exercises padding
    rng = np.random.default_rng(0)
    q = jnp.asarray(
        np.asarray(model.qpos0)[None] + 0.03 * rng.standard_normal((E, model.nq)),
        jnp.float32,
    )
    qd = jnp.asarray(0.05 * rng.standard_normal((E, model.nq)), jnp.float32)
    ctrl = jnp.asarray(rng.uniform(-1, 1, (E, len(model.actuators))), jnp.float32)
    fs = int(env.frame_skip)

    ref = jax.jit(jax.vmap(lambda q, qd, c: dynamics.step(model, q, qd, c, frame_skip=fs)))
    q_ref, qd_ref = ref(q, qd, ctrl)

    q_f, qd_f = fused_step(
        model, q.T, qd.T, ctrl.T, frame_skip=fs, block_e=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(q_f.T), np.asarray(q_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(qd_f.T), np.asarray(qd_ref), rtol=5e-3, atol=5e-3)


def test_fused_interpret_free_joint():
    """Ant (free joint) exercises _remap_free_b inside the kernel; one
    substep keeps interpret-mode cost bounded."""
    env = make("Ant")
    model = env.model
    E = 4
    rng = np.random.default_rng(1)
    q = jnp.asarray(
        np.asarray(model.qpos0)[None] + 0.03 * rng.standard_normal((E, model.nq)),
        jnp.float32,
    )
    qd = jnp.asarray(0.05 * rng.standard_normal((E, model.nq)), jnp.float32)
    ctrl = jnp.asarray(rng.uniform(-1, 1, (E, len(model.actuators))), jnp.float32)

    ref = jax.jit(
        jax.vmap(lambda q, qd, c: dynamics.step(model, q, qd, c, frame_skip=1, substeps=1))
    )
    q_ref, qd_ref = ref(q, qd, ctrl)
    q_f, qd_f = fused_step(
        model, q.T, qd.T, ctrl.T, frame_skip=1, substeps=1, block_e=4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(q_f.T), np.asarray(q_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(qd_f.T), np.asarray(qd_ref), rtol=5e-3, atol=5e-3)
