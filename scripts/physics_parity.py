"""Single-step dynamics parity harness: device physics vs REAL MuJoCo.

Rolls out the real Gymnasium MuJoCo env with random (or scripted) actions,
and at every env step ALSO advances the device physics from the same
(qpos, qvel) with the same action, then compares the resulting state one
frame_skip later. This isolates per-step dynamics error (contact model,
fluid model, integrator) from compounding policy/rollout divergence, and
is the measurement tool behind the contact-fidelity work (VERDICT r2
items 2-3).

Coordinate note: the 2D tasks (HalfCheetah/Hopper/Walker2d/Swimmer) share
the exact qpos layout between engines; Ant/Humanoid use a rotation-vector
free-joint chart on the device side and are mapped through quat<->rotvec.

Usage (CPU-only, safe to run while the TPU queue is busy)::

    python scripts/physics_parity.py --task Hopper --steps 300
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import mujoco
import numpy as np

from tianshou_tpu.env import mujoco as device_mujoco
from tianshou_tpu.env.physics import dynamics as dyn
from tianshou_tpu.env.physics.mjcf import gym_asset_path


def quat_to_rotvec(quat: np.ndarray) -> np.ndarray:
    w, x, y, z = quat / np.linalg.norm(quat)
    n = np.linalg.norm([x, y, z])
    if n < 1e-12:
        return np.zeros(3)
    angle = 2.0 * np.arctan2(n, w)
    if angle > np.pi:
        angle -= 2 * np.pi
    return np.array([x, y, z]) / n * angle


def rotvec_jac_np(r: np.ndarray) -> np.ndarray:
    """B(r): omega_world = B(r) @ rdot (matches dynamics._rotvec_jacobian)."""
    from tianshou_tpu.env.physics.dynamics import _rotvec_jacobian

    return np.asarray(_rotvec_jacobian(jnp.asarray(r, jnp.float64)))


def mj_state_to_device(m: mujoco.MjModel, qpos, qvel, has_free: bool):
    """Map MuJoCo (qpos, qvel) to the device model's (q, qd)."""
    if not has_free:
        return np.asarray(qpos).copy(), np.asarray(qvel).copy()
    # free joint first: qpos = [p3, quat4, rest], qvel = [v3, omega_BODY3, rest]
    r = quat_to_rotvec(qpos[3:7])
    q = np.concatenate([qpos[:3], r, qpos[7:]])
    R = np.asarray(
        jax.jit(lambda rv: __import__("tianshou_tpu.env.physics.algebra", fromlist=["rotvec_to_mat"]).rotvec_to_mat(rv))(jnp.asarray(r))
    )
    omega_world = R @ np.asarray(qvel[3:6])
    rd = np.linalg.solve(rotvec_jac_np(r), omega_world)
    qd = np.concatenate([qvel[:3], rd, qvel[6:]])
    return q, qd


def device_state_to_mjlike(env, q, qd, has_free: bool):
    """Map device (q, qd) back to MuJoCo layout for comparison."""
    if not has_free:
        return np.asarray(q), np.asarray(qd)
    from tianshou_tpu.env.physics.algebra import rotvec_to_mat, rotvec_to_quat

    r = np.asarray(q[3:6])
    quat = np.asarray(rotvec_to_quat(jnp.asarray(r)))
    omega_world = rotvec_jac_np(r) @ np.asarray(qd[3:6])
    R = np.asarray(rotvec_to_mat(jnp.asarray(r)))
    omega_body = R.T @ omega_world
    qpos = np.concatenate([np.asarray(q[:3]), quat, np.asarray(q[6:])])
    qvel = np.concatenate([np.asarray(qd[:3]), omega_body, np.asarray(qd[6:])])
    return qpos, qvel


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="Hopper")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--action-scale", type=float, default=1.0)
    p.add_argument("--substeps", type=int, default=None)
    p.add_argument("--iters", type=int, default=None, help="APGD contact iterations")
    p.add_argument("--per-dof", action="store_true")
    args = p.parse_args()

    env = getattr(device_mujoco, args.task)()
    if args.substeps:
        env.substeps = args.substeps
    if args.iters:
        env.model.contact_iterations = args.iters
    xml = gym_asset_path(env.xml)
    m = mujoco.MjModel.from_xml_path(xml)
    d = mujoco.MjData(m)
    has_free = m.jnt_type[0] == mujoco.mjtJoint.mjJNT_FREE if m.njnt else False

    rng = np.random.default_rng(args.seed)
    mujoco.mj_resetData(m, d)
    # gym-style reset noise
    d.qpos[:] = d.qpos + rng.uniform(-0.005, 0.005, m.nq)
    d.qvel[:] = rng.uniform(-0.005, 0.005, m.nv)

    step_dev = jax.jit(
        lambda q, qd, a: dyn.step(
            env.model, q, qd, a, frame_skip=env.frame_skip, substeps=env.substeps
        )
    )

    nv_err, nv_mag = [], []
    pos_err = []
    dof_err = np.zeros(m.nv)
    dof_mag = np.zeros(m.nv)
    ncon_hist = []
    for t in range(args.steps):
        a = args.action_scale * rng.uniform(-1, 1, m.nu)
        q0, qd0 = mj_state_to_device(m, d.qpos.copy(), d.qvel.copy(), has_free)
        # ground truth: frame_skip MuJoCo steps
        d.ctrl[:] = a
        for _ in range(env.frame_skip):
            mujoco.mj_step(m, d)
        ncon_hist.append(d.ncon)
        # device step from the same state
        q1, qd1 = step_dev(jnp.asarray(q0), jnp.asarray(qd0), jnp.asarray(a))
        qpos_dev, qvel_dev = device_state_to_mjlike(env, q1, qd1, has_free)
        dv_true = d.qvel - qd0[: m.nv] if not has_free else None
        err_v = qvel_dev - d.qvel
        err_p = qpos_dev - d.qpos
        # reference scale: velocity change over the frame (what dynamics did)
        if dv_true is None:
            q0_mj, qd0_mj = device_state_to_mjlike(env, jnp.asarray(q0), jnp.asarray(qd0), has_free)
            dv_true = d.qvel - qd0_mj
        nv_err.append(np.linalg.norm(err_v))
        nv_mag.append(np.linalg.norm(dv_true))
        pos_err.append(np.linalg.norm(err_p))
        dof_err += err_v**2
        dof_mag += dv_true**2
        # episode bookkeeping: reset mujoco if unhealthy/episode end like gym
        unhealthy = not np.isfinite(d.qpos).all()
        if args.task == "Hopper":
            unhealthy |= d.qpos[1] < 0.7 or abs(d.qpos[2]) > 0.2 or (np.abs(np.concatenate([d.qpos[2:], d.qvel])) > 100).any()
        elif args.task == "Walker2d":
            unhealthy |= not (0.8 < d.qpos[1] < 2.0 and abs(d.qpos[2]) < 1.0)
        elif args.task == "Ant":
            unhealthy |= not (0.2 < d.qpos[2] < 1.0)
        elif args.task == "Humanoid":
            unhealthy |= not (1.0 < d.qpos[2] < 2.0)
        if unhealthy:
            mujoco.mj_resetData(m, d)
            d.qpos[:] = d.qpos + rng.uniform(-0.005, 0.005, m.nq)
            d.qvel[:] = rng.uniform(-0.005, 0.005, m.nv)

    nv_err, nv_mag = np.array(nv_err), np.array(nv_mag)
    rel = nv_err.sum() / max(nv_mag.sum(), 1e-12)
    print(f"task={args.task} steps={args.steps} frame_skip={env.frame_skip} "
          f"substeps={env.substeps or 'auto'}")
    print(f"qvel step error: mean |err| {nv_err.mean():.4f}  rel-to-|dv| {rel:.3f}")
    print(f"qpos step error: mean |err| {np.mean(pos_err):.5f}")
    print(f"mean active mujoco contacts/step: {np.mean(ncon_hist):.2f}")
    if args.per_dof:
        rel_dof = np.sqrt(dof_err) / np.maximum(np.sqrt(dof_mag), 1e-12)
        for i in range(m.nv):
            print(f"  dof {i:2d}: rms_err {np.sqrt(dof_err[i]/args.steps):8.4f} "
                  f"rel {rel_dof[i]:6.3f}")


if __name__ == "__main__":
    main()
