"""Stage-level microprobe for the device-physics substep cost on TPU.

The layout probe (physics_layout_probe.py) refuted batch-axis layout as the
cause of the ~1% VPU utilization; the E-sweep's linear scaling says the cost
is per-element work, not dispatch. Remaining suspects, each timed here at
benchmark batch size:

a. forward kinematics alone (the op-chain baseline)
b. jacfwd(FK)          — the mass-matrix Jacobian pass
c. grad of kinetic energy (reverse-mode through FK jvp)
d. external forces (fluid-only vjp path)
e. constraint contact solve (incl. A = J M^-1 J^T and APGD)
f. batched cho_factor + cho_solve of M (the integrator solve)
g. pure fused elementwise chain of comparable FLOPs (backend calibration)
h. the full substep under DEFAULT matmul precision (bf16 multiplicands)
   vs the fp32 pin — how much the 6-pass fp32 MXU emulation costs
i. the mass-matrix einsum assembly vs an explicit mul+reduce rewrite

Usage::

    python scripts/physics_stage_probe.py --task HalfCheetah --envs 2048
"""

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timed(fn, args, iters=32, reps=3):
    import jax
    import numpy as np

    @jax.jit
    def run(x):
        def body(c, _):
            out = fn(*c)
            # fold the stage output back into the carry so the scan can't be
            # elided; keep carry shape = input shape
            leaf = jax.tree.leaves(out)[0]
            bump = (leaf.ravel()[0] * 1e-20).astype(x[0].dtype)
            return (x[0] + bump, *x[1:]), None

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    out = run(args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(args)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="HalfCheetah")
    p.add_argument("--envs", type=int, default=2048)
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tianshou_tpu.env import mujoco as dm
    from tianshou_tpu.env.physics import dynamics as dyn

    env = getattr(dm, args.task)()
    model = env.model
    E = args.envs
    key = jax.random.key(0)
    q0, qd0 = dyn.init_state(model)
    q = jnp.tile(q0[None], (E, 1)) + 0.01 * jax.random.normal(key, (E, model.nq))
    qd = 0.1 * jax.random.normal(key, (E, model.nq))
    tau0 = jnp.zeros(model.nq)
    dt = model.timestep
    print(f"task={args.task} nq={model.nq} E={E} backend={jax.default_backend()}")

    def report(name, t, per_env_flops=None):
        line = f"{name:42s}: {t*1e3:8.3f} ms"
        if per_env_flops:
            line += f"  ({per_env_flops * E / t / 1e9:8.1f} GFLOP/s)"
        print(line, flush=True)

    V = lambda f: jax.vmap(f)
    P = partial(jax.default_matmul_precision, "float32")

    # a. FK alone
    with P():
        t = timed(lambda q, qd: (V(lambda q_: dyn._fk_com(model, q_))(q)[0], qd), (q, qd), args.iters)
    report("a. FK (pos+rot)", t)

    # b. jacfwd(FK)
    with P():
        t = timed(lambda q, qd: (V(lambda q_: jax.jacfwd(lambda x: dyn._fk_com(model, x))(q_)[0])(q)[..., 0], qd),
                  (q, qd), args.iters)
    report("b. jacfwd(FK)", t)

    # c. grad kinetic
    with P():
        t = timed(lambda q, qd: (V(lambda a, b: jax.grad(lambda x: dyn.kinetic_energy(model, x, b))(a))(q, qd), qd),
                  (q, qd), args.iters)
    report("c. grad_q kinetic energy", t)

    # d. external forces (fluid path; contacts included as in penalty mode)
    with P():
        t = timed(lambda q, qd: (V(lambda a, b: dyn._external_forces(model, a, b, include_contacts=True))(q, qd), qd),
                  (q, qd), args.iters)
    report("d. external forces (vjp)", t)

    # e. constraint solver (full path incl. its own chol of M)
    def _constraint(a, b):
        M, pcom, R, dp, dR = dyn.mass_matrix_fk(model, a)
        f0 = jnp.zeros(model.nq, a.dtype)
        return dyn._contact_forces_constraint(model, a, b, f0, M, fk=(pcom, R, dp, dR))

    with P():
        t = timed(lambda q, qd: (V(_constraint)(q, qd), qd), (q, qd), args.iters)
    report("e. constraint contact solve (+M build)", t)

    # f. batched cholesky factor+solve of M
    def _chol(a, b):
        M = dyn.mass_matrix(model, a)
        ch = jax.scipy.linalg.cho_factor(M)
        return jax.scipy.linalg.cho_solve(ch, b)

    with P():
        t = timed(lambda q, qd: (V(_chol)(q, qd), qd), (q, qd), args.iters)
    report("f. mass build + cho_factor/solve", t)

    # f2. cholesky alone on a fixed SPD matrix
    Mfix = V(lambda q_: dyn.mass_matrix(model, q_))(q)

    def _chol_only(Mb, b):
        ch = jax.scipy.linalg.cho_factor(Mb)
        return jax.scipy.linalg.cho_solve(ch, b)

    t = timed(lambda Mb, b: (jax.vmap(_chol_only)(Mb, b), b), (Mfix, qd), args.iters)
    report("f2. cho_factor/solve alone [E,nq,nq]", t)

    # g. calibration: fused elementwise chain, ~1 MFLOP/env
    x0 = jax.random.normal(key, (E, 256))

    def _elem(x, y):
        z = x
        for _ in range(100):  # ~100 * 2 * 256 flops/env/iter elementwise
            z = z * 1.0001 + 0.3 * y
        return z

    t = timed(lambda x, y: (_elem(x, y), y), (x0, x0), args.iters)
    report("g. fused elementwise ~51k flop/env", t, per_env_flops=51_200)

    # h. substep: fp32 pin vs default bf16 matmuls
    with P():
        t32 = timed(lambda q, qd: V(lambda a, b: dyn._substep(model, a, b, tau0, dt))(q, qd), (q, qd), args.iters)
    report("h. substep (fp32-pinned matmuls)", t32)
    tbf = timed(lambda q, qd: V(lambda a, b: dyn._substep(model, a, b, tau0, dt))(q, qd), (q, qd), args.iters)
    report("h. substep (DEFAULT bf16 matmuls)", tbf)
    print(f"   -> fp32 pin costs {t32/tbf:.2f}x")

    # i. mass-matrix: einsum assembly vs explicit mul+reduce
    def mass_einsum(q_):
        return dyn.mass_matrix(model, q_)

    def mass_manual(q_):
        pcom, R = dyn._fk_com(model, q_)
        dp, dR = jax.jacfwd(lambda x: dyn._fk_com(model, x))(q_)
        W = (dR[:, :, None, :, :] * R[:, None, :, :, None]).sum(3)  # bijn,bkj->bikn
        Jw = 0.5 * jnp.stack([W[:, 2, 1] - W[:, 1, 2], W[:, 0, 2] - W[:, 2, 0], W[:, 1, 0] - W[:, 0, 1]], axis=1)
        mass = jnp.asarray(model.body_mass)
        I_world = (R[:, :, :, None] * jnp.asarray(model.body_inertia)[:, None, :, :]).sum(2)
        I_world = (I_world[:, :, None, :] * R[:, None, :, :]).sum(3)
        M = (mass[:, None, None, None] * dp[:, :, :, None] * dp[:, :, None, :]).sum((0, 1))
        IJw = (I_world[:, :, :, None] * Jw[:, None, :, :]).sum(2)
        M = M + (Jw[:, :, :, None] * IJw[:, :, None, :]).sum((0, 1))
        return M + jnp.diag(jnp.asarray(dyn._armature(model)))

    with P():
        t_e = timed(lambda q, qd: (V(mass_einsum)(q), qd), (q, qd), args.iters)
    report("i. mass matrix via einsum (status quo)", t_e)
    t_m = timed(lambda q, qd: (V(mass_manual)(q), qd), (q, qd), args.iters)
    report("i. mass matrix via mul+reduce", t_m)
    import numpy as np

    err = float(jnp.max(jnp.abs(V(mass_einsum)(q) - V(mass_manual)(q))))
    print(f"   -> einsum/manual speedup {t_e/t_m:.2f}x, max diff {err:.2e}")


if __name__ == "__main__":
    main()
