"""Device-physics cost breakdown for the north-star analysis (VERDICT r2
item 6): times each stage of the substep pipeline and the full vector step
at benchmark batch sizes, on whatever backend is active (TPU by default).

Per-stage timings use the same scan+scalar-readback discipline as bench.py
(honest on the remote-TPU backend where block_until_ready returns early).

Usage::

    python scripts/physics_profile.py --task HalfCheetah --envs 2048
    python scripts/physics_profile.py --cpu   # relative composition only
"""

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timed(fn, args, iters=32, reps=3):
    """Time `iters` sequential applications of fn inside one jit'd scan."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def run(x):
        def body(c, _):
            return fn(*c), None

        (out), _ = jax.lax.scan(lambda c, _: (fn(*c), None), x, None, length=iters)
        return out

    out = run(args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # sync
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
    nu = len(model.actuators)
    tau = 0.1 * jax.random.normal(key, (E, nu))

    dt = model.timestep
    print(f"task={args.task} nq={model.nq} E={E} backend={jax.default_backend()}")

    # stage kernels (keep shapes closed over; each returns (q, qd)-like state
    # so the scan carry stays constant)
    def mk(fn):
        # keep (q, qd) carry shape; perturb q by a tiny function of the
        # stage output so the scan cannot be folded away
        return lambda q, qd: (q + 0.0 * jnp.sum(fn(q)) * 1e-20, qd)

    mass_stage = mk(jax.vmap(lambda q_: dyn.mass_matrix(model, q_)))
    bias_stage = mk(jax.vmap(
        lambda q_: jax.grad(lambda x: dyn.kinetic_energy(model, x, qd0)
                            - dyn.potential_energy(model, x))(q_)))

    t_m = timed(mass_stage, (q, qd), args.iters)
    t_b = timed(bias_stage, (q, qd), args.iters)

    act = jax.vmap(lambda c: dyn.actuation(model, c))(tau)

    def substep(q, qd):
        return jax.vmap(lambda a, b: dyn._substep(model, a, b, act[0], dt))(q, qd)

    t_s = timed(substep, (q, qd), args.iters)

    def full_step(q, qd):
        return jax.vmap(lambda a, b: dyn.step(model, a, b, act[0],
                                              frame_skip=env.frame_skip))(q, qd)

    t_f = timed(full_step, (q, qd), max(4, args.iters // 8))

    sub_per_step = env.frame_skip * (env.substeps or (
        1 if getattr(model, "integrator", "euler") == "euler"
        else max(1, int(-(-model.timestep // 0.002)))))
    print(f"mass_matrix (vmapped)     : {t_m*1e3:8.3f} ms  ({t_m/E*1e9:7.1f} ns/env)")
    print(f"bias grad (dLdq)          : {t_b*1e3:8.3f} ms")
    print(f"one substep (all stages)  : {t_s*1e3:8.3f} ms")
    print(f"full env step (fs={env.frame_skip}, {sub_per_step} substeps): {t_f*1e3:8.3f} ms")
    print(f"=> bare-physics env-steps/s at E={E}: {E/t_f:,.0f}")

    # env-count scaling sweep: if the substep chain is latency-bound (many
    # tiny batched ops) rather than FLOP-bound, throughput keeps rising with
    # E until the vector units saturate — the honest way to size the
    # north-star projection (docs/03_benchmarks.md)
    print("\nE-sweep (full env step):")
    for Es in (1024, 4096, 16384, 65536):
        if Es == E:
            t = t_f
        else:
            ks = jax.random.key(Es)
            qs = jnp.tile(q0[None], (Es, 1)) + 0.01 * jax.random.normal(ks, (Es, model.nq))
            qds = 0.1 * jax.random.normal(ks, (Es, model.nq))
            try:
                t = timed(full_step, (qs, qds), max(2, args.iters // 16))
            except Exception as e:  # OOM at the top end is informative, not fatal
                print(f"  E={Es:6d}: failed ({type(e).__name__})")
                continue
        print(f"  E={Es:6d}: {t*1e3:8.3f} ms/step  {Es/t:12,.0f} env-steps/s  "
              f"{t/Es*1e9:7.1f} ns/env-step")


if __name__ == "__main__":
    main()
