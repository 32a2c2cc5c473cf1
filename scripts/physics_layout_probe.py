"""Layout probe: is the device-physics substep slow because XLA pads the
tiny structural dims (3, nq<=23) onto the TPU's 128-lane minor axis?

Times the same `_substep` vmapped two ways at identical batch sizes:

- batch-major (status quo): state [E, nq]; vmap in_axes=0 — every
  intermediate carries E in the MAJOR dims and a tiny structural dim
  (3 / nq / 3x3) minor-most, which XLA pads to the (8, 128) tile.
- batch-minor: state [nq, E]; vmap in_axes=-1/out_axes=-1 — E rides the
  128-lane axis at full utilization, structural dims sit in sublanes.

If the hypothesis is right the -1 variant is several times faster and the
physics throughput ceiling moves accordingly (docs/03_benchmarks.md
north-star analysis).

Usage::

    python scripts/physics_layout_probe.py --task HalfCheetah --envs 2048
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timed(fn, args, iters=32, reps=3):
    import jax
    import numpy as np

    @jax.jit
    def run(x):
        def body(c, _):
            return fn(*c), None

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
    tau = jnp.zeros(model.nq)
    dt = model.timestep
    print(f"task={args.task} nq={model.nq} E={E} backend={jax.default_backend()}")

    sub = lambda a, b: dyn._substep(model, a, b, tau, dt)

    # batch-major (status quo)
    f_major = jax.vmap(sub, in_axes=(0, 0), out_axes=(0, 0))
    t_major = timed(lambda a, b: f_major(a, b), (q, qd), args.iters)
    print(f"batch-major [E, nq]  : {t_major*1e3:8.3f} ms/substep  "
          f"({E/t_major:12,.0f} env-substeps/s)")

    # batch-minor: E trailing
    qT, qdT = q.T, qd.T  # [nq, E]
    f_minor = jax.vmap(sub, in_axes=(-1, -1), out_axes=(-1, -1))
    t_minor = timed(lambda a, b: f_minor(a, b), (qT, qdT), args.iters)
    print(f"batch-minor [nq, E]  : {t_minor*1e3:8.3f} ms/substep  "
          f"({E/t_minor:12,.0f} env-substeps/s)   {t_major/t_minor:.2f}x")

    # full env step both ways (what the collector would see)
    step = lambda a, b: dyn.step(model, a, b, tau, frame_skip=env.frame_skip,
                                 substeps=env.substeps)
    g_major = jax.vmap(step, in_axes=(0, 0), out_axes=(0, 0))
    t_gmaj = timed(lambda a, b: g_major(a, b), (q, qd), max(4, args.iters // 8))
    g_minor = jax.vmap(step, in_axes=(-1, -1), out_axes=(-1, -1))
    t_gmin = timed(lambda a, b: g_minor(a, b), (qT, qdT), max(4, args.iters // 8))
    print(f"full step batch-major: {t_gmaj*1e3:8.3f} ms  ({E/t_gmaj:12,.0f} env-steps/s)")
    print(f"full step batch-minor: {t_gmin*1e3:8.3f} ms  ({E/t_gmin:12,.0f} env-steps/s)   "
          f"{t_gmaj/t_gmin:.2f}x")

    # numerical agreement
    import numpy as np

    a0, b0 = f_major(q, qd)
    a1, b1 = f_minor(qT, qdT)
    err = float(jnp.max(jnp.abs(a0 - a1.T)))
    print(f"max |q' diff| major vs minor: {err:.3e}")


if __name__ == "__main__":
    main()
