"""Fused Pallas physics step: on-chip parity + throughput probe.

Compares three compilations of the same math at benchmark batch sizes:

a. vmapped dynamics.step        (env-major, XLA kernels — the round-3 path)
b. batched.step_b under jit     (env-last, XLA kernels — layout only)
c. fused_step                   (env-last, ONE Pallas kernel per step)

and reports device-time per env-step for each, plus max |Δq| of (c) vs (a)
after an 8-step rollout (fp32 reassociation tolerance).

Run via the TPU job queue so it never contends with training jobs::

    python scripts/physics_fused_probe.py --task HalfCheetah --envs 2048
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timed_steps(step_fn, q, qd, ctrl, iters=16, reps=3):
    """Median wall time per call of a chained step (device-bound)."""
    import jax
    import numpy as np

    out = step_fn(q, qd, ctrl)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        s = (q, qd)
        for _ in range(iters):
            s = step_fn(s[0], s[1], ctrl)
        jax.block_until_ready(s)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="HalfCheetah")
    ap.add_argument("--envs", type=int, default=2048)
    ap.add_argument("--block-e", type=int, default=128)
    ap.add_argument("--skip-fused", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tianshou_tpu.env.mujoco import make
    from tianshou_tpu.env.physics import batched as B
    from tianshou_tpu.env.physics import dynamics
    from tianshou_tpu.ops.pallas.physics_fused import fused_step

    env = make(args.task)
    model = env.model
    fs = int(env.frame_skip)
    sub = getattr(env, "substeps", None)
    E = args.envs
    rng = np.random.default_rng(0)
    q = jnp.asarray(
        np.asarray(model.qpos0)[None] + 0.03 * rng.standard_normal((E, model.nq)),
        jnp.float32,
    )
    qd = jnp.asarray(0.05 * rng.standard_normal((E, model.nq)), jnp.float32)
    ctrl = jnp.asarray(
        rng.uniform(-1, 1, (E, len(model.actuators))), jnp.float32
    )
    qT, qdT, ctrlT = q.T, qd.T, ctrl.T

    res = {"task": args.task, "E": E, "frame_skip": fs,
           "backend": jax.default_backend()}

    # a. vmapped env-major
    step_a = jax.jit(
        jax.vmap(lambda q, qd, c: dynamics.step(model, q, qd, c, frame_skip=fs, substeps=sub))
    )
    t_a = timed_steps(step_a, q, qd, ctrl)
    res["vmap_xla_us_per_env_step"] = round(t_a / E * 1e6, 4)
    res["vmap_xla_steps_per_s"] = round(E / t_a, 1)

    # b. env-last under plain jit
    with jax.default_matmul_precision("float32"):
        step_b = jax.jit(
            lambda q, qd, c: B.step_b(model, q, qd, c, frame_skip=fs, substeps=sub)
        )
        t_b = timed_steps(step_b, qT, qdT, ctrlT)
    res["envlast_xla_us_per_env_step"] = round(t_b / E * 1e6, 4)
    res["envlast_xla_steps_per_s"] = round(E / t_b, 1)

    # c. fused Pallas
    if not args.skip_fused:
        try:
            step_c = lambda q, qd, c: fused_step(
                model, q, qd, c, frame_skip=fs, substeps=sub, block_e=args.block_e
            )
            t_c = timed_steps(step_c, qT, qdT, ctrlT)
            res["fused_pallas_us_per_env_step"] = round(t_c / E * 1e6, 4)
            res["fused_pallas_steps_per_s"] = round(E / t_c, 1)
            res["fused_speedup_vs_vmap"] = round(t_a / t_c, 2)

            # parity after an 8-step rollout
            sa, sc = (q, qd), (qT, qdT)
            for _ in range(8):
                sa = step_a(sa[0], sa[1], ctrl)
                sc = step_c(sc[0], sc[1], ctrlT)
            dq = float(jnp.max(jnp.abs(sc[0].T - sa[0])))
            dqd = float(jnp.max(jnp.abs(sc[1].T - sa[1])))
            res["parity_max_dq_8steps"] = dq
            res["parity_max_dqd_8steps"] = dqd
        except Exception as e:  # keep the XLA numbers even if Mosaic rejects
            res["fused_error"] = f"{type(e).__name__}: {str(e)[:2000]}"

    print(json.dumps(res))


if __name__ == "__main__":
    main()
