"""On-chip MFU decomposition probe for the Atari DQN update path.

The round-3 burst benchmark (bench.py:bench_atari_update_burst) measures
16.7 TFLOP/s (8.5% of v5e bf16 peak) for the FULL update (replay sample +
4-frame restack + n-step targets + bf16 NatureCNN fwd/bwd + Adam) at
batch=1024. This probe answers WHERE the other 91.5% goes, by timing each
stage in isolation across batch sizes:

  raw_cnn      pure NatureCNN fwd+bwd on resident bf16 input — the XLA conv
               ceiling for these layer shapes, free of any framework code
  update_step  gradient step on a PRE-BUILT batch (fwd + target fwd + bwd +
               Adam) — model work plus loss plumbing, no replay
  sample_pre   buffer.sample + n-step preprocess (gather, restack, target-Q)
  full_update  the real algo.update (sample -> preprocess -> step -> post)

Run via the seed queue (cmd job) so it serializes with training jobs:
    {"name": "mfu_probe", "cmd": ["scripts/mfu_probe.py"], "timeout": 1800}
"""

import json
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

import jax
import jax.numpy as jnp
import numpy as np

FWD_FLOPS_PER_FRAME = 18.7e6  # NatureCNN fwd, 84x84x4 input (bench.py)
V5E_BF16_PEAK_TFLOPS = 197.0


def timed(fn, carry, key, iters=32):
    """Time `iters` dependent applications of fn inside one jitted scan."""

    @jax.jit
    def run(carry, key):
        def body(c, k):
            return fn(c, k), None

        out, _ = jax.lax.scan(body, carry, jax.random.split(key, iters))
        return out

    out = run(carry, key)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(3):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        out = run(carry, k)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3  # ms per application


def main() -> None:
    sys.path.insert(0, str(_REPO))
    import bench

    import os

    E = int(os.environ.get("MFU_PROBE_E", "256"))
    iters = int(os.environ.get("MFU_PROBE_ITERS", "16"))
    prefill_steps = int(os.environ.get("MFU_PROBE_PREFILL", "64"))
    algo, buffer, coll, ts, buf_state, cstate, key = bench._build_atari_pipeline(E)

    # prefill ring (same as bench burst)
    @jax.jit
    def prefill(carry, key):
        def c_body(c, k):
            return coll._step_fn(ts, c, k, training=True, store=True, keep_rollout=False)

        (cs, bs), _ = jax.lax.scan(c_body, carry, jax.random.split(key, prefill_steps))
        return cs, bs

    key, kf = jax.random.split(key)
    cstate, buf_state = prefill((cstate, buf_state), kf)

    batches = tuple(int(b) for b in sys.argv[1:]) or (512, 1024, 2048, 4096)
    results = {}
    for B in batches:
        row = {}

        # --- raw CNN fwd+bwd on resident bf16 input -----------------------
        from tianshou_tpu.models.atari import DQNet

        net = DQNet(action_dim=6)
        x = jax.random.uniform(jax.random.key(1), (B, 4, 84, 84, 1), jnp.float32)
        x = (x * 255).astype(jnp.uint8)
        params = net.init(jax.random.key(2), x[:1])

        def raw_fwdbwd(carry, k):
            p, x_ = carry

            def loss(p):
                return net.apply(p, x_).sum()

            g = jax.grad(loss)(p)
            # fold the grads in so the scan has a data dependence
            return jax.tree.map(lambda a, b: a + 1e-12 * b, p, g), x_

        ms = timed(raw_fwdbwd, (params, x), key, iters=iters)
        row["raw_cnn_fwdbwd_ms"] = round(ms, 3)
        # fwd + ~2x fwd for bwd
        row["raw_cnn_tflops"] = round(B * FWD_FLOPS_PER_FRAME * 3 / (ms / 1e3) / 1e12, 2)

        # --- update_step on a pre-built batch -----------------------------
        k1, k2, key = jax.random.split(key, 3)
        batch, indices = buffer.sample(buf_state, k1, B)
        batch = algo.preprocess(ts, buffer, buf_state, batch, indices, k2)
        batch = jax.tree.map(lambda a: a, batch)  # materialize

        def step_only(carry, k):
            ts_, b_ = carry
            ts_, _ = algo.update_step(ts_, b_, k)
            return ts_, b_

        ms = timed(step_only, (ts, batch), key, iters=iters)
        row["update_step_ms"] = round(ms, 3)
        # DQN's target forward runs in preprocess (batch.returns arrives
        # precomputed), so update_step is exactly fwd + bwd = 3F
        row["update_step_tflops"] = round(B * FWD_FLOPS_PER_FRAME * 3 / (ms / 1e3) / 1e12, 2)

        # --- sample + preprocess ------------------------------------------
        # the ring state must ride the carry: closing over it would bake
        # ~1 GB of buffer into the program constants (HTTP 413 on the
        # remote-compile tunnel)
        def sample_pre(carry, k):
            acc, bs_ = carry
            k1, k2 = jax.random.split(k)
            b, idx = buffer.sample(bs_, k1, B)
            b = algo.preprocess(ts, buffer, bs_, b, idx, k2)
            return acc + b.returns.sum() * 1e-12, bs_

        ms = timed(sample_pre, (jnp.float32(0), buf_state), key, iters=iters)
        row["sample_preprocess_ms"] = round(ms, 3)

        # --- full update ---------------------------------------------------
        def full(carry, k):
            ts_, bs_ = carry
            ts_, bs_, _ = algo.update(ts_, buffer, bs_, k, B)
            return ts_, bs_

        ms = timed(full, (ts, buf_state), key, iters=iters)
        row["full_update_ms"] = round(ms, 3)
        row["full_update_tflops"] = round(B * FWD_FLOPS_PER_FRAME * 4 / (ms / 1e3) / 1e12, 2)
        row["full_update_mfu_pct"] = round(
            row["full_update_tflops"] / V5E_BF16_PEAK_TFLOPS * 100, 1
        )

        results[str(B)] = row
        print(json.dumps({B: row}), flush=True)

    out = _REPO / "examples/benchmark/results/mfu_probe.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
