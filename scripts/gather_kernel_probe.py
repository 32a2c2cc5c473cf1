"""On-chip probe: Pallas DMA row-gather vs XLA gather, inflight sweep.

The burst_batch_sweep showed the DQN pixel update is bound at ~4.5 µs per
sample across every batch size — a per-row floor in the replay gathers
(~0.2 µs/row for 7 KB rows, ~20 GB/s effective vs 819 GB/s HBM). The
round-4 kernel lost to XLA at ``inflight=8`` concurrent row DMAs
(ops/pallas/gather.py docstring). This sweeps the in-flight ring depth:
if the floor is DMA-latency-bound, deeper pipelining should push the
per-row cost toward the issue rate.

Run via the seed queue (cmd job): serializes with training jobs.
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

from tianshou_tpu.ops.pallas.gather import gather_rows

N = 131072  # 256 envs x 512 slots
F = 7168  # 84*84 padded to 128-multiple


def timed(fn, iters=32):
    @jax.jit
    def run(key):
        def body(c, k):
            return c + fn(k).astype(jnp.int32).sum(), None

        out, _ = jax.lax.scan(body, jnp.int32(0), jax.random.split(key, iters))
        return out

    jax.block_until_ready(run(jax.random.key(0)))
    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        r = run(jax.random.key(i))
        float(np.asarray(r))  # real readback: block_until_ready lies on axon
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main() -> None:
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 255, (N, F), np.uint8))

    # bit-exactness first (kernel vs XLA), at a deep inflight
    idx = jnp.asarray(rng.integers(0, N, 512).astype(np.int32))
    for infl in (8, 64):
        np.testing.assert_array_equal(
            np.asarray(gather_rows(src, idx, inflight=infl)),
            np.asarray(src[idx]),
        )
    print("bit-exact ok", flush=True)

    results = {}
    for B in (4096, 16384):
        def mk(fn):
            def f(key):
                i = jax.random.randint(key, (B,), 0, N)
                return fn(src, i)
            return f

        row = {}
        ms = timed(mk(lambda s, i: s[i]))
        row["xla"] = round(ms, 3)
        for infl in (8, 16, 32, 64, 128):
            ms = timed(mk(lambda s, i, _if=infl: gather_rows(s, i, inflight=_if)))
            row[f"kernel_if{infl}"] = round(ms, 3)
        # GB/s for the best variant
        best = min(row.values())
        row["best_gbs"] = round(B * F / (best / 1e3) / 1e9, 1)
        row["best_us_per_row"] = round(best * 1e3 / B, 3)
        results[str(B)] = row
        print(json.dumps({B: row}), flush=True)

    out = _REPO / "examples/benchmark/results/gather_kernel_probe.json"
    out.write_text(json.dumps(results, indent=1))
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
