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

import os as _os

N = int(_os.environ.get("GKP_N", "131072"))  # 256 envs x 512 slots
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
    import os

    # trimmed defaults: remote-tunnel compiles are ~1 min each, so every
    # variant must earn its compile (the first run of this probe was
    # watchdog-killed mid-compile at the full 12-program sweep)
    batches = tuple(int(b) for b in os.environ.get("GKP_BATCHES", "4096").split(","))
    inflights = tuple(int(i) for i in os.environ.get("GKP_INFLIGHTS", "8,32,128").split(","))
    check = os.environ.get("GKP_BITCHECK", "0") == "1"

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 255, (N, F), np.uint8))

    if check:
        # bit-exactness (kernel vs XLA) — measured ok 2026-08-19 at
        # inflight 8 and 64 on the real chip; opt-in to save compiles
        idx = jnp.asarray(rng.integers(0, N, 512).astype(np.int32))
        for infl in (8, 64):
            np.testing.assert_array_equal(
                np.asarray(gather_rows(src, idx, inflight=infl)),
                np.asarray(src[idx]),
            )
        print("bit-exact ok", flush=True)

    results = {}
    for B in batches:
        def mk(fn):
            def f(key):
                i = jax.random.randint(key, (B,), 0, N)
                return fn(src, i)
            return f

        row = {}
        ms = timed(mk(lambda s, i: s[i]), iters=16)
        row["xla"] = round(ms, 3)
        print(json.dumps({B: row}), flush=True)
        for infl in inflights:
            ms = timed(mk(lambda s, i, _if=infl: gather_rows(s, i, inflight=_if)), iters=16)
            row[f"kernel_if{infl}"] = round(ms, 3)
            print(json.dumps({B: row}), flush=True)
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
