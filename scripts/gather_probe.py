"""On-chip probe: replay-gather variants for the Atari sample path.

Times (one v5e chip, dependent-scan amortized):
  a) 4 sequential [B]-row gathers from an [N, 84*84] uint8 ring (the
     current _stacked shape) — per-frame prev-chain gathers
  b) ONE [4B]-row gather (indices precomputed) — same bytes, 1 kernel
  c) variant (b) on a 128-aligned padded ring [N, 7168]
  d) variant (b) gathered as [N, 84, 84] 3-D rows (current actual layout)

Decides the round-5 sampling-path restructure (VERDICT #1).
Run:  python scripts/gather_probe.py [B ...]
"""

import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

import jax
import jax.numpy as jnp
import numpy as np

N = 131072  # 256 envs x 512 slots


def timed(fn, args, iters=64):
    @jax.jit
    def run(key):
        def body(c, k):
            return c + fn(k).astype(jnp.int32).sum(), None

        out, _ = jax.lax.scan(body, jnp.int32(0), jax.random.split(key, iters))
        return out

    out = run(jax.random.key(0))
    jax.block_until_ready(out)
    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(run(jax.random.key(i)))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    batches = tuple(int(b) for b in sys.argv[1:]) or (1024, 4096)
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.integers(0, 255, (N, 7056), np.uint8))
    padded = jnp.asarray(rng.integers(0, 255, (N, 7168), np.uint8))
    img3d = flat.reshape(N, 84, 84)

    for B in batches:
        print(f"--- B={B}")

        def idx4(key):
            i = jax.random.randint(key, (B,), 3, N)
            return jnp.concatenate([i - 3, i - 2, i - 1, i])

        def seq4_flat(key):
            i = jax.random.randint(key, (B,), 3, N)
            fs = [flat[i - k] for k in range(3, -1, -1)]
            return jnp.stack(fs, 1)

        def one_flat(key):
            return flat[idx4(key)]

        def one_padded(key):
            return padded[idx4(key)]

        def one_3d(key):
            return img3d[idx4(key)]

        def seq4_3d(key):
            i = jax.random.randint(key, (B,), 3, N)
            fs = [img3d[i - k] for k in range(3, -1, -1)]
            return jnp.stack(fs, 1)

        for name, fn in [
            ("seq4_flat  (4x[B] gathers, 7056B rows)", seq4_flat),
            ("one_flat   (1x[4B] gather, 7056B rows)", one_flat),
            ("one_padded (1x[4B] gather, 7168B rows)", one_padded),
            ("seq4_3d    (4x[B] gathers, [84,84] rows)", seq4_3d),
            ("one_3d     (1x[4B] gather, [84,84] rows)", one_3d),
        ]:
            ms = timed(fn, (), iters=32)
            gbs = 4 * B * 7056 / (ms / 1e3) / 1e9
            print(f"  {name}: {ms:7.3f} ms  ({gbs:6.1f} GB/s)")


if __name__ == "__main__":
    main()
