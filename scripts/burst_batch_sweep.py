"""Measure the DQN update-burst MFU across batch sizes (post gather-restructure).

Round-4's probe showed the pixel-update was gather/dispatch-bound at
batch=1024 (8.4% MFU); the round-5 sample-path restructure collapsed the
frame-stack/n-step gathers to two kernels. This sweep re-measures the
burst at 1024/2048/4096 to pick the MXU-saturating batch for
``bench.bench_atari_update_burst`` (the BENCH atari_update_burst row).

Run via the seed queue (cmd job) so it serializes with training jobs.
"""

import json
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

import bench  # noqa: E402

results = {}
for B in (1024, 2048, 4096):
    r = bench.bench_atari_update_burst(batch=B, n_updates=24, iters=2)
    results[str(B)] = r
    print(json.dumps({B: r}), flush=True)

out = _REPO / "examples/benchmark/results/burst_batch_sweep.json"
out.write_text(json.dumps(results, indent=1))
print("wrote", out, flush=True)
