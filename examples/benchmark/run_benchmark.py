"""Benchmark-suite orchestration (reference benchmark/run_benchmark.py).

The reference farms its example scripts out to tmux sessions with a
concurrency cap and polls for completion. Same shape here with plain
subprocesses: a run matrix of (script, task, seed) cells, a concurrency
cap (default 1 — a single TPU chip serializes anyway; raise it for CPU or
multi-chip hosts), per-run logs, and a JSON summary of best rewards.

    python examples/benchmark/run_benchmark.py --suite mujoco --seeds 0 1 2
    python examples/benchmark/run_benchmark.py --suite mujoco --tasks Hopper Walker2d --epochs 5
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]

SUITES = {
    "mujoco": {
        "scripts": ["examples/mujoco/mujoco_sac.py", "examples/mujoco/mujoco_td3.py",
                    "examples/mujoco/mujoco_ppo.py"],
        "tasks": ["HalfCheetah", "Hopper", "Walker2d", "Ant"],
    },
    "classic": {
        "scripts": ["examples/discrete/dqn_cartpole.py"],
        "tasks": [None],
    },
}

_BEST = re.compile(r"best_reward=([-\d.]+)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", choices=sorted(SUITES), default="mujoco")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0])
    ap.add_argument("--tasks", nargs="+", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--max-concurrent", type=int, default=1)
    ap.add_argument("--log-dir", default="log/benchmark")
    args = ap.parse_args()

    suite = SUITES[args.suite]
    tasks = args.tasks or suite["tasks"]
    log_dir = Path(args.log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)

    cells = [
        (script, task, seed)
        for script in suite["scripts"]
        for task in tasks
        for seed in args.seeds
    ]
    print(f"{len(cells)} runs, max {args.max_concurrent} concurrent")

    running: list[tuple[subprocess.Popen, Path, str]] = []
    results: dict[str, float | None] = {}

    def drain(block: bool) -> None:
        while running and (block or len(running) >= args.max_concurrent):
            for item in list(running):
                proc, log, name = item
                if proc.poll() is None:
                    continue
                running.remove(item)
                text = log.read_text()
                m = _BEST.findall(text)
                results[name] = float(m[-1]) if m else None
                status = "ok" if proc.returncode == 0 else f"rc={proc.returncode}"
                print(f"  done {name}: best={results[name]} ({status})")
            if running and (block or len(running) >= args.max_concurrent):
                time.sleep(5)

    for script, task, seed in cells:
        drain(block=False)
        name = f"{Path(script).stem}" + (f"_{task}" if task else "") + f"_s{seed}"
        log = log_dir / f"{name}.log"
        cmd = [sys.executable, str(ROOT / script), "--seed", str(seed)]
        if task:
            cmd += ["--task", task]
        if args.epochs:
            cmd += ["--epochs", str(args.epochs)]
        print(f"  launch {name}")
        with open(log, "w") as f:
            proc = subprocess.Popen(cmd, stdout=f, stderr=subprocess.STDOUT, cwd=ROOT)
        running.append((proc, log, name))

    drain(block=True)
    summary = log_dir / "summary.json"
    summary.write_text(json.dumps(results, indent=2))
    print(f"summary -> {summary}")


if __name__ == "__main__":
    main()
