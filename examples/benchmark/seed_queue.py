"""Sequential seed-run queue for the single-chip benchmark protocol.

The reference's table protocol is multi-seed (max test return per trial,
aggregated across trials — /root/reference/examples/mujoco/README.md:444).
This runner drains job files from a queue directory one at a time (device
runs serialize through the one TPU chip anyway), so long multi-seed
sweeps can run unattended while jobs can be enqueued mid-flight.

Job file format (JSON, one job per file, processed in sorted order)::

    {"name": "td3_HalfCheetah",
     "script": "examples/mujoco/mujoco_td3.py",
     "kwargs": {"task": "HalfCheetah", "epochs": 50, "epoch_num_steps": 20000},
     "seeds": [1, 2]}

Each seed calls the script's ``train(seed=s, **kwargs)`` in-process (jit
cache shared across seeds of the same config) and appends one line to the
results JSONL.  Completed job files move to ``<queue>/done/``; failed ones
to ``<queue>/failed/`` with the traceback alongside.

Usage::

    python examples/benchmark/seed_queue.py \
        --queue examples/benchmark/queue \
        --results examples/benchmark/results/seed_runs.jsonl \
        --idle-timeout 900
"""

import argparse
import importlib.util
import json
import sys
import time
import traceback
from pathlib import Path

_REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(_REPO))


def _load_train(script: str):
    path = _REPO / script
    spec = importlib.util.spec_from_file_location(path.stem + "_queued", path)
    mod = importlib.util.module_from_spec(spec)
    # example scripts import their siblings (e.g. _runner) by bare name
    sys.path.insert(0, str(path.parent))
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(str(path.parent))
    return mod.train


def _commit_results(results_path: Path, name: str) -> None:
    """Commit the results JSONL after every job — raw rows must never exist
    only on an ephemeral VM (a round-2 session lost a generation of rows to
    a VM reset between runs and the next commit)."""
    import subprocess

    try:
        rel = results_path.relative_to(_REPO)
        subprocess.run(["git", "add", str(rel)], cwd=_REPO, check=True)
        # pathspec limits the commit to the results file — an unattended
        # runner must never sweep up unrelated staged work
        r = subprocess.run(
            ["git", "commit", "-m", f"Record seed-run rows: {name}", "--", str(rel)],
            cwd=_REPO, capture_output=True, text=True,
        )
        if r.returncode == 0:
            print(f"[seed_queue] committed results for {name}", flush=True)
        elif "nothing to commit" not in r.stdout + r.stderr:
            print(f"[seed_queue] WARNING: results commit for {name} failed "
                  f"(rc={r.returncode}): {r.stderr.strip() or r.stdout.strip()}",
                  flush=True)
    except Exception as e:  # never let bookkeeping kill a run
        print(f"[seed_queue] results commit failed: {e}", flush=True)


def _run_job(job: dict, results_path: Path) -> None:
    if "cmd" in job:
        # arbitrary script job (benchmarks, profilers): run as a subprocess
        # so its backend/jit state can't leak into queued training jobs;
        # stdout/stderr land next to the results file
        import subprocess

        log = results_path.parent / (job["name"] + ".log")
        with log.open("w") as f:
            subprocess.run(
                [sys.executable, *job["cmd"]], cwd=_REPO, stdout=f,
                stderr=subprocess.STDOUT, check=True,
                timeout=job.get("timeout", 7200),
            )
        print(f"[seed_queue] cmd job {job['name']} done -> {log}", flush=True)
        return
    if "vmap" in job:
        # seed-vmapped multi-seed run (see seed_vmap.py): all seeds train
        # simultaneously in one XLA program
        sys.path.insert(0, str(_REPO / "examples/benchmark"))
        from seed_vmap import run_multiseed

        spec = dict(job["vmap"])
        results = run_multiseed(
            spec.pop("algo"), spec.pop("task"), spec.pop("seeds"), **spec
        )
        for r in results:
            row = {"name": job["name"], **{k: v for k, v in r.items() if k != "curve"},
                   "curve": r["curve"], "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S")}
            with results_path.open("a") as f:
                f.write(json.dumps(row) + "\n")
            print(f"[seed_queue] {job['name']} seed={r['seed']}: best={r['best_reward']:.1f}",
                  flush=True)
            # commit per seed: a crash/watchdog mid-job must not lose rows
            _commit_results(results_path, f"{job['name']} seed={r['seed']}")
        return
    train = _load_train(job["script"])
    kwargs = dict(job.get("kwargs", {}))
    import inspect

    takes_logger = "logger" in inspect.signature(train).parameters
    for seed in job["seeds"]:
        # capture the test-return learning curve so rows feed the rliable
        # IQM/CI curve plots (aggregate_seed_runs.py --plots), like the
        # vmap jobs already do
        logger = None
        if takes_logger:
            from tianshou_tpu.utils.logger.base import CurveLogger

            logger = CurveLogger()
        t0 = time.time()
        result = train(seed=seed, **({"logger": logger} if logger else {}), **kwargs)
        dt = time.time() - t0
        row = {
            "name": job["name"],
            "seed": seed,
            "best_reward": float(result.best_reward),
            "env_step": int(result.env_step),
            "steps_per_s": round(int(result.env_step) / max(dt, 1e-9), 1),
            "wall_s": round(dt, 1),
            "kwargs": kwargs,
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        if logger is not None and logger.curve:
            row["curve"] = logger.curve
        with results_path.open("a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"[seed_queue] {job['name']} seed={seed}: "
              f"best={row['best_reward']:.1f} ({row['steps_per_s']:,.0f} steps/s)",
              flush=True)
        # commit per seed: a crash/watchdog mid-job must not lose rows
        _commit_results(results_path, f"{job['name']} seed={seed}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--queue", default="examples/benchmark/queue")
    p.add_argument("--results", default="examples/benchmark/results/seed_runs.jsonl")
    p.add_argument("--idle-timeout", type=float, default=900.0,
                   help="exit after the queue has been empty this long (s)")
    p.add_argument("--poll", type=float, default=15.0)
    p.add_argument("--run-one", default=None,
                   help="(internal) execute this one job file and exit")
    args = p.parse_args()

    if args.run_one:
        jobfile = Path(args.run_one)
        _run_job(json.loads(jobfile.read_text()), _REPO / args.results)
        return

    qdir = _REPO / args.queue
    done = qdir / "done"
    failed = qdir / "failed"
    running = qdir / "running"
    for d in (qdir, done, failed, running):
        d.mkdir(parents=True, exist_ok=True)
    results_path = _REPO / args.results
    results_path.parent.mkdir(parents=True, exist_ok=True)

    # recover jobs orphaned in running/ by a dead runner (VM reset mid-job)
    for f in sorted(running.glob("*.json")):
        print(f"[seed_queue] recovering orphaned {f.name}", flush=True)
        f.rename(qdir / f.name)

    idle_since = time.time()
    while True:
        pending = sorted(f for f in qdir.glob("*.json"))
        if not pending:
            if time.time() - idle_since > args.idle_timeout:
                print("[seed_queue] queue idle, exiting", flush=True)
                return
            time.sleep(args.poll)
            continue
        idle_since = time.time()
        # claim BEFORE executing: the rename is atomic, so two concurrent
        # runners (seen in the wild: a boot-restarted runner plus a fresh
        # one) can never double-run hours of chip work
        try:
            jobfile = running / pending[0].name
            pending[0].rename(jobfile)
        except FileNotFoundError:
            continue  # another runner claimed it between glob and rename
        try:
            job = json.loads(jobfile.read_text())
            seeds = job.get("seeds") or job.get("vmap", {}).get("seeds")
            print(f"[seed_queue] start {jobfile.name}: {job['name']} seeds={seeds}",
                  flush=True)
            # each job runs in a fresh subprocess so edits to the framework
            # land on the next job without restarting the queue runner (and
            # one job's jit/backend state can't leak into the next). The
            # watchdog timeout guards against a wedged TPU-tunnel RPC (seen
            # in the wild: a run blocked forever mid-epoch while a fresh
            # process could still reach the chip).
            import subprocess

            subprocess.run(
                [sys.executable, __file__, "--run-one", str(jobfile),
                 "--results", args.results],
                check=True,
                timeout=job.get("timeout", 5400),
            )
            jobfile.rename(done / jobfile.name)
        except Exception:
            tb = traceback.format_exc()
            print(f"[seed_queue] FAILED {jobfile.name}\n{tb}", flush=True)
            (failed / (jobfile.stem + ".traceback.txt")).write_text(tb)
            jobfile.rename(failed / jobfile.name)
        idle_since = time.time()


if __name__ == "__main__":
    main()
