"""Aggregate the seed-queue results into reference-protocol table rows.

Reads examples/benchmark/results/seed_runs.jsonl (one line per seed run,
written by examples/benchmark/seed_queue.py), groups by row name, and
prints a markdown table with mean±std over seeds plus IQM and a 95%
stratified-bootstrap CI (tianshou_tpu.evaluation.rliable_evaluation —
the reference's newer benchmark protocol, docs/04_benchmarks/benchmarks.rst).

Usage::

    python scripts/aggregate_seed_runs.py [--results PATH]
"""

import argparse
import json
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tianshou_tpu.evaluation.rliable_evaluation import iqm, stratified_bootstrap_ci

# reference rows: max avg return over trials +- std at 1M (BASELINE.md,
# /root/reference/examples/mujoco/README.md). Key = "<algo>_<Task>".
REFERENCE = {
    "sac_HalfCheetah": (12138.8, 1049.3), "sac_Hopper": (3542.2, 51.5),
    "sac_Walker2d": (5007.0, 251.5), "sac_Ant": (5850.2, 475.7),
    "sac_Swimmer": (44.4, 0.5), "sac_Humanoid": (5488.5, 81.2),
    "td3_HalfCheetah": (10201.2, 772.8), "td3_Hopper": (3472.2, 116.8),
    "td3_Walker2d": (3982.4, 274.5), "td3_Ant": (5116.4, 799.9),
    "td3_Humanoid": (5189.5, 178.5),
    "ddpg_HalfCheetah": (11718.7, 465.6),
    "redq_Hopper": (2748.0, 239.0),  # README redq row
    "ppo_HalfCheetah": (5783.9, 1244.0), "ppo3m_HalfCheetah": (7337.4, 1508.2),
    "a2c_HalfCheetah": (2377.3, 1363.7),   # reference protocol: 3M
    "trpo_HalfCheetah": (4471.2, 804.9), "npg_HalfCheetah": (3485.2, 716.6),
    # on-policy widening rows (reference README.md:239-394; A2C budget is 3M)
    "ppo_Hopper": (2609.3, 700.8), "ppo_Walker2d": (3588.5, 756.6),
    "ppo_Ant": (3258.4, 1079.3),
    "a2c_Hopper": (1608.6, 529.5), "a2c_Walker2d": (1805.4, 1055.9),
    "a2c_Ant": (5236.8, 236.7),
    "npg_Hopper": (1915.2, 550.5), "npg_Walker2d": (2503.2, 963.3),
    "npg_Ant": (2358.0, 517.5),
    "trpo_Hopper": (2046.0, 1037.9), "trpo_Walker2d": (3826.7, 782.7),
    "trpo_Ant": (2866.7, 707.9),
    "reinforce_HalfCheetah": (1138.8, 104.7),  # reference protocol: 10M
    # our 10M-budget REINFORCE row, protocol-matched to the reference's 10M
    "reinforce10m_HalfCheetah": (1138.8, 104.7),
    # our 3M-budget A2C row, protocol-matched to the reference's 3M
    "a2c3m_HalfCheetah": (2377.3, 1363.7),
}

# rows whose REFERENCE number comes from a longer-than-1M protocol (the
# on-policy family tables: /root/reference/examples/mujoco/README.md:181-394);
# our queue rows are 1M unless the name says otherwise
REFERENCE_PROTOCOL = {
    # README table budgets: REINFORCE 10M (:181), A2C 3M (:239), PPO 1M/3M
    # (:294/:306), TRPO 1M (:348), NPG 1M (:384)
    "a2c_HalfCheetah": "3M", "a2c_Hopper": "3M", "a2c_Walker2d": "3M",
    "a2c_Ant": "3M",
    "reinforce_HalfCheetah": "10M", "ppo3m_HalfCheetah": "3M",
}


def _plot_rows(curves: dict[str, dict[int, list]], out_dir: Path) -> None:
    """One IQM/CI learning-curve plot per row from the stored per-seed
    curves — the JSONL-backed analogue of the reference's
    load_and_eval_experiment plots (rliable_evaluation.py:442)."""
    import numpy as np

    from tianshou_tpu.evaluation.rliable_evaluation import (
        iqm as _iqm,
        plot_iqm_curve,
        stratified_bootstrap_ci as _ci,
    )

    out_dir.mkdir(parents=True, exist_ok=True)
    for name, per_seed in sorted(curves.items()):
        cs = [np.asarray(c, np.float64) for c in per_seed.values() if len(c) >= 2]
        if len(cs) < 2:
            continue
        grid = cs[0][:, 0]
        mat = np.stack([np.interp(grid, c[:, 0], c[:, 1]) for c in cs])
        iqm_curve = np.array([_iqm(mat[:, t]) for t in range(mat.shape[1])])
        lo = np.empty_like(iqm_curve)
        hi = np.empty_like(iqm_curve)
        for t in range(mat.shape[1]):
            lo[t], hi[t] = _ci(mat[:, t][:, None], n_boot=200)
        base = name
        while base not in REFERENCE and "_" in base:
            base = base.rsplit("_", 1)[0]
        title = f"{name} (n={len(cs)} seeds)"
        fig = plot_iqm_curve(grid, iqm_curve, lo, hi, title=title,
                             out_path=str(out_dir / f"{name}.png"))
        if base in REFERENCE:
            ax = fig.axes[0]
            m, sd = REFERENCE[base]
            ax.axhline(m, color="gray", ls="--", lw=1, label="reference")
            ax.axhspan(m - sd, m + sd, color="gray", alpha=0.12)
            ax.legend()
            fig.savefig(out_dir / f"{name}.png", dpi=120)
        import matplotlib.pyplot as plt

        plt.close(fig)
    print(f"\nplots -> {out_dir}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--results", default="examples/benchmark/results/seed_runs.jsonl")
    p.add_argument("--latest-per-seed", action="store_true", default=True,
                   help="keep only the newest run per (name, seed)")
    p.add_argument("--plots", default=None, metavar="DIR",
                   help="also emit per-row IQM/CI learning-curve plots")
    args = p.parse_args()

    rows: dict[str, dict[int, float]] = defaultdict(dict)
    curves: dict[str, dict[int, list]] = defaultdict(dict)
    for line in Path(args.results).read_text().splitlines():
        if not line.strip():
            continue
        r = json.loads(line)
        if r["name"].startswith("host_overlap"):
            continue  # throughput probe, not a return row
        rows[r["name"]][int(r["seed"])] = float(r["best_reward"])  # newest wins
        if r.get("curve"):
            curves[r["name"]][int(r["seed"])] = r["curve"]

    print("| row | seeds | mean ± std | IQM [95% CI] | reference (mean ± std) |")
    print("|---|---|---|---|---|")
    for name in sorted(rows):
        scores = np.array([rows[name][s] for s in sorted(rows[name])])
        m, sd = scores.mean(), scores.std(ddof=1) if len(scores) > 1 else 0.0
        # stratified bootstrap over runs: score matrix [n_runs, 1 task]
        mat = scores[:, None]
        lo, hi = stratified_bootstrap_ci(mat)
        # tuned-config variants (e.g. td3_Ant_sigma02) compare against the
        # base row's reference number
        base = name
        while base not in REFERENCE and "_" in base:
            base = base.rsplit("_", 1)[0]
        ref = REFERENCE.get(base)
        proto = REFERENCE_PROTOCOL.get(base)
        ref_s = f"{ref[0]:,.1f} ± {ref[1]:,.1f}" if ref else "—"
        if ref and proto:
            ref_s += f" (at {proto})"
        if ref and base != name:
            # fallback-matched variant row (e.g. td3_Ant_sigma02): make the
            # attribution visible so a mis-stripped name can't masquerade as
            # a protocol-matched comparison
            ref_s += f" (vs {base})"
        print(f"| {name} | {len(scores)} | {m:,.1f} ± {sd:,.1f} | "
              f"{iqm(mat):,.1f} [{lo:,.1f}, {hi:,.1f}] | {ref_s} |")

    if args.plots:
        _plot_rows(curves, Path(args.plots))


if __name__ == "__main__":
    main()
