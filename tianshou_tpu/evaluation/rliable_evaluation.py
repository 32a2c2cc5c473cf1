"""Robust multi-seed evaluation (reference evaluation/rliable_evaluation.py).

The reference delegates to the ``rliable`` package (IQM + stratified
bootstrap CIs); that package is optional here, so the same statistics are
implemented directly with numpy: interquartile mean, stratified bootstrap
confidence intervals, and optimality-gap/median aggregates.
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = [
    "iqm", "stratified_bootstrap_ci", "eval_results", "RunSummary",
    "LoggedCollectStats", "load_and_eval_experiments", "plot_iqm_curve",
]


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


@dataclasses.dataclass
class LoggedCollectStats:
    """Test-return curves of one experiment loaded back from its logger
    (reference rliable_evaluation.py:53 LoggedCollectStats.from_data_dict)."""

    env_steps: np.ndarray          # [T]
    returns: np.ndarray            # [T]

    @staticmethod
    def from_log_dir(log_dir: str) -> "LoggedCollectStats":
        # read event files directly — constructing a TensorboardLogger here
        # would drop a fresh (empty) event file into the dir and make the
        # accumulator discard the run's real events as "restarted"
        from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

        acc = EventAccumulator(log_dir)
        acc.Reload()
        data = {
            tag: [(e.step, e.value) for e in acc.Scalars(tag)]
            for tag in acc.Tags().get("scalars", [])
        }
        key = next((k for k in data if k.endswith("test/returns_stat/mean") or k.endswith("test/reward")), None)
        if key is None:
            raise ValueError(f"no test-return scalars found in {log_dir}: {sorted(data)}")
        steps, vals = zip(*data[key])
        return LoggedCollectStats(np.asarray(steps), np.asarray(vals))


def load_and_eval_experiments(log_dirs, n_boot: int = 2000):
    """Aggregate several seeded runs from their tensorboard logs: IQM curve
    with stratified bootstrap band (reference load_and_eval_experiment:442).
    Returns (steps [T], iqm [T], lo [T], hi [T], RunSummary of final scores).
    Curves are aligned by interpolation onto the first run's step grid."""
    curves = [LoggedCollectStats.from_log_dir(d) for d in log_dirs]
    grid = curves[0].env_steps.astype(np.float64)
    mat = np.stack([
        np.interp(grid, c.env_steps.astype(np.float64), c.returns) for c in curves
    ])  # [n_runs, T]
    iqm_curve = np.array([iqm(mat[:, t]) for t in range(mat.shape[1])])
    lo = np.empty_like(iqm_curve)
    hi = np.empty_like(iqm_curve)
    for t in range(mat.shape[1]):
        lo[t], hi[t] = stratified_bootstrap_ci(mat[:, t][:, None], n_boot=max(200, n_boot // 10))
    summary = eval_results(mat[:, -1], n_boot=n_boot)
    return grid, iqm_curve, lo, hi, summary


def plot_iqm_curve(grid, iqm_curve, lo, hi, title: str = "", out_path: str | None = None):
    """Learning-curve plot with the bootstrap band (the reference's
    rliable sample-efficiency plot). Saves to ``out_path`` if given."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(grid, iqm_curve, label="IQM")
    ax.fill_between(grid, lo, hi, alpha=0.25, label="95% CI")
    ax.set_xlabel("env steps")
    ax.set_ylabel("test return")
    if title:
        ax.set_title(title)
    ax.legend()
    fig.tight_layout()
    if out_path is not None:
        fig.savefig(out_path, dpi=120)
    return fig
