"""Experiment launchers (reference tianshou/evaluation/launcher.py:36-147):
``SequentialExpLauncher`` and a process-pool launcher replacing
``JoblibExpLauncher``. Each experiment failure is caught and reported as a
partial result (launcher.py:64-85)."""

from __future__ import annotations

import dataclasses
import traceback
from collections.abc import Callable, Sequence
from concurrent.futures import ProcessPoolExecutor
from typing import Any

__all__ = ["ExpLauncher", "SequentialExpLauncher", "PoolExpLauncher", "run_seeded_experiments"]


@dataclasses.dataclass
class LaunchResult:
    successes: list
    failures: list


class ExpLauncher:
    def launch(self, experiments: Sequence[tuple[Any, str]]) -> LaunchResult:
        raise NotImplementedError


class SequentialExpLauncher(ExpLauncher):
    def launch(self, experiments: Sequence[tuple[Any, str]]) -> LaunchResult:
        ok, bad = [], []
        for exp, name in experiments:
            try:
                ok.append((name, exp.run(name)))
            except Exception:
                bad.append((name, traceback.format_exc()))
        return LaunchResult(ok, bad)


def _run_one(args):
    exp, name = args
    try:
        return ("ok", name, exp.run(name))
    except Exception:
        return ("err", name, traceback.format_exc())


class PoolExpLauncher(ExpLauncher):
    """Process-parallel launcher (reference JoblibExpLauncher:117). Note:
    with a single remote TPU chip, parallel processes serialize on the
    device — use for CPU-backend sweeps."""

    def __init__(self, max_workers: int = 2) -> None:
        self.max_workers = max_workers

    def launch(self, experiments: Sequence[tuple[Any, str]]) -> LaunchResult:
        ok, bad = [], []
        with ProcessPoolExecutor(max_workers=self.max_workers) as ex:
            for status, name, payload in ex.map(_run_one, experiments):
                (ok if status == "ok" else bad).append((name, payload))
        return LaunchResult(ok, bad)


def run_seeded_experiments(builder_fn: Callable[[int], Any], seeds: Sequence[int], run_name: str) -> LaunchResult:
    """Build one experiment per seed and run sequentially (the multi-seed
    evaluation entry point used by rliable aggregation)."""
    exps = [(builder_fn(s).build(), f"{run_name}/seed{s}") for s in seeds]
    return SequentialExpLauncher().launch(exps)
