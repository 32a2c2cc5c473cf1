"""Determinism tracing and regression testing.

Rebuild of reference ``tianshou/utils/determinism.py``: ``TraceLogger``
(:57, lazily-evaluated behavioral trace with a global switch),
``trace_param_hash`` (<- torch_param_hash :233), and
``TraceDeterminismTest`` (:250, snapshot compare with diff output).

Under JAX the guarantees are stronger: given a fixed PRNG key, jitted
programs are bit-deterministic on the same backend, so the trace is mostly a
refactoring safety net (SURVEY.md §4.4).
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
from collections.abc import Callable
from typing import Any

import jax
import numpy as np

__all__ = ["TraceLogger", "TraceLoggerContext", "trace_param_hash", "TraceDeterminismTest"]


class TraceLogger:
    """Global, opt-in trace buffer. Messages are callables evaluated only
    when tracing is enabled (reference TraceLogger:57)."""

    enabled: bool = False
    _lines: list[str] = []

    @classmethod
    def log(cls, source: str, msg_fn: Callable[[], str]) -> None:
        if cls.enabled:
            cls._lines.append(f"{source}: {msg_fn()}")

    @classmethod
    def get_trace(cls) -> list[str]:
        return list(cls._lines)

    @classmethod
    def reset(cls) -> None:
        cls._lines = []


class TraceLoggerContext:
    def __enter__(self):
        TraceLogger.reset()
        TraceLogger.enabled = True
        return TraceLogger

    def __exit__(self, *exc):
        TraceLogger.enabled = False
        return False


def trace_param_hash(tree: Any) -> str:
    """SHA1 over all leaves of a param/state pytree (reference
    torch_param_hash :233). Stable across runs for identical params."""
    h = hashlib.sha1()
    leaves, treedef = jax.tree.flatten(tree)
    h.update(str(treedef).encode())
    for leaf in leaves:
        arr = np.asarray(jax.device_get(leaf))
        h.update(arr.tobytes())
    return h.hexdigest()


@dataclasses.dataclass
class TraceDeterminismTest:
    """Compare a behavior trace against a stored snapshot
    (reference TraceDeterminismTest:250)."""

    base_path: str

    def check(self, name: str, trace: list[str], create_if_missing: bool = True) -> None:
        os.makedirs(self.base_path, exist_ok=True)
        path = os.path.join(self.base_path, f"{name}.trace")
        text = "\n".join(trace)
        if not os.path.exists(path):
            if create_if_missing:
                with open(path, "w") as f:
                    f.write(text)
                return
            raise FileNotFoundError(path)
        with open(path) as f:
            expected = f.read()
        if expected != text:
            exp_lines = expected.splitlines()
            got_lines = text.splitlines()
            diffs = [
                f"line {i}: expected {e!r} got {g!r}"
                for i, (e, g) in enumerate(zip(exp_lines, got_lines))
                if e != g
            ]
            if len(exp_lines) != len(got_lines):
                diffs.append(f"length mismatch: {len(exp_lines)} vs {len(got_lines)}")
            raise AssertionError("determinism trace mismatch:\n" + "\n".join(diffs[:20]))
