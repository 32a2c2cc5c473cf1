"""Equivalence tests for the Pallas row-gather kernel (ops/pallas/gather.py).

On the CPU test backend pallas runs in interpret-compatible mode via the
XLA fallback in gather_rows_auto; gather_rows itself is exercised on TPU by
the microbenchmark. Here we verify the dispatch wrapper semantics and, when
a TPU is visible, kernel-vs-XLA bit equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tianshou_tpu.ops.pallas.gather import gather_rows, gather_rows_auto


def test_gather_rows_auto_matches_xla_on_cpu():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(0, 255, (64, 2048), dtype=np.uint8))
    idx = jnp.asarray(rng.integers(0, 64, 16, dtype=np.int32))
    out = gather_rows_auto(src, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(src)[np.asarray(idx)])


def test_gather_rows_small_rows_fall_back():
    src = jnp.arange(12.0).reshape(4, 3)
    idx = jnp.array([2, 0])
    out = gather_rows_auto(src, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(src)[[2, 0]])


@pytest.mark.skipif(jax.default_backend() == "cpu", reason="pallas TPU kernel")
def test_gather_rows_kernel_bit_exact_tpu():
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.integers(0, 255, (1024, 7168), dtype=np.uint8))
    idx = jnp.asarray(rng.integers(0, 1024, 128, dtype=np.int32))
    out = gather_rows(src, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(src)[np.asarray(idx)])


@pytest.mark.parametrize("inflight", [8, 32, 128])
def test_gather_rows_inflight_param_traces(inflight):
    """The DMA ring depth is a static parameter: every depth must produce
    the same abstract output (bit-exactness at 8/64 measured on TPU,
    scripts/gather_kernel_probe.py 2026-08-19)."""
    src = jnp.zeros((256, 7168), jnp.uint8)
    idx = jnp.zeros((64,), jnp.int32)
    out = jax.eval_shape(lambda s, i: gather_rows(s, i, inflight=inflight), src, idx)
    assert out.shape == (64, 7168) and out.dtype == jnp.uint8
