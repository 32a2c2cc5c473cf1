"""Segment-tree tests, mirroring reference test/base/test_buffer.py segtree coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tianshou_tpu.ops.segtree import SegmentTree


@pytest.mark.parametrize("size", [1, 3, 8, 100])
def test_update_and_total(size, rng):
    st = SegmentTree(size)
    tree = st.init()
    vals = rng.random(size).astype(np.float32)
    tree = st.update(tree, jnp.arange(size), jnp.array(vals))
    np.testing.assert_allclose(st.total(tree), vals.sum(), rtol=1e-5)


def test_update_last_write_wins():
    st = SegmentTree(8)
    tree = st.init()
    idx = jnp.array([2, 5, 2, 2])
    val = jnp.array([1.0, 2.0, 3.0, 4.0])
    tree = st.update(tree, idx, val)
    np.testing.assert_allclose(st.total(tree), 4.0 + 2.0)
    np.testing.assert_allclose(st.reduce(tree, 2, 3), 4.0)


def test_reduce_ranges(rng):
    size = 20
    st = SegmentTree(size)
    vals = rng.random(size).astype(np.float32)
    tree = st.update(st.init(), jnp.arange(size), jnp.array(vals))
    for lo, hi in [(0, 20), (3, 7), (0, 1), (19, 20), (5, 5), (0, 13)]:
        np.testing.assert_allclose(
            st.reduce(tree, lo, hi), vals[lo:hi].sum(), rtol=1e-5, atol=1e-6,
            err_msg=f"range [{lo},{hi})",
        )


def test_prefix_sum_idx(rng):
    size = 16
    st = SegmentTree(size)
    vals = rng.random(size).astype(np.float32) + 0.01
    tree = st.update(st.init(), jnp.arange(size), jnp.array(vals))
    cum = np.concatenate([[0], np.cumsum(vals)])
    # query values strictly inside each leaf's interval must hit that leaf
    queries = (cum[:-1] + cum[1:]) / 2
    got = st.get_prefix_sum_idx(tree, jnp.array(queries))
    np.testing.assert_array_equal(got, np.arange(size))
    # boundary: value 0 -> first nonzero leaf
    assert int(st.get_prefix_sum_idx(tree, jnp.array([0.0]))[0]) == 0


def test_prefix_sum_sampling_distribution(rng):
    size = 10
    st = SegmentTree(size)
    vals = np.zeros(size, np.float32)
    vals[3] = 1.0
    vals[7] = 3.0
    tree = st.update(st.init(), jnp.arange(size), jnp.array(vals))
    u = rng.random(10000).astype(np.float32) * float(st.total(tree))
    idx = np.asarray(st.get_prefix_sum_idx(tree, jnp.array(u)))
    assert set(np.unique(idx)) == {3, 7}
    frac7 = (idx == 7).mean()
    assert 0.70 < frac7 < 0.80


def test_non_pow2_size():
    st = SegmentTree(5)
    tree = st.update(st.init(), jnp.arange(5), jnp.ones(5))
    np.testing.assert_allclose(st.total(tree), 5.0)
    # padding leaves never sampled
    idx = st.get_prefix_sum_idx(tree, jnp.array([4.999]))
    assert int(idx[0]) == 4


def test_jit_compatible():
    st = SegmentTree(64)

    @jax.jit
    def roundtrip(tree, idx, val, q):
        tree = st.update(tree, idx, val)
        return tree, st.get_prefix_sum_idx(tree, q)

    tree, sampled = roundtrip(st.init(), jnp.arange(64), jnp.ones(64), jnp.array([10.5]))
    assert int(sampled[0]) == 10
