"""Pallas sum-tree descent vs the XLA reference implementation (interpret
mode on CPU; the real kernel is exercised on TPU by bench/verify runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tianshou_tpu.ops.pallas.sumtree import pallas_prefix_sum_idx
from tianshou_tpu.ops.segtree import SegmentTree


@pytest.mark.parametrize("size,batch", [(64, 32), (100, 257), (1024, 128)])
def test_pallas_matches_xla(size, batch, rng):
    st = SegmentTree(size)
    vals = rng.random(size).astype(np.float32) + 0.01
    tree = st.update(st.init(), jnp.arange(size), jnp.array(vals))
    total = float(st.total(tree))
    q = (rng.random(batch) * total).astype(np.float32)
    want = st.get_prefix_sum_idx(tree, jnp.array(q), use_pallas=False)
    got = pallas_prefix_sum_idx(tree, jnp.array(q), st.bound, st.depth, interpret=True)
    got = jnp.minimum(got, st.size - 1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_boundary_queries(rng):
    st = SegmentTree(16)
    vals = rng.random(16).astype(np.float32) + 0.1
    tree = st.update(st.init(), jnp.arange(16), jnp.array(vals))
    cum = np.concatenate([[0], np.cumsum(vals)])
    mids = ((cum[:-1] + cum[1:]) / 2).astype(np.float32)
    got = pallas_prefix_sum_idx(tree, jnp.array(mids), st.bound, st.depth, interpret=True)
    np.testing.assert_array_equal(np.asarray(jnp.minimum(got, 15)), np.arange(16))
