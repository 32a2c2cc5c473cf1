"""Extended Batch battery — ports the remaining reference test_batch.py
cases (reference test/base/test_batch.py: 958 lines; deep-nesting,
cat/stack promotion, empty semantics, conversion, arithmetic) that the
round-4 battery (tests/test_batch.py) did not yet cover."""

import copy
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tianshou_tpu.data.batch import Batch, alloc_by_keys_diff, create_value


# ---------------------------------------------------------------------------
# construction edge cases (reference test_batch:18-120)
# ---------------------------------------------------------------------------


def test_construct_scalars_promote_to_arrays():
    b = Batch(a=1, b=1.5, c=True)
    assert b.a.shape == () and b.b.shape == () and b.c.shape == ()
    assert b.c.dtype == np.bool_ or b.c.dtype == jnp.bool_


def test_construct_deep_nesting_from_dicts():
    b = Batch(obs={"pos": np.zeros((3, 2)), "extra": {"vel": np.ones((3, 4))}}, act=np.arange(3))
    assert isinstance(b.obs, Batch) and isinstance(b.obs.extra, Batch)
    assert b.obs.extra.vel.shape == (3, 4)
    assert b.shape == [3]
    # deep getattr chain survives slicing
    assert b[1].obs.extra.vel.shape == (4,)


def test_nested_setattr_creates_subbatch():
    b = Batch(a=np.zeros(3))
    b.sub = {"x": np.ones(3)}
    assert isinstance(b.sub, Batch)
    b.sub.y = np.full(3, 2.0)
    assert float(b.sub.y.sum()) == 6.0


def test_getitem_string_and_tuple_index():
    b = Batch(a=np.arange(12).reshape(3, 4), nested=Batch(x=np.arange(3)))
    np.testing.assert_array_equal(np.asarray(b["a"]), np.arange(12).reshape(3, 4))
    row = b[np.array([0, 2])]
    assert row.a.shape == (2, 4) and row.nested.x.shape == (2,)


def test_boolean_mask_indexing():
    b = Batch(a=np.arange(5), s=Batch(v=np.arange(10).reshape(5, 2)))
    m = np.array([True, False, True, False, True])
    sel = b[m]
    np.testing.assert_array_equal(np.asarray(sel.a), [0, 2, 4])
    assert sel.s.v.shape == (3, 2)


def test_setitem_by_index_writes_all_leaves():
    b = Batch(a=np.zeros(4), s=Batch(v=np.zeros((4, 2))))
    b[2] = Batch(a=5.0, s=Batch(v=np.ones(2)))
    assert float(b.a[2]) == 5.0
    np.testing.assert_array_equal(np.asarray(b.s.v[2]), [1, 1])
    # untouched rows stay zero
    assert float(np.asarray(b.a).sum()) == 5.0


def test_len_of_scalar_only_batch_raises():
    b = Batch(a=np.float32(1.0))
    with pytest.raises(TypeError):
        len(b)


def test_shape_is_elementwise_min_reference_parity():
    # reference batch.py:1185: shape = elementwise min over zipped leaf
    # shapes (zip truncates to the shortest rank)
    b = Batch(a=np.zeros((4, 5)), c=Batch(d=np.zeros((4, 2, 2))))
    assert b.shape == [4, 2]
    assert len(b) == 4


# ---------------------------------------------------------------------------
# cat / stack deep semantics (reference test_batch_cat_and_stack:232-348)
# ---------------------------------------------------------------------------


def test_cat_nested_missing_subkeys_zero_pad():
    b1 = Batch(a=np.ones((2, 3)), nested=Batch(x=np.ones(2)))
    b2 = Batch(a=np.ones((3, 3)))
    out = Batch.cat([b1, b2])
    assert out.a.shape == (5, 3)
    # b2 contributed zeros for nested.x
    np.testing.assert_array_equal(np.asarray(out.nested.x), [1, 1, 0, 0, 0])


def test_cat_three_way_and_order():
    parts = [Batch(a=np.full((i + 1,), i)) for i in range(3)]
    out = Batch.cat(parts)
    np.testing.assert_array_equal(np.asarray(out.a), [0, 1, 1, 2, 2, 2])


def test_cat_axis1():
    b1 = Batch(a=np.ones((2, 3)))
    b2 = Batch(a=np.zeros((2, 2)))
    out = Batch.cat([b1, b2], axis=1)
    assert out.a.shape == (2, 5)


def test_stack_nested_and_new_axis():
    rows = [Batch(o=Batch(p=np.full(3, i)), r=np.float32(i)) for i in range(4)]
    out = Batch.stack(rows)
    assert out.o.p.shape == (4, 3) and out.r.shape == (4,)
    np.testing.assert_array_equal(np.asarray(out.r), [0, 1, 2, 3])
    out1 = Batch.stack([Batch(a=np.zeros((2, 3))), Batch(a=np.ones((2, 3)))], axis=1)
    assert out1.a.shape == (2, 2, 3)


def test_stack_missing_keys_zero_fill_union():
    b1 = Batch(a=np.ones(3), b=np.ones(3))
    b2 = Batch(a=np.full(3, 2.0), c=np.full(3, 3.0))
    out = Batch.stack([b1, b2])
    np.testing.assert_array_equal(np.asarray(out.b), [[1, 1, 1], [0, 0, 0]])
    np.testing.assert_array_equal(np.asarray(out.c), [[0, 0, 0], [3, 3, 3]])


def test_cat_inplace_matches_functional():
    b1 = Batch(a=np.ones(2), n=Batch(x=np.ones(2)))
    b2 = Batch(a=np.zeros(3), n=Batch(x=np.zeros(3)))
    func = Batch.cat([b1, b2])
    b1.cat_(b2)
    assert b1 == func


def test_stack_inplace_matches_functional():
    b1 = Batch(a=np.ones(2))
    b2 = Batch(a=np.zeros(2))
    func = Batch.stack([b1, b2])
    b3 = Batch(a=np.ones(2))
    b3.stack_([b2])
    # stack_ stacks self with others along axis 0
    assert b3 == func


# ---------------------------------------------------------------------------
# empty semantics (reference test_batch_empty:453)
# ---------------------------------------------------------------------------


def test_empty_zeroes_rows_in_place():
    b = Batch(a=np.arange(4, dtype=np.float32), n=Batch(x=np.ones((4, 2))))
    b.empty_(index=np.array([1, 3]))
    np.testing.assert_array_equal(np.asarray(b.a), [0, 0, 2, 0])
    np.testing.assert_array_equal(np.asarray(b.n.x[0]), [1, 1])
    np.testing.assert_array_equal(np.asarray(b.n.x[1]), [0, 0])


def test_empty_static_returns_copy():
    b = Batch(a=np.ones(3))
    out = Batch.empty(b)
    assert float(np.asarray(out.a).sum()) == 0.0
    assert float(np.asarray(b.a).sum()) == 3.0  # original untouched


# ---------------------------------------------------------------------------
# conversion & copies (reference test_utils_to_torch_numpy:349, copy:421)
# ---------------------------------------------------------------------------


def test_to_jax_and_back_preserves_structure_and_values():
    b = Batch(a=np.arange(3, dtype=np.int64), n=Batch(x=np.ones((3, 2), np.float64)))
    j = b.to_jax()
    assert isinstance(j.a, jax.Array) and isinstance(j.n.x, jax.Array)
    back = j.to_numpy()
    assert isinstance(back.a, np.ndarray)
    np.testing.assert_array_equal(back.a, b.a)


def test_inplace_conversion_mutates_self():
    b = Batch(a=np.zeros(2))
    b.to_jax_()
    assert isinstance(b.a, jax.Array)
    b.to_numpy_()
    assert isinstance(b.a, np.ndarray)


def test_copy_is_shallow_per_leaf_but_structural():
    b = Batch(a=np.zeros(3), n=Batch(x=np.zeros(3)))
    c = b.copy()
    c.n.y = np.ones(3)  # structural change must not leak back
    assert "y" not in b.n
    d = copy.deepcopy(b)
    d.a[0] = 7  # numpy deep copy: no leak
    assert float(b.a[0]) == 0.0


def test_pickle_nested_mixed_backends():
    b = Batch(a=np.arange(3), j=jnp.ones((3, 2)), n=Batch(x=np.zeros(3)))
    b2 = pickle.loads(pickle.dumps(b))
    assert b2 == b


# ---------------------------------------------------------------------------
# arithmetic (reference test_batch:120-186)
# ---------------------------------------------------------------------------


def test_scalar_arithmetic_applies_to_all_leaves():
    b = Batch(a=np.ones(3), n=Batch(x=np.full(3, 2.0)))
    out = (b + 1) * 2
    np.testing.assert_array_equal(np.asarray(out.a), [4, 4, 4])
    np.testing.assert_array_equal(np.asarray(out.n.x), [6, 6, 6])
    out = out / 2
    np.testing.assert_array_equal(np.asarray(out.a), [2, 2, 2])


def test_batch_plus_batch_elementwise():
    b1 = Batch(a=np.ones(3))
    b2 = Batch(a=np.full(3, 10.0))
    out = b1 + b2
    np.testing.assert_array_equal(np.asarray(out.a), [11, 11, 11])


def test_inplace_arithmetic():
    b = Batch(a=np.ones(3))
    b += 2
    np.testing.assert_array_equal(np.asarray(b.a), [3, 3, 3])
    b *= 2
    np.testing.assert_array_equal(np.asarray(b.a), [6, 6, 6])
    b /= 3
    np.testing.assert_array_equal(np.asarray(b.a), [2, 2, 2])


def test_mean_over_leaves():
    b = Batch(a=np.array([1.0, 3.0]), n=Batch(x=np.array([2.0, 4.0])))
    m = b.mean()
    assert float(m.a) == 2.0 and float(m.n.x) == 3.0


# ---------------------------------------------------------------------------
# split (reference batch.py:1199 split contract)
# ---------------------------------------------------------------------------


def test_split_covers_all_rows_shuffled():
    b = Batch(a=np.arange(10))
    seen = []
    for part in b.split(3, shuffle=True, merge_last=False):
        seen.extend(np.asarray(part.a).tolist())
    assert sorted(seen) == list(range(10))


def test_split_merge_last_absorbs_remainder():
    b = Batch(a=np.arange(10))
    parts = list(b.split(4, shuffle=False, merge_last=True))
    assert [len(p) for p in parts] == [4, 6]
    parts = list(b.split(4, shuffle=False, merge_last=False))
    assert [len(p) for p in parts] == [4, 4, 2]


def test_split_size_larger_than_batch_yields_whole():
    b = Batch(a=np.arange(3))
    parts = list(b.split(100, shuffle=False))
    assert len(parts) == 1 and len(parts[0]) == 3


# ---------------------------------------------------------------------------
# null handling (reference test_buffer_dropnull:1515)
# ---------------------------------------------------------------------------


def test_isnull_hasnull_dropnull_nested():
    b = Batch(
        a=np.array([1.0, np.nan, 3.0]),
        n=Batch(x=np.array([[1.0, 2.0], [3.0, 4.0], [5.0, np.nan]])),
        clean=np.ones(3),
    )
    assert b.hasnull()
    nulls = b.isnull()
    assert bool(np.asarray(nulls.a)[1]) and not bool(np.asarray(nulls.a)[0])
    dropped = b.dropnull()
    assert not dropped.hasnull()
    # only fully-clean rows survive
    assert len(dropped) == 1
    assert float(np.asarray(dropped.a)[0]) == 1.0


# ---------------------------------------------------------------------------
# set_array_at_key / apply_values_transform (reference batch.py:976+)
# ---------------------------------------------------------------------------


def test_set_array_at_key_partial_index():
    b = Batch(a=np.zeros(5))
    b.set_array_at_key(np.array([9.0, 8.0]), "a", index=np.array([1, 3]))
    np.testing.assert_array_equal(np.asarray(b.a), [0, 9, 0, 8, 0])


def test_set_array_at_key_new_key_requires_full_default():
    b = Batch(a=np.zeros(3))
    b.set_array_at_key(np.arange(3.0), "fresh")
    np.testing.assert_array_equal(np.asarray(b.fresh), [0, 1, 2])


def test_apply_values_transform_functional_and_inplace():
    b = Batch(a=np.ones(2), n=Batch(x=np.full(2, 3.0)))
    out = b.apply_values_transform(lambda x: x * 10)
    assert float(np.asarray(out.n.x)[0]) == 30.0
    assert float(np.asarray(b.n.x)[0]) == 3.0
    b.apply_values_transform(lambda x: x * 0, inplace=True)
    assert float(np.asarray(b.a).sum()) == 0.0


# ---------------------------------------------------------------------------
# create_value / alloc_by_keys_diff (reference batch.py:147,230)
# ---------------------------------------------------------------------------


def test_create_value_matches_inst_dtype_and_shape():
    v = create_value(np.ones((2, 3), np.float32), size=5)
    assert v.shape == (5, 2, 3) and v.dtype == np.float32
    v = create_value(np.int64(3), size=4)
    assert v.shape == (4,)
    sub = create_value(Batch(x=np.ones(2)), size=3)
    assert isinstance(sub, Batch) and sub.x.shape == (3, 2)


def test_alloc_by_keys_diff_adds_missing_keys():
    # stack=False strips the incoming leading dim (reference batch.py:147
    # create_value semantics, used by the buffer's grow-on-new-key path)
    meta = Batch(a=np.zeros((4, 2)))
    incoming = Batch(a=np.ones((1, 2)), fresh=Batch(x=np.ones((1, 3))))
    alloc_by_keys_diff(meta, incoming, size=4, stack=False)
    assert "fresh" in meta and meta.fresh.x.shape == (4, 3)
    # stack=True keeps the full incoming shape per row
    meta2 = Batch(a=np.zeros((4, 2)))
    alloc_by_keys_diff(meta2, Batch(a=np.ones((1, 2)), g=np.ones((1, 3))), size=4)
    assert meta2.g.shape == (4, 1, 3)


# ---------------------------------------------------------------------------
# pytree & jit interactions (TPU-native contract)
# ---------------------------------------------------------------------------


def test_batch_passes_through_jit_boundary_with_aux_keys():
    b = Batch(obs=jnp.ones((4, 3)), extra=Batch(flag=jnp.zeros(4)))

    @jax.jit
    def f(x):
        x = x.copy()
        x.obs = x.obs * 2
        return x

    out = f(b)
    assert float(out.obs.sum()) == 24.0
    assert "flag" in out.extra


def test_batch_tree_map_preserves_key_order():
    b = Batch(z=jnp.zeros(2), a=jnp.ones(2))
    out = jax.tree.map(lambda x: x + 1, b)
    assert list(out.keys()) == list(b.keys())


def test_batch_grad_through_leaves():
    b = Batch(w=jnp.ones(3))

    def loss(batch):
        return (batch.w ** 2).sum()

    g = jax.grad(loss)(b)
    np.testing.assert_allclose(np.asarray(g.w), [2, 2, 2])


def test_scan_carry_batch():
    b = Batch(c=jnp.zeros(2))

    def body(carry, _):
        carry = carry.copy()
        carry.c = carry.c + 1
        return carry, carry.c

    out, ys = jax.lax.scan(body, b, None, length=5)
    np.testing.assert_array_equal(np.asarray(out.c), [5, 5])
    assert ys.shape == (5, 2)
