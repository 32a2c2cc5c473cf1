"""Batch unit tests, mirroring reference test/base/test_batch.py coverage."""

import copy
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tianshou_tpu import Batch


def test_construct_and_access():
    b = Batch(a=np.arange(3), b={"c": np.ones((3, 2))})
    assert list(b.keys()) == ["a", "b"]
    assert isinstance(b.b, Batch)
    np.testing.assert_array_equal(b.a, [0, 1, 2])
    np.testing.assert_array_equal(b["b"]["c"], np.ones((3, 2)))
    b.d = [1, 2, 3]
    np.testing.assert_array_equal(b.d, [1, 2, 3])
    assert "d" in b
    del b.d
    assert "d" not in b
    with pytest.raises(AttributeError):
        _ = b.nonexistent


def test_construct_from_list_of_dicts():
    b = Batch([{"a": 1, "b": {"c": 2.0}}, {"a": 3, "b": {"c": 4.0}}])
    assert len(b) == 2
    np.testing.assert_array_equal(b.a, [1, 3])
    np.testing.assert_array_equal(b.b.c, [2.0, 4.0])


def test_len_and_shape():
    b = Batch(a=np.zeros((4, 3)), b=Batch(c=np.zeros((5, 2))))
    assert len(b) == 4
    assert b.shape == [4, 2]
    with pytest.raises(TypeError):
        len(Batch())
    with pytest.raises(TypeError):
        len(Batch(a=np.float64(1.0)))


def test_indexing():
    b = Batch(obs=np.arange(10), nested=Batch(x=np.arange(20).reshape(10, 2)))
    s = b[2:5]
    np.testing.assert_array_equal(s.obs, [2, 3, 4])
    assert s.nested.x.shape == (3, 2)
    one = b[3]
    assert one.obs == 3
    idx = np.array([1, 5, 7])
    np.testing.assert_array_equal(b[idx].obs, [1, 5, 7])
    mask = np.zeros(10, bool)
    mask[::2] = True
    assert len(b[mask]) == 5


def test_setitem_slice():
    b = Batch(a=np.zeros(5), n=Batch(x=np.zeros((5, 2))))
    b[2:4] = Batch(a=np.ones(2), n=Batch(x=np.ones((2, 2))))
    np.testing.assert_array_equal(b.a, [0, 0, 1, 1, 0])
    np.testing.assert_array_equal(b.n.x[2], [1, 1])
    # jax-array leaves take the functional path
    bj = Batch(a=jnp.zeros(5))
    bj[1] = Batch(a=7.0)
    assert bj.a[1] == 7.0


def test_cat_stack():
    b1 = Batch(a=np.ones((2, 3)), n=Batch(x=np.zeros(2)))
    b2 = Batch(a=np.zeros((3, 3)), n=Batch(x=np.ones(3)))
    c = Batch.cat([b1, b2])
    assert c.a.shape == (5, 3)
    np.testing.assert_array_equal(c.n.x, [0, 0, 1, 1, 1])
    s = Batch.stack([b1, b1])
    assert s.a.shape == (2, 2, 3)
    b1.cat_(b2)
    assert b1.a.shape == (5, 3)
    # disjoint keys zero-pad using inferred lengths (reference batch.py:976)
    dj = Batch.cat([Batch(a=np.ones(2)), Batch(b=np.ones(2))])
    np.testing.assert_array_equal(dj.a, [1, 1, 0, 0])
    np.testing.assert_array_equal(dj.b, [0, 0, 1, 1])


def test_split():
    b = Batch(a=np.arange(7))
    chunks = list(b.split(3, shuffle=False))
    assert [len(c) for c in chunks] == [3, 3, 1]
    merged = list(b.split(3, shuffle=False, merge_last=True))
    assert [len(c) for c in merged] == [3, 4]
    shuffled = Batch.cat(list(b.split(2, shuffle=True, rng=np.random.default_rng(0))))
    assert sorted(np.asarray(shuffled.a).tolist()) == list(range(7))


def test_pytree_roundtrip():
    b = Batch(a=jnp.arange(3.0), n=Batch(x=jnp.ones((3, 2))))
    leaves, treedef = jax.tree.flatten(b)
    assert len(leaves) == 2
    b2 = jax.tree.unflatten(treedef, leaves)
    assert b2 == b

    @jax.jit
    def f(batch):
        return Batch(y=batch.a * 2, n=batch.n)

    out = f(b)
    np.testing.assert_allclose(out.y, [0, 2, 4])


def test_vmap_scan_compat():
    b = Batch(a=jnp.arange(12.0).reshape(4, 3))

    def step(carry, x):
        return carry + x.a.sum(), x.a * 0

    total, _ = jax.lax.scan(step, 0.0, b)
    assert total == 66.0
    out = jax.vmap(lambda x: x.a + 1)(b)
    assert out.shape == (4, 3)


def test_conversion():
    b = Batch(a=np.arange(3, dtype=np.int32), n=Batch(x=np.ones(3, np.float32)))
    j = b.to_jax()
    assert isinstance(j.a, jax.Array)
    n = j.to_numpy()
    assert isinstance(n.a, np.ndarray)
    assert n == b


def test_equality_pickle_deepcopy():
    b = Batch(a=np.arange(3), n=Batch(x=jnp.ones(3)))
    b2 = pickle.loads(pickle.dumps(b))
    assert b2 == b
    b3 = copy.deepcopy(b)
    assert b3 == b
    assert b != Batch(a=np.arange(3))
    assert b != Batch(a=np.arange(4), n=Batch(x=jnp.ones(3)))


def test_hasnull():
    assert not Batch(a=np.ones(3)).hasnull()
    assert Batch(a=np.array([1.0, np.nan])).hasnull()
    assert Batch(n=Batch(a=jnp.array([jnp.nan]))).hasnull()


def test_empty_and_update():
    b = Batch()
    assert b.is_empty()
    b.update(a=np.ones(2))
    assert not b.is_empty()
    b.update({"c": np.zeros(2)}, d=np.ones(2))
    assert set(b.keys()) == {"a", "c", "d"}
    assert Batch(x=Batch()).is_empty(recurse=True)
    with pytest.raises(IndexError):
        Batch()[0]


def test_object_array_host_only():
    # object arrays of dicts convert to a stacked Batch (reference
    # test_batch.py:282-288); other object payloads stay host-only
    b = Batch(info=np.array([{"k": 1}, {"k": 2}], dtype=object))
    assert isinstance(b.info, Batch)
    assert int(b.info[0].k) == 1
    class Blob:  # non-dict payload: passes through as object array
        pass
    b2 = Batch(info=np.array([Blob(), Blob()], dtype=object))
    assert b2.info.dtype == object
    with pytest.raises(TypeError):
        b2.to_jax()


def test_isnull_dropnull():
    b = Batch(a=np.array([1.0, np.nan, 3.0]), n=Batch(x=np.array([[1.0, 2], [3, 4], [np.nan, 6]])))
    mask = b.isnull()
    np.testing.assert_array_equal(np.asarray(mask.a), [False, True, False])
    kept = b.dropnull()
    assert len(kept) == 1
    assert float(kept.a[0]) == 1.0


# ---------------------------------------------------------------------------
# Reference parity: cat/stack with incompatible keys, empty_, assignment,
# iteration, arithmetic (reference test/base/test_batch.py:232-347,453-487,
# 829-945)
# ---------------------------------------------------------------------------

def test_cat_with_missing_keys_zero_pads():
    # reference test_batch.py:251-257 (lens inference)
    a = Batch(a=Batch(a=np.random.randn(3, 4), t=Batch()), b=np.random.randn(3, 4))
    b = Batch(a=Batch(a=Batch(), t=Batch()), b=np.random.randn(3, 4))
    ans = Batch.cat([a, b, a])
    np.testing.assert_allclose(
        np.asarray(ans.a.a),
        np.concatenate([a.a.a, np.zeros((3, 4)), a.a.a]),
    )
    np.testing.assert_allclose(np.asarray(ans.b), np.concatenate([a.b, b.b, a.b]))
    assert len(ans.a.t.get_keys()) == 0


def test_cat_empty_batch_contributes_nothing():
    # reference test_batch.py:244-249
    a = Batch(a=Batch(a=np.random.randn(3, 4)))
    a_empty = Batch(a=Batch(a=Batch()))
    np.testing.assert_allclose(
        np.concatenate([a.a.a, a.a.a]),
        np.asarray(Batch.cat([a, a_empty, a]).a.a),
    )


def test_cat_reserved_keys():
    # reference test_batch.py:263-274 (jax instead of torch)
    b1 = Batch(a=Batch(), b=jnp.zeros((3, 3)), common=Batch(c=np.random.rand(3, 5)))
    b2 = Batch(a=Batch(), b=jnp.ones((4, 3)), common=Batch(c=np.random.rand(4, 5)))
    test = Batch.cat([b1, b2])
    assert len(test.a.get_keys()) == 0
    np.testing.assert_allclose(np.asarray(test.b), np.concatenate([np.zeros((3, 3)), np.ones((4, 3))]))
    np.testing.assert_allclose(np.asarray(test.common.c), np.concatenate([b1.common.c, b2.common.c]))


def test_stack_incompatible_keys_union_zero_fill():
    # reference test_batch.py:290-309
    a = Batch(a=1, b=2, c=3)
    b = Batch(a=4, b=5, d=6)
    c = Batch(c=7, b=6, d=9)
    d = Batch.stack([a, b, c])
    np.testing.assert_allclose(np.asarray(d.a), [1, 4, 0])
    np.testing.assert_allclose(np.asarray(d.b), [2, 5, 6])
    np.testing.assert_allclose(np.asarray(d.c), [3, 0, 7])
    np.testing.assert_allclose(np.asarray(d.d), [0, 6, 9])
    # all-empty values stay reserved
    e = Batch.stack([Batch(a=1, e=Batch()), Batch(a=2, e=Batch())])
    assert len(e.e.get_keys()) == 0
    # empty stacks
    assert len(Batch.stack([Batch(), Batch()]).get_keys()) == 0
    assert len(Batch.stack([]).get_keys()) == 0
    assert len(Batch.cat([]).get_keys()) == 0


def test_stack_mixed_np_jax():
    # reference test_batch.py:318-328, torch -> jax
    b1 = Batch(a=np.random.rand(4, 4), common=Batch(c=np.random.rand(4, 5)))
    b2 = Batch(b=jnp.ones((4, 6)), common=Batch(c=np.random.rand(4, 5)))
    test = Batch.stack([b1, b2])
    np.testing.assert_allclose(np.asarray(test.a), np.stack([b1.a, np.zeros((4, 4))]))
    np.testing.assert_allclose(np.asarray(test.b), np.stack([np.zeros((4, 6)), np.ones((4, 6))]))
    np.testing.assert_allclose(np.asarray(test.common.c), np.stack([b1.common.c, b2.common.c]))


def test_cat_stack_error_cases():
    # reference test_batch.py:330-346
    with pytest.raises(ValueError):
        Batch.cat([[Batch(a=1)], [Batch(a=1)]])
    with pytest.raises(ValueError):
        Batch.stack([[Batch(a=1)], [Batch(a=1)]])
    b1 = Batch(e=np.array([4.0, 5.0]), d=6)
    b2 = Batch(e=np.array([4.0, 6.0]))
    with pytest.raises(ValueError):
        Batch.cat([b1, b2])  # 0-d `d` cannot be padded
    with pytest.raises(ValueError):
        Batch.stack([b1, b2], axis=1)  # missing key at axis != 0


def test_stack_axis1_and_inplace():
    b3 = Batch(a=np.zeros((3, 4)), b=jnp.ones((2, 5)), c=Batch(d=np.array([[1], [2]])))
    b4 = Batch(a=np.ones((3, 4)), b=jnp.ones((2, 5)), c=Batch(d=np.array([[0], [3]])))
    b34 = Batch.stack((b3, b4), axis=1)
    np.testing.assert_allclose(np.asarray(b34.a), np.stack((b3.a, b4.a), axis=1))
    b3.stack_([b4])
    assert b3.a.shape == (2, 3, 4)
    # cat_ in place
    x = Batch(a=np.arange(3))
    x.cat_(Batch(a=np.arange(3)))
    assert len(x) == 6


def test_batch_from_array_of_dicts():
    # reference test_batch.py:282-288: union keys + zero fill
    b5_dict = np.array([{"a": False, "b": {"c": 2.0, "d": 1.0}}, {"a": True, "b": {"c": 3.0}}])
    b5 = Batch(b5_dict)
    assert bool(b5.a[0]) is False and bool(b5.a[1]) is True
    np.testing.assert_allclose(np.asarray(b5.b.c), [2.0, 3.0])
    assert float(b5.b.d[0]) == 1.0 and float(b5.b.d[1]) == 0.0


def test_batch_empty_and_empty_():
    # reference test_batch.py:453-487 (no object columns on the jax path)
    data = Batch(
        a=np.array([False, True]),
        b=Batch(e=np.array([2.0, np.e])),
        c=np.array([1, 3], dtype=int),
        t=jnp.array([4.0, 5.0]),
    )
    data[-1] = Batch.empty(data[1])
    np.testing.assert_allclose(np.asarray(data.a), [False, False])
    np.testing.assert_allclose(np.asarray(data.c), [1, 0])
    np.testing.assert_allclose(np.asarray(data.b.e), [2.0, 0.0])
    np.testing.assert_allclose(np.asarray(data.t), [4.0, 0.0])
    data.empty_(index=0)
    np.testing.assert_allclose(np.asarray(data.c), [0, 0])
    b0 = Batch()
    b0.empty_()
    assert b0.shape == []


def test_set_array_at_key():
    # reference test_batch.py:829-875
    batch = Batch(a=np.array([4, 5, 6]), b=np.array([7, 8, 9]), c={"d": np.array([1, 2, 3])})
    batch.set_array_at_key(np.array([1, 2, 3]), "a")
    batch.set_array_at_key(np.array([4, 5, 6]), "new_key")
    np.testing.assert_array_equal(batch.a, [1, 2, 3])
    np.testing.assert_array_equal(batch.new_key, [4, 5, 6])
    np.testing.assert_array_equal(batch.b, [7, 8, 9])
    with pytest.raises(ValueError):
        batch.set_array_at_key(np.array([1, 2]), "a")
    batch.set_array_at_key(np.array([1, 2]), "a", index=[0, 1])
    np.testing.assert_array_equal(batch.a, [1, 2, 3])
    batch.set_array_at_key(np.array([1, 2]), "a", index=[2, 0])
    np.testing.assert_array_equal(batch.a, [2, 2, 1])
    with pytest.raises(IndexError):
        batch.set_array_at_key(np.array([1, 2]), "a", index=[10, 11])
    # new key with default fill
    batch.set_array_at_key(np.array([1, 2]), "nk", index=[0, 1], default_value=0)
    np.testing.assert_array_equal(batch.nk, [1, 2, 0])
    batch.set_array_at_key(np.array([1.0, 2.0]), "nk2", index=[0, 1])
    assert np.isnan(batch.nk2[2])
    # jax-array target takes the functional path
    jb = Batch(a=jnp.arange(3))
    jb.set_array_at_key(np.array([7, 8]), "a", index=[0, 2])
    np.testing.assert_array_equal(np.asarray(jb.a), [7, 1, 8])


def test_row_iteration_and_to_list_of_dicts():
    # reference batch.py:761 iterates rows, not keys
    b = Batch(a=np.arange(3), n=Batch(x=np.arange(6).reshape(3, 2)))
    rows = list(b)
    assert len(rows) == 3
    assert float(rows[1].a) == 1.0
    np.testing.assert_array_equal(rows[2].n.x, [4, 5])
    lod = b.to_list_of_dicts()
    assert isinstance(lod, list) and len(lod) == 3 and float(lod[0]["a"]) == 0.0


def test_batch_arithmetic():
    # reference test_batch.py / batch.py:795-844
    b = Batch(a=np.array([1.0, 2.0]), n=Batch(x=jnp.array([3.0, 4.0])))
    s = b + b
    np.testing.assert_allclose(np.asarray(s.a), [2.0, 4.0])
    np.testing.assert_allclose(np.asarray(s.n.x), [6.0, 8.0])
    m = b * 2.0
    np.testing.assert_allclose(np.asarray(m.a), [2.0, 4.0])
    d = b / 2.0
    np.testing.assert_allclose(np.asarray(d.n.x), [1.5, 2.0])
    b += b
    np.testing.assert_allclose(np.asarray(b.a), [2.0, 4.0])
    b *= 0.5
    b /= 1.0
    np.testing.assert_allclose(np.asarray(b.a), [1.0, 2.0])
    with pytest.raises(ValueError):
        Batch(a=np.ones(2)) + Batch(b=np.ones(2))
    with pytest.raises(TypeError):
        Batch(a=np.ones(2)) + "nope"


def test_mean_and_standard_compat():
    # reference test_batch.py:489-497
    batch = Batch(a=np.array([[1.0, 2.0], [3.0, 4.0]]), b=Batch(), c=np.array([5.0, 6.0]))
    bm = np.mean(batch)
    assert isinstance(bm, Batch)
    np.testing.assert_allclose(np.asarray(bm.a), np.mean(batch.a, axis=0))
    assert float(bm.c) == 5.5


def test_to_at_least_2d_and_transform():
    b = Batch(a=np.array(1.0), n=Batch(x=jnp.array([1.0, 2.0])))
    b2 = b.to_at_least_2d()
    assert b2.a.shape == (1, 1)
    assert b2.n.x.shape == (1, 2)
    tr = b.apply_values_transform(lambda x: x * 0)
    assert float(np.asarray(tr.n.x).sum()) == 0.0
    b.apply_values_transform(lambda x: x + 1, inplace=True)
    assert float(b.a) == 2.0


def test_to_numpy_and_to_jax_inplace():
    b = Batch(a=jnp.ones(3))
    b.to_numpy_()
    assert isinstance(b.a, np.ndarray)
    b.to_jax_()
    assert isinstance(b.a, jax.Array)
