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
    with pytest.raises(ValueError):
        Batch.cat([Batch(a=np.ones(2)), Batch(b=np.ones(2))])


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
    b = Batch(info=np.array([{"k": 1}, {"k": 2}], dtype=object))
    assert b.info[0]["k"] == 1
    with pytest.raises(TypeError):
        b.to_jax()


def test_isnull_dropnull():
    b = Batch(a=np.array([1.0, np.nan, 3.0]), n=Batch(x=np.array([[1.0, 2], [3, 4], [np.nan, 6]])))
    mask = b.isnull()
    np.testing.assert_array_equal(np.asarray(mask.a), [False, True, False])
    kept = b.dropnull()
    assert len(kept) == 1
    assert float(kept.a[0]) == 1.0
