"""Behavioral parity battery for ``Batch`` vs the reference's test corpus.

Ports the *behavioral contracts* of the reference's granular equality /
to_dict / assignment / nested-batch cases (reference
test/base/test_batch.py:187-945 — TestBatchEquality, TestBatchToDict,
TestAssignment, TestSlicing, test_batch_over_batch,
test_batch_standard_compatibility) onto the pytree Batch. No reference
code is copied; each test asserts this framework's documented semantics.
"""

import copy
import pickle

import jax.numpy as jnp
import numpy as np
import pytest

from tianshou_tpu.data.batch import Batch


# ---------------------------------------------------------------- equality
class TestEquality:
    def test_keys_different(self):
        a = Batch(a=np.zeros(3), b=np.ones(3))
        c = Batch(a=np.zeros(3), c=np.ones(3))
        assert a != c

    def test_keys_missing(self):
        a = Batch(a=np.zeros(3), b=np.ones(3))
        b = Batch(a=np.zeros(3))
        assert a != b
        assert b != a

    def test_value_node_types_different(self):
        # Batch-valued vs array-valued at the same key is never equal
        a = Batch(a=Batch(x=np.zeros(3)))
        b = Batch(a=np.zeros(3))
        assert a != b

    def test_array_dtypes_different(self):
        a = Batch(a=np.zeros(3, dtype=np.float32))
        b = Batch(a=np.zeros(3, dtype=np.float64))
        assert a != b

    def test_nested_values_different(self):
        a = Batch(n=Batch(x=np.arange(3)))
        b = Batch(n=Batch(x=np.arange(3) + 1))
        assert a != b

    def test_nested_shapes_different(self):
        a = Batch(n=Batch(x=np.zeros((3, 2))))
        b = Batch(n=Batch(x=np.zeros((3, 3))))
        assert a != b

    def test_equal_mixed_backends(self):
        # numpy vs jax leaves with the same values/dtype/shape compare equal
        a = Batch(a=np.arange(4, dtype=np.float32))
        b = Batch(a=jnp.arange(4, dtype=jnp.float32))
        assert a == b

    def test_nan_equal(self):
        a = Batch(a=np.array([1.0, np.nan]))
        b = Batch(a=np.array([1.0, np.nan]))
        assert a == b

    def test_slice_equal(self):
        base = Batch(a=np.arange(10), n=Batch(x=np.arange(20).reshape(10, 2)))
        assert base[2:5] == base[2:5]
        assert base[2:5] != base[3:6]

    def test_slice_ellipsis_equal(self):
        base = Batch(a=np.arange(12).reshape(3, 4))
        assert base[..., 1:] == base[..., 1:]

    def test_empty_batches_equal(self):
        assert Batch() == Batch()

    def test_different_key_order_equal(self):
        a = Batch(x=np.zeros(2), y=np.ones(2))
        b = Batch(y=np.ones(2), x=np.zeros(2))
        assert a == b

    def test_tuple_and_list_value_types_equal(self):
        a = Batch(a=[1, 2, 3])
        b = Batch(a=(1, 2, 3))
        assert a == b

    def test_subbatch_dict_and_batch_types_equal(self):
        a = Batch(n={"x": np.zeros(3)})
        b = Batch(n=Batch(x=np.zeros(3)))
        assert a == b

    def test_non_batch_rhs(self):
        assert Batch(a=np.zeros(3)) != {"a": np.zeros(3)}
        assert Batch(a=np.zeros(3)) != 0


# ---------------------------------------------------------------- to_dict
class TestToDict:
    def test_empty(self):
        assert Batch().to_dict() == {}
        assert Batch().to_dict(recurse=False) == {}

    def test_simple_values(self):
        b = Batch(a=np.arange(3))
        d = b.to_dict()
        assert set(d) == {"a"}
        assert isinstance(d["a"], np.ndarray)
        np.testing.assert_array_equal(d["a"], np.arange(3))

    def test_nested_no_recurse_keeps_batches(self):
        b = Batch(n=Batch(x=np.zeros(2)), a=np.ones(2))
        d = b.to_dict(recurse=False)
        assert isinstance(d["n"], Batch)
        assert isinstance(d["a"], np.ndarray)

    def test_nested_recurse_all_dicts(self):
        b = Batch(n=Batch(m=Batch(x=np.zeros(2)), y=np.ones(2)))
        d = b.to_dict()
        assert isinstance(d["n"], dict)
        assert isinstance(d["n"]["m"], dict)
        np.testing.assert_array_equal(d["n"]["m"]["x"], np.zeros(2))

    def test_arrays_not_copied(self):
        arr = np.arange(5)
        b = Batch(a=arr)
        assert b.to_dict()["a"] is b._d["a"]

    def test_roundtrip_through_constructor(self):
        b = Batch(n=Batch(x=np.arange(3)), a=np.ones(3))
        assert Batch(b.to_dict()) == b


# ------------------------------------------------------------- assignment
class TestAssignment:
    def test_assign_full_length_array(self):
        b = Batch(a=np.zeros(4))
        b.a = np.arange(4)
        np.testing.assert_array_equal(b.a, np.arange(4))

    def test_assign_subarray_existing_key(self):
        b = Batch(a=np.zeros(4), n=Batch(x=np.zeros((4, 2))))
        b[1:3] = Batch(a=np.ones(2), n=Batch(x=np.ones((2, 2))))
        np.testing.assert_array_equal(b.a, [0, 1, 1, 0])
        np.testing.assert_array_equal(b.n.x[1], [1, 1])
        np.testing.assert_array_equal(b.n.x[3], [0, 0])

    def test_assign_subarray_jax_leaf_functional(self):
        b = Batch(a=jnp.zeros(4))
        b[2] = Batch(a=5.0)
        np.testing.assert_array_equal(np.asarray(b.a), [0, 0, 5, 0])

    def test_assign_new_key_at_index_raises(self):
        b = Batch(a=np.zeros(4))
        with pytest.raises(KeyError):
            b[1:3] = Batch(zzz=np.ones(2))

    def test_sliced_assignment_requires_mapping(self):
        b = Batch(a=np.zeros(4))
        with pytest.raises(TypeError):
            b[1:3] = np.ones(2)

    def test_string_setitem_converts(self):
        b = Batch(a=np.zeros(2))
        b["c"] = [1, 2]
        assert isinstance(b.c, np.ndarray)

    def test_delitem_and_delattr(self):
        b = Batch(a=np.zeros(2), c=np.ones(2))
        del b["a"]
        assert "a" not in b
        del b.c
        assert "c" not in b


# ---------------------------------------------------------------- slicing
class TestSlicing:
    def test_getitem_with_int_gives_scalar_leaves(self):
        b = Batch(a=np.arange(4, dtype=np.float32), n=Batch(x=np.arange(8).reshape(4, 2)))
        row = b[1]
        assert np.ndim(row.a) == 0
        assert float(row.a) == 1.0
        assert row.n.x.shape == (2,)

    @pytest.mark.parametrize(
        "index",
        [slice(0, 2), np.array([0, 2]), [0, 2], np.array([True, False, True, False])],
    )
    def test_getitem_with_fancy_index(self, index):
        b = Batch(a=np.arange(4), n=Batch(x=np.arange(8).reshape(4, 2)))
        sub = b[index]
        np.testing.assert_array_equal(np.asarray(sub.a), np.arange(4)[index])
        np.testing.assert_array_equal(np.asarray(sub.n.x), np.arange(8).reshape(4, 2)[index])

    def test_negative_index(self):
        b = Batch(a=np.arange(4))
        assert float(b[-1].a) == 3.0

    def test_index_empty_batch_raises(self):
        with pytest.raises(IndexError):
            Batch()[0]


# ----------------------------------------------------- batch over batch
class TestBatchOverBatch:
    def test_nested_construction_and_access(self):
        b = Batch(info=Batch(env=Batch(t=np.arange(3))), obs=np.zeros((3, 2)))
        np.testing.assert_array_equal(b.info.env.t, np.arange(3))
        assert b["info"]["env"]["t"] is b.info.env.t

    def test_len_ignores_recursively_empty_subbatch(self):
        b = Batch(obs=np.zeros(5), info=Batch(empty=Batch()))
        assert len(b) == 5

    def test_len_is_min_over_leaves(self):
        b = Batch(a=np.zeros(5), n=Batch(x=np.zeros(3)))
        assert len(b) == 3

    def test_len_raises_on_scalar_leaf(self):
        b = Batch(a=np.float32(1.0))
        with pytest.raises(TypeError):
            len(b)

    def test_update_merges_nested(self):
        b = Batch(n=Batch(x=np.zeros(2)))
        b.update(Batch(n=Batch(x=np.ones(2)), y=np.arange(2)))
        np.testing.assert_array_equal(b.n.x, np.ones(2))
        np.testing.assert_array_equal(b.y, np.arange(2))

    def test_nested_arithmetic(self):
        b = Batch(n=Batch(x=np.ones(3)), a=np.full(3, 2.0))
        c = (b + b) * 2
        np.testing.assert_array_equal(c.n.x, np.full(3, 4.0))
        np.testing.assert_array_equal(c.a, np.full(3, 8.0))
        assert np.all(np.asarray((b / 2).a) == 1.0)

    def test_repr_of_deep_nesting(self):
        b = Batch(n=Batch(m=Batch(x=np.zeros((2, 2)))))
        r = repr(b)
        assert "n" in r and "m" in r and "x" in r

    def test_deepcopy_independent(self):
        b = Batch(n=Batch(x=np.zeros(3)))
        c = copy.deepcopy(b)
        c.n.x[0] = 7
        assert float(b.n.x[0]) == 0.0

    def test_pickle_deep_nested_mixed_backends(self):
        b = Batch(n=Batch(x=jnp.arange(3), m=Batch(y=np.ones(3))), a=np.zeros(3))
        c = pickle.loads(pickle.dumps(b))
        assert c == b


# -------------------------------------------------- standard compatibility
class TestStandardCompatibility:
    def test_row_iteration_matches_len(self):
        b = Batch(a=np.arange(4), n=Batch(x=np.zeros((4, 2))))
        rows = list(b)
        assert len(rows) == len(b) == 4
        assert float(rows[2].a) == 2.0

    def test_keys_values_items_views(self):
        b = Batch(a=np.zeros(2), c=np.ones(2))
        assert list(b.keys()) == ["a", "c"]
        assert len(list(b.values())) == 2
        assert dict(b.items()).keys() == {"a", "c"}

    def test_dict_unpacking(self):
        b = Batch(a=np.zeros(2), c=np.ones(2))
        d = dict(**b.to_dict())
        assert set(d) == {"a", "c"}

    def test_get_and_pop(self):
        b = Batch(a=np.zeros(2))
        assert b.get("missing") is None
        assert b.get("missing", 3) == 3
        v = b.pop("a")
        assert isinstance(v, np.ndarray) and "a" not in b
        with pytest.raises(KeyError):
            b.pop("a")
        assert b.pop("a", None) is None

    def test_contains(self):
        b = Batch(a=np.zeros(2))
        assert "a" in b and "z" not in b
