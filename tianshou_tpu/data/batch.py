"""Batch: the core pytree data carrier.

TPU-native rebuild of the reference's ``tianshou/data/batch.py:625`` ``Batch``
(a recursive dict-of-arrays). Differences by design:

- Registered as a JAX pytree, so a Batch flows through ``jit`` / ``vmap`` /
  ``lax.scan`` / ``pjit`` unchanged. Keys are static treedef metadata; values
  are leaves (jnp/np arrays or nested Batch).
- No torch. Conversion targets are jax (device) and numpy (host).
- Device path requires fixed shapes/dtypes; object arrays are allowed only on
  the host path (gym ``info`` dicts) and never cross into jit.

API parity (reference file:line cited per method): attribute access, nested
key access, ``cat``/``stack``/``split`` (batch.py:976,1041,1199), slicing and
integer indexing, ``to_numpy``/``to_jax`` converters (data/utils/converter.py),
``hasnull``/``dropnull`` (batch.py:1294-1325).
"""

from __future__ import annotations

import pprint
from collections.abc import Iterator, KeysView, ItemsView, ValuesView
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Batch"]

_ARRAY_TYPES = (np.ndarray, jax.Array)


def _is_array_like(v: Any) -> bool:
    return isinstance(v, _ARRAY_TYPES) or np.isscalar(v) or isinstance(v, (list, tuple))


def _convert_value(v: Any) -> Any:
    """Normalize an input value into an array, nested Batch, or passthrough."""
    if isinstance(v, Batch):
        return v
    if isinstance(v, dict):
        return Batch(v)
    if isinstance(v, _ARRAY_TYPES):
        return v
    if isinstance(v, np.generic):  # numpy scalars -> 0-d arrays
        return np.asarray(v)
    if hasattr(v, "shape") and hasattr(v, "dtype"):  # tracers, ShapeDtypeStruct, etc.
        return v
    if isinstance(v, (list, tuple)):
        # list of dict/Batch -> stacked Batch, mirroring reference behavior
        if len(v) > 0 and all(isinstance(e, (dict, Batch)) for e in v):
            return Batch.stack([Batch(e) if isinstance(e, dict) else e for e in v])
        arr = np.asarray(v)
        return arr
    if np.isscalar(v) or v is None:
        return np.asarray(v)
    # fall back to object array (host-only payloads, e.g. graph obs)
    arr = np.empty((), dtype=object)
    arr[()] = v
    return arr


class Batch:
    """Recursive dict of arrays with attribute access; a registered pytree."""

    __slots__ = ("_d",)

    def __init__(self, _input: dict | "Batch" | Sequence | None = None, **kwargs: Any) -> None:
        d: dict[str, Any] = {}
        object.__setattr__(self, "_d", d)
        if _input is not None:
            if isinstance(_input, Batch):
                for k, v in _input.items():
                    d[k] = v
            elif isinstance(_input, dict):
                for k, v in _input.items():
                    d[k] = _convert_value(v)
            elif isinstance(_input, (list, tuple)):
                b = _convert_value(list(_input))
                if isinstance(b, Batch):
                    d.update(b._d)
                else:
                    raise TypeError(f"cannot construct Batch from {type(_input)}")
            else:
                raise TypeError(f"cannot construct Batch from {type(_input)}")
        for k, v in kwargs.items():
            d[k] = _convert_value(v)

    # ---------------- dict protocol ----------------
    def keys(self) -> KeysView:
        return self._d.keys()

    def values(self) -> ValuesView:
        return self._d.values()

    def items(self) -> ItemsView:
        return self._d.items()

    def get(self, key: str, default: Any = None) -> Any:
        return self._d.get(key, default)

    def pop(self, key: str, *default: Any) -> Any:
        return self._d.pop(key, *default)

    def update(self, other: "Batch" | dict | None = None, **kwargs: Any) -> None:
        if other is not None:
            items = other.items() if isinstance(other, (Batch, dict)) else other
            for k, v in items:
                self._d[k] = _convert_value(v)
        for k, v in kwargs.items():
            self._d[k] = _convert_value(v)

    def __contains__(self, key: str) -> bool:
        return key in self._d

    def __iter__(self) -> Iterator[str]:
        return iter(self._d)

    # ---------------- attribute access ----------------
    def __getattr__(self, key: str) -> Any:
        try:
            return object.__getattribute__(self, "_d")[key]
        except KeyError:
            raise AttributeError(f"Batch has no key {key!r}") from None

    def __setattr__(self, key: str, value: Any) -> None:
        self._d[key] = _convert_value(value)

    def __delattr__(self, key: str) -> None:
        try:
            del self._d[key]
        except KeyError:
            raise AttributeError(key) from None

    # ---------------- item access ----------------
    def __getitem__(self, index: Any) -> Any:
        if isinstance(index, str):
            return self._d[index]
        # index applies to every leaf (reference batch.py:706)
        if len(self._d) == 0:
            raise IndexError("cannot index an empty Batch")
        out = Batch()
        for k, v in self._d.items():
            out._d[k] = v[index]
        return out

    def __setitem__(self, index: Any, value: Any) -> None:
        if isinstance(index, str):
            self._d[index] = _convert_value(value)
            return
        if not isinstance(value, (Batch, dict)):
            raise TypeError("sliced assignment requires a Batch/dict value")
        value = Batch(value) if isinstance(value, dict) else value
        for k, v in value.items():
            tgt = self._d[k]
            if isinstance(tgt, Batch):
                tgt[index] = v
            elif isinstance(tgt, np.ndarray):
                tgt[index] = np.asarray(v)
            else:  # jax array: functional update
                self._d[k] = tgt.at[index].set(v)

    def __delitem__(self, key: str) -> None:
        del self._d[key]

    # ---------------- shape / len ----------------
    def __len__(self) -> int:
        lens = []
        for v in self._d.values():
            if isinstance(v, Batch):
                if len(v._d) == 0:
                    continue
                lens.append(len(v))
            elif hasattr(v, "shape") and len(v.shape) > 0:
                lens.append(v.shape[0])
            else:
                raise TypeError(f"0-d entry prevents len(): {v!r}")
        if not lens:
            raise TypeError("empty Batch has no len()")
        return min(lens)

    @property
    def shape(self) -> list[int]:
        shapes = []
        for v in self._d.values():
            if isinstance(v, Batch):
                if len(v._d) == 0:
                    continue
                shapes.append(v.shape)
            else:
                shapes.append(list(v.shape))
        if not shapes:
            return []
        n = min(len(s) for s in shapes)
        return [min(s[i] for s in shapes) for i in range(n)]

    def is_empty(self, recurse: bool = False) -> bool:
        if len(self._d) == 0:
            return True
        if not recurse:
            return False
        return all(isinstance(v, Batch) and v.is_empty(True) for v in self._d.values())

    # ---------------- conversion ----------------
    def to_numpy(self) -> "Batch":
        return jax.tree.map(lambda x: np.asarray(x), self)

    def to_jax(self, dtype_map: dict | None = None, device: Any = None) -> "Batch":
        def conv(x: Any) -> Any:
            if isinstance(x, np.ndarray) and x.dtype == object:
                raise TypeError("object arrays cannot be moved to device")
            arr = jnp.asarray(x)
            if dtype_map is not None and arr.dtype in dtype_map:
                arr = arr.astype(dtype_map[arr.dtype])
            if device is not None:
                arr = jax.device_put(arr, device)
            return arr
        return jax.tree.map(conv, self)

    def to_dict(self, recurse: bool = True) -> dict:
        return {
            k: (v.to_dict() if recurse and isinstance(v, Batch) else v)
            for k, v in self._d.items()
        }

    def copy(self) -> "Batch":
        """Shallow-structure copy (arrays shared; nested Batches copied)."""
        out = Batch()
        for k, v in self._d.items():
            out._d[k] = v.copy() if isinstance(v, Batch) else v
        return out

    # ---------------- composition ----------------
    @staticmethod
    def cat(batches: Sequence["Batch"], axis: int = 0) -> "Batch":
        """Concatenate along axis (reference batch.py:976)."""
        batches = [b for b in batches if isinstance(b, Batch) and len(b._d) > 0]
        if not batches:
            return Batch()
        keys = list(batches[0]._d.keys())
        for b in batches[1:]:
            if list(b._d.keys()) != keys:
                raise ValueError(
                    f"cat requires identical keys, got {keys} vs {list(b._d.keys())}"
                )
        out = Batch()
        for k in keys:
            vals = [b._d[k] for b in batches]
            if isinstance(vals[0], Batch):
                out._d[k] = Batch.cat(vals, axis=axis)
            elif isinstance(vals[0], jax.Array):
                out._d[k] = jnp.concatenate(vals, axis=axis)
            else:
                out._d[k] = np.concatenate(vals, axis=axis)
        return out

    def cat_(self, other: "Batch") -> None:
        merged = Batch.cat([self, other])
        self._d.clear()
        self._d.update(merged._d)

    @staticmethod
    def stack(batches: Sequence["Batch"], axis: int = 0) -> "Batch":
        """Stack along a new axis (reference batch.py:1041)."""
        batches = [Batch(b) if isinstance(b, dict) else b for b in batches]
        if not batches:
            return Batch()
        keys = list(batches[0]._d.keys())
        out = Batch()
        for k in keys:
            vals = [b._d[k] for b in batches]
            if isinstance(vals[0], Batch):
                out._d[k] = Batch.stack(vals, axis=axis)
            elif isinstance(vals[0], jax.Array):
                out._d[k] = jnp.stack(vals, axis=axis)
            else:
                out._d[k] = np.stack(vals, axis=axis)
        return out

    def split(
        self,
        size: int,
        shuffle: bool = True,
        merge_last: bool = False,
        rng: np.random.Generator | None = None,
    ) -> Iterator["Batch"]:
        """Split into mini-batches of at most ``size`` (reference batch.py:1199)."""
        length = len(self)
        if size == 0:
            size = length
        assert size > 0
        indices = np.arange(length)
        if shuffle:
            (rng or np.random.default_rng()).shuffle(indices)
        merge_last = merge_last and length % size > 0
        for idx in range(0, length, size):
            if merge_last and idx + size + size >= length:
                yield self[indices[idx:]]
                break
            yield self[indices[idx : idx + size]]

    # ---------------- null handling (reference batch.py:1294-1325) --------
    @staticmethod
    def _leaf_nan_mask(x: Any):
        if isinstance(x, np.ndarray) and x.dtype == object:
            return None
        dtype = np.asarray(x).dtype if isinstance(x, np.ndarray) else x.dtype
        if jnp.issubdtype(dtype, jnp.floating):
            return jnp.isnan(x)
        return None

    def hasnull(self) -> bool:
        for x in jax.tree.leaves(self):
            m = self._leaf_nan_mask(x)
            if m is not None and bool(m.any()):
                return True
        return False

    def isnull(self) -> "Batch":
        """Elementwise NaN mask per leaf (reference batch.py:1294)."""
        def f(x):
            m = self._leaf_nan_mask(x)
            return jnp.zeros(jnp.shape(x), bool) if m is None else m
        return jax.tree.map(f, self)

    def dropnull(self) -> "Batch":
        """Drop rows where ANY leaf has a NaN (reference batch.py:1325)."""
        n = len(self)
        bad = np.zeros(n, bool)
        for x in jax.tree.leaves(self):
            m = self._leaf_nan_mask(x)
            if m is not None:
                arr = np.asarray(m)
                bad |= arr.reshape(n, -1).any(axis=1)
        return self[np.where(~bad)[0]]

    # ---------------- misc ----------------
    def __eq__(self, other: Any) -> bool:
        if not isinstance(other, Batch):
            return False
        if set(self._d.keys()) != set(other._d.keys()):
            return False
        for k, v in self._d.items():
            w = other._d[k]
            if isinstance(v, Batch) != isinstance(w, Batch):
                return False
            if isinstance(v, Batch):
                if v != w:
                    return False
            else:
                va, wa = np.asarray(v), np.asarray(w)
                if va.shape != wa.shape or va.dtype != wa.dtype:
                    return False
                if va.dtype == object:
                    if not all(x == y for x, y in zip(va.flat, wa.flat)):
                        return False
                elif not np.allclose(va, wa, equal_nan=True):
                    return False
        return True

    def __repr__(self) -> str:
        items = []
        for k, v in self._d.items():
            if isinstance(v, Batch):
                items.append(f"{k}: {v!r}")
            else:
                items.append(f"{k}: {type(v).__name__}{tuple(v.shape)}:{v.dtype}")
        inner = ",\n    ".join(items)
        return f"Batch(\n    {inner},\n)" if items else "Batch()"

    def pprint(self) -> None:
        pprint.pprint(self.to_dict())

    # support copy.deepcopy / pickle through the dict
    def __getstate__(self) -> dict:
        return {"_d": self.to_dict(recurse=True)}

    def __setstate__(self, state: dict) -> None:
        object.__setattr__(self, "_d", {})
        self.update(state["_d"])


# ---------------- pytree registration ----------------

def _batch_flatten(b: Batch):
    keys = tuple(b._d.keys())
    return tuple(b._d[k] for k in keys), keys


def _batch_flatten_with_keys(b: Batch):
    keys = tuple(b._d.keys())
    return tuple((jax.tree_util.DictKey(k), b._d[k]) for k in keys), keys


def _batch_unflatten(keys, children) -> Batch:
    b = Batch()
    for k, v in zip(keys, children):
        b._d[k] = v
    return b


jax.tree_util.register_pytree_with_keys(
    Batch, _batch_flatten_with_keys, _batch_unflatten, _batch_flatten
)
