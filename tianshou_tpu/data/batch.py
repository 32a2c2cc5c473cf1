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

__all__ = ["Batch", "create_value", "alloc_by_keys_diff"]

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
        # object array of dicts (e.g. vectorized gym infos) -> stacked Batch
        # with union keys + zero fill (reference test_batch.py:282-288)
        if (
            isinstance(v, np.ndarray)
            and v.dtype == object
            and v.ndim == 1
            and len(v) > 0
            and all(isinstance(e, (dict, Batch)) for e in v)
        ):
            return Batch.stack([Batch(e) if isinstance(e, dict) else e for e in v])
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
            elif isinstance(_input, (list, tuple, np.ndarray)):
                b = _convert_value(list(np.asarray(_input).ravel()) if isinstance(_input, np.ndarray) else list(_input))
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

    def __iter__(self) -> Iterator["Batch"]:
        """Iterate over ROWS (leading-axis slices), matching the reference
        (batch.py:761) — NOT over keys like a dict."""
        for i in range(len(self)):
            yield self[i]

    def get_keys(self) -> KeysView:
        """Alias matching the reference API (batch.py:524)."""
        return self._d.keys()

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
                if v.is_empty(recurse=True):
                    continue  # recursively-empty sub-batches carry no length
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

    def to_numpy_(self) -> None:
        """In-place host transfer (reference batch.py:385)."""
        conv = self.to_numpy()
        self._d.clear()
        self._d.update(conv._d)

    def to_jax_(self, dtype_map: dict | None = None, device: Any = None) -> None:
        """In-place device transfer — the reference's ``to_torch_`` analogue."""
        conv = self.to_jax(dtype_map=dtype_map, device=device)
        self._d.clear()
        self._d.update(conv._d)

    def to_dict(self, recurse: bool = True) -> dict:
        return {
            k: (v.to_dict() if recurse and isinstance(v, Batch) else v)
            for k, v in self._d.items()
        }

    def to_list_of_dicts(self) -> list[dict]:
        """Row-wise dicts (reference batch.py:521)."""
        return [row.to_dict() for row in self]

    def copy(self) -> "Batch":
        """Shallow-structure copy (arrays shared; nested Batches copied)."""
        out = Batch()
        for k, v in self._d.items():
            out._d[k] = v.copy() if isinstance(v, Batch) else v
        return out

    # ---------------- composition ----------------
    @staticmethod
    def _as_batches(batches: Sequence) -> list["Batch"]:
        out = []
        for b in batches:
            if isinstance(b, dict):
                out.append(Batch(b))
            elif isinstance(b, Batch):
                out.append(b)
            else:
                raise ValueError(f"cat/stack elements must be Batch or dict, got {type(b)}")
        return out

    @staticmethod
    def _recursively_empty(b: "Batch") -> bool:
        return all(
            isinstance(v, Batch) and Batch._recursively_empty(v) for v in b._d.values()
        )

    @staticmethod
    def _try_len(b: "Batch") -> int:
        """Length of a Batch for cat padding; 0 for recursively-empty
        batches (they contribute nothing, reference test_batch.py:244);
        -1 when genuinely undeterminable (e.g. only 0-d values —
        reference cat_ raises for mixed keys there, batch.py:976)."""
        try:
            return len(b)
        except TypeError:
            return 0 if Batch._recursively_empty(b) else -1

    @staticmethod
    def _is_empty_val(v: Any) -> bool:
        return isinstance(v, Batch) and len(v._d) == 0

    @staticmethod
    def cat(batches: Sequence["Batch"], axis: int = 0) -> "Batch":
        """Concatenate along axis (reference batch.py:976).

        Keys missing in some inputs (or present as empty ``Batch()``) are
        zero-padded with that input's inferred length (reference's lens
        inference in ``cat_``); raises ValueError when the pad shape cannot
        be inferred (e.g. 0-d values)."""
        batches = Batch._as_batches(batches)
        batches = [b for b in batches if len(b._d) > 0]
        if not batches:
            return Batch()
        lens = [Batch._try_len(b) for b in batches]
        return Batch._cat_lens(batches, lens, axis)

    @staticmethod
    def _cat_lens(batches: list["Batch"], lens: list[int], axis: int) -> "Batch":
        keys: list[str] = []
        for b in batches:
            for k in b._d:
                if k not in keys:
                    keys.append(k)
        out = Batch()
        for k in keys:
            vals = [b._d.get(k) for b in batches]
            present = [v for v in vals if v is not None and not Batch._is_empty_val(v)]
            if not present:
                out._d[k] = Batch()
                continue
            if isinstance(present[0], Batch):
                subs = [v if isinstance(v, Batch) else Batch() for v in vals]
                if any(not isinstance(v, Batch) for v in present):
                    raise ValueError(f"cat: key {k!r} mixes Batch and array values")
                out._d[k] = Batch._cat_lens(subs, lens, axis)
                continue
            proto = present[0]
            if proto.ndim == 0:
                raise ValueError(f"cat: key {k!r} holds 0-d values; cannot concatenate")
            parts = []
            for v, b, n in zip(vals, batches, lens):
                if v is None or Batch._is_empty_val(v):
                    if n < 0:
                        raise ValueError(
                            f"cat: key {k!r} is missing in a batch whose length "
                            "cannot be inferred; cannot zero-pad (reference "
                            "raises for mixed keys with undeterminable length)"
                        )
                    if n > 0 and axis != 0:
                        raise ValueError(
                            f"cat: missing-key zero-padding is only defined for "
                            f"axis=0, got axis={axis} for key {k!r}"
                        )
                    if n > 0:
                        pad_shape = (n,) + tuple(proto.shape[1:])
                        parts.append(
                            jnp.zeros(pad_shape, proto.dtype)
                            if isinstance(proto, jax.Array)
                            else np.zeros(pad_shape, proto.dtype)
                        )
                    # n == 0: contributes nothing
                else:
                    parts.append(v)
            out._d[k] = (
                jnp.concatenate(parts, axis=axis)
                if any(isinstance(p, jax.Array) for p in parts)
                else np.concatenate(parts, axis=axis)
            )
        return out

    def cat_(self, other: "Batch" | Sequence["Batch"]) -> None:
        others = [other] if isinstance(other, (Batch, dict)) else list(other)
        merged = Batch.cat([self, *others])
        self._d.clear()
        self._d.update(merged._d)

    @staticmethod
    def stack(batches: Sequence["Batch"], axis: int = 0) -> "Batch":
        """Stack along a new axis (reference batch.py:1041).

        Keys missing in some inputs (or empty ``Batch()``) are zero-filled —
        only valid at ``axis=0`` (reference raises otherwise)."""
        batches = Batch._as_batches(batches)
        batches = [b for b in batches if len(b._d) > 0]
        if not batches:
            return Batch()
        keys: list[str] = []
        for b in batches:
            for k in b._d:
                if k not in keys:
                    keys.append(k)
        out = Batch()
        for k in keys:
            vals = [b._d.get(k) for b in batches]
            present = [v for v in vals if v is not None and not Batch._is_empty_val(v)]
            if not present:
                out._d[k] = Batch()
                continue
            if isinstance(present[0], Batch):
                if any(not isinstance(v, Batch) for v in present):
                    raise ValueError(f"stack: key {k!r} mixes Batch and array values")
                subs = [v if isinstance(v, Batch) else Batch() for v in vals]
                out._d[k] = Batch.stack(subs, axis=axis)
                continue
            if len(present) < len(vals):
                if axis != 0:
                    raise ValueError(
                        f"stack: key {k!r} is missing in some inputs; "
                        "zero-fill is only supported at axis=0"
                    )
                proto = present[0]
                zero = (
                    jnp.zeros(proto.shape, proto.dtype)
                    if isinstance(proto, jax.Array)
                    else np.zeros(proto.shape, proto.dtype)
                )
                vals = [zero if v is None or Batch._is_empty_val(v) else v for v in vals]
            out._d[k] = (
                jnp.stack(vals, axis=axis)
                if any(isinstance(p, jax.Array) for p in vals)
                else np.stack(vals, axis=axis)
            )
        return out

    def stack_(self, others: Sequence["Batch"], axis: int = 0) -> None:
        """In-place stack (reference batch.py:429)."""
        merged = Batch.stack([self, *others], axis=axis)
        self._d.clear()
        self._d.update(merged._d)

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

    # ---------------- row clearing (reference batch.py:458-492) ----------
    def empty_(self, index: Any = None) -> "Batch":
        """Zero out rows at ``index`` (all rows if None) in place: numeric →
        0, bool → False, object → None (reference batch.py:458)."""
        for k, v in self._d.items():
            if isinstance(v, Batch):
                v.empty_(index)
            elif isinstance(v, np.ndarray):
                idx = ... if index is None else index
                v[idx] = None if v.dtype == object else 0
            else:  # jax array: functional update
                if index is None:
                    self._d[k] = jnp.zeros_like(v)
                else:
                    idx = np.asarray(index) if isinstance(index, (list, tuple)) else index
                    self._d[k] = v.at[idx].set(0)
        return self

    @staticmethod
    def empty(batch: "Batch", index: Any = None) -> "Batch":
        """Copy of ``batch`` with rows at ``index`` zeroed (batch.py:486)."""
        import copy as _copy

        return _copy.deepcopy(batch).empty_(index)

    # ---------------- keyed array assignment (reference batch.py:527) ----
    def set_array_at_key(
        self,
        seq: Any,
        key: str,
        index: Any = None,
        default_value: Any = None,
    ) -> None:
        """Assign ``seq`` at ``key`` (optionally only at row ``index``).

        A missing key is created full-length, filled with ``default_value``
        (NaN for float when None — reference batch.py:527-549)."""
        seq = np.asarray(seq) if not isinstance(seq, _ARRAY_TYPES) else seq
        if index is None:
            if key in self._d:
                cur = self._d[key]
                if hasattr(cur, "shape") and len(cur.shape) > 0 and len(seq) != cur.shape[0]:
                    raise ValueError(
                        f"set_array_at_key: length {len(seq)} != existing {cur.shape[0]}"
                    )
            self._d[key] = seq
            return
        n = len(self)
        idx_arr = np.asarray(index)
        if idx_arr.dtype != bool and idx_arr.size and int(np.max(idx_arr)) >= n:
            raise IndexError(f"set_array_at_key: index out of bounds for length {n}")
        if key not in self._d:
            if default_value is None and np.issubdtype(seq.dtype, np.floating):
                fill = np.full((n,) + tuple(seq.shape[1:]), np.nan, seq.dtype)
            else:
                fill = np.full(
                    (n,) + tuple(seq.shape[1:]),
                    0 if default_value is None else default_value,
                    seq.dtype,
                )
            self._d[key] = fill
        tgt = self._d[key]
        if isinstance(tgt, np.ndarray):
            tgt[index] = np.asarray(seq)
        else:
            jdx = np.asarray(index) if isinstance(index, (list, tuple)) else index
            self._d[key] = tgt.at[jdx].set(seq)

    # ---------------- value transforms (reference batch.py:578-628) ------
    def apply_values_transform(self, values_transform, inplace: bool = False):
        """Apply ``values_transform`` to every array leaf (recursing into
        nested Batches — reference batch.py:578)."""
        if inplace:
            for k, v in self._d.items():
                if isinstance(v, Batch):
                    v.apply_values_transform(values_transform, inplace=True)
                else:
                    self._d[k] = values_transform(v)
            return None
        out = Batch()
        for k, v in self._d.items():
            out._d[k] = (
                v.apply_values_transform(values_transform)
                if isinstance(v, Batch)
                else values_transform(v)
            )
        return out

    def to_at_least_2d(self) -> "Batch":
        """Promote every leaf to >=2 dims (reference batch.py:616)."""
        return self.apply_values_transform(
            lambda x: jnp.atleast_2d(x) if isinstance(x, jax.Array) else np.atleast_2d(x)
        )

    def mean(self, axis: Any = None, dtype: Any = None, out: Any = None, **kw) -> "Batch":
        """Per-leaf mean over the leading axis; makes ``np.mean(batch)``
        return a Batch like the reference (test_batch.py:489-497)."""
        return self.apply_values_transform(lambda x: x.mean(axis=0))

    # ---------------- arithmetic (reference batch.py:795-844) ------------
    def _binary_op(self, other: Any, op) -> "Batch":
        out = Batch()
        if isinstance(other, Batch):
            if set(self._d.keys()) != set(other._d.keys()):
                raise ValueError("arithmetic requires identical keys")
            for k, v in self._d.items():
                w = other._d[k]
                out._d[k] = v._binary_op(w, op) if isinstance(v, Batch) else op(v, w)
            return out
        if not np.isscalar(other) and not isinstance(other, np.number):
            raise TypeError(f"unsupported operand type {type(other)}")
        for k, v in self._d.items():
            out._d[k] = v._binary_op(other, op) if isinstance(v, Batch) else op(v, other)
        return out

    def __add__(self, other: Any) -> "Batch":
        return self._binary_op(other, lambda a, b: a + b)

    def __iadd__(self, other: Any) -> "Batch":
        res = self + other
        self._d.clear()
        self._d.update(res._d)
        return self

    def __mul__(self, value: Any) -> "Batch":
        return self._binary_op(value, lambda a, b: a * b)

    def __imul__(self, value: Any) -> "Batch":
        res = self * value
        self._d.clear()
        self._d.update(res._d)
        return self

    def __truediv__(self, value: Any) -> "Batch":
        return self._binary_op(value, lambda a, b: a / b)

    def __itruediv__(self, value: Any) -> "Batch":
        res = self / value
        self._d.clear()
        self._d.update(res._d)
        return self

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

def create_value(inst: Any, size: int, stack: bool = True) -> Any:
    """Allocate a zeroed container shaped for ``size`` rows of ``inst``
    (reference batch.py ``create_value``:147): with ``stack=True`` the rows
    are ``inst``-shaped (``(size, *inst.shape)``); with ``stack=False``
    ``inst`` already carries a leading batch dim that ``size`` replaces.
    Batches recurse per key."""
    if isinstance(inst, Batch):
        out = Batch()
        for k, v in inst.items():
            out[k] = create_value(v, size, stack)
        return out
    arr = jnp.asarray(inst) if isinstance(inst, jax.Array) else np.asarray(inst)
    shape = (size, *arr.shape) if stack else (size, *arr.shape[1:])
    zeros = jnp.zeros if isinstance(inst, jax.Array) else np.zeros
    dtype = arr.dtype if arr.dtype != object else None
    return zeros(shape, dtype)


def alloc_by_keys_diff(meta: Batch, batch: Batch, size: int, stack: bool = True) -> None:
    """Create placeholders inside ``meta`` for keys present in ``batch`` but
    not in ``meta`` (reference batch.py ``alloc_by_keys_diff``:230, used by
    the reference buffer to grow ``_meta`` on first add of a new key)."""
    for key in batch.keys():
        if key in meta.keys():
            mv, bv = meta[key], batch[key]
            if isinstance(mv, Batch) and isinstance(bv, Batch):
                if len(mv.keys()) == 0:
                    meta[key] = create_value(bv, size, stack)
                else:
                    alloc_by_keys_diff(mv, bv, size, stack)
        else:
            meta[key] = create_value(batch[key], size, stack)


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
