"""Pallas TPU kernel for prioritized-replay prefix-sum sampling.

The XLA segment tree (``ops/segtree.py``) performs the binary descent as
log2(N) dependent dynamic-gathers from HBM. This kernel keeps the ENTIRE
tree in VMEM for the whole descent and replaces each per-query gather with a
one-hot contraction on the MXU (TPU has no fast vector-gather; a
[B, 2N] x [2N, 1] matmul is the native idiom). Work goes from O(B log N)
serial gathers to O(B·N) vector ops with the tree pinned in VMEM.

Measured verdict (v5e, 8k leaves, 1024 queries, amortized inside one jit):
the exact masked-reduction variant below runs 414us vs 255us for XLA's
fused gather descent, and the faster MXU one-hot-matmul variant (~190us) is
not bit-exact in fp32 (boundary descents flip). XLA therefore remains the
default path; this kernel is kept as the opt-in Pallas implementation and
as the scaffold for a future int32-fixed-point matmul variant that would be
both exact and MXU-fast.

All arrays are kept >= 2-D (column vectors) — Mosaic rejects rank-1 layouts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_prefix_sum_idx", "PALLAS_MAX_BOUND"]

PALLAS_MAX_BOUND = 16384  # 2*bound fp32 = 128 KiB tree in VMEM
_LANE = 128


def _kernel(tree_ref, val_ref, out_ref, *, depth: int, bound: int, bq: int):
    """One grid step processes a [bq, 1] column of queries."""
    tree_col = tree_ref[:, :]          # [2*bound, 1] in VMEM
    vals = val_ref[:, :]               # [bq, 1]
    idx = jnp.ones((bq, 1), jnp.int32)  # heap position, root = 1

    tree_row = tree_col.reshape(1, 2 * bound)

    def level(l, carry):
        idx, vals = carry
        pos = 2 * idx                                   # [bq, 1]
        cols = jax.lax.broadcasted_iota(jnp.int32, (bq, 2 * bound), 1)
        # exact bit-identical select: masked VPU reduction (an MXU one-hot
        # matmul is ~25% faster but fp32 contraction is not bit-exact and
        # flips boundary descents)
        left = jnp.sum(jnp.where(cols == pos, tree_row, 0.0), axis=1, keepdims=True)
        go_right = left < vals
        vals = jnp.where(go_right, vals - left, vals)
        idx = pos + go_right.astype(jnp.int32)
        return idx, vals

    idx, _ = jax.lax.fori_loop(0, depth, level, (idx, vals))
    out_ref[:, :] = idx - bound


@functools.partial(jax.jit, static_argnames=("bound", "depth", "interpret"))
def pallas_prefix_sum_idx(
    tree: jnp.ndarray,
    values: jnp.ndarray,
    bound: int,
    depth: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched descent: largest i with prefix_sum(i) <= value."""
    B = values.shape[0]
    bq = min(512, max(_LANE, B))
    bq = int(np.ceil(bq / _LANE) * _LANE)
    Bp = int(np.ceil(B / bq) * bq)
    vals_p = jnp.zeros((Bp, 1), jnp.float32).at[:B, 0].set(values.astype(jnp.float32))
    grid = Bp // bq

    out = pl.pallas_call(
        functools.partial(_kernel, depth=depth, bound=bound, bq=bq),
        out_shape=jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((2 * bound, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bq, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tree[:, None], vals_p)
    return jnp.minimum(out[:B, 0], bound - 1)
