"""Small-matrix linear algebra, unrolled for TPU.

The physics substep solves tiny SPD systems (nq <= 23) batched over
thousands of envs. `jax.scipy.linalg.cho_factor/cho_solve` lower to the
LAPACK-style batched Cholesky path, which on TPU costs ~3 ms per call at
[2048, 9, 9] (measured, scripts/physics_stage_probe.py) — a third of the
whole substep. Since n is static and tiny, an unrolled trace-time loop of
batched elementwise ops (rank-1 updates, forward/back substitution) runs on
the VPU in native fp32 and fuses with its neighbours.

All functions operate on the LAST two axes and broadcast over leading batch
axes; everything is differentiable (plain jnp ops, no custom VJPs needed).

Matmul-shaped contractions over the tiny structural dims are expressed as
broadcast-multiply-reduce (`mulsum`) instead of einsum/dot_general: on TPU a
[.., 9] x [.., 9, 9] dot_general pads both contraction tiles to the MXU's
128-lane granularity (measured 2.5x slower than mul+reduce for the mass
matrix), and mul+reduce computes in true fp32 on the VPU, making the 6-pass
fp32 matmul emulation unnecessary.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["chol", "chol_solve", "spd_solve", "mulsum", "mv", "mm", "inv3"]


def mv(A: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Matrix-vector ``A @ x`` over the last two/one axes via mul+reduce."""
    return (A * x[..., None, :]).sum(-1)


def mm(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Matrix-matrix ``A @ B`` over the last two axes via mul+reduce."""
    return (A[..., :, :, None] * B[..., None, :, :]).sum(-2)


def inv3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of [..., 3, 3] via the adjugate (no LAPACK)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    adj = jnp.stack(
        [
            jnp.stack([co00, co01, co02], axis=-1),
            jnp.stack([co10, co11, co12], axis=-1),
            jnp.stack([co20, co21, co22], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def chol(M: jnp.ndarray) -> jnp.ndarray:
    """Cholesky factor L (lower) of SPD ``M`` [..., n, n], unrolled over n.

    Equivalent to ``jnp.linalg.cholesky`` for well-conditioned SPD input;
    the tiny ridge keeps sqrt/div well-defined under roundoff.
    """
    n = M.shape[-1]
    cols = []
    A = M
    for k in range(n):
        d = jnp.sqrt(jnp.maximum(A[..., k, k], 1e-30))
        col = A[..., :, k] / d[..., None]                     # [..., n]
        # zero everything above the diagonal element of this column
        mask = jnp.arange(n) >= k
        col = jnp.where(mask, col, 0.0)
        cols.append(col)
        # rank-1 update of the trailing submatrix
        A = A - col[..., :, None] * col[..., None, :]
    return jnp.stack(cols, axis=-1)                           # [..., n, n] lower


def chol_solve(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``L L^T x = b`` with ``b`` [..., n] or [..., n, m], unrolled."""
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    n = L.shape[-1]
    # forward: L y = b  (one vectorized contraction per row, O(n) ops)
    ys: list = []
    for i in range(n):
        acc = b[..., i, :]
        if i:
            Y = jnp.stack(ys, axis=-2)                        # [..., i, m]
            acc = acc - (L[..., i, :i, None] * Y).sum(-2)
        ys.append(acc / L[..., i, i, None])
    # backward: L^T x = y
    xs: list = []
    for k, i in enumerate(reversed(range(n))):
        acc = ys[i]
        if k:
            X = jnp.stack(xs, axis=-2)                        # [..., k, m]
            acc = acc - (L[..., i + 1:, i, None] * X[..., ::-1, :]).sum(-2)
        xs.append(acc / L[..., i, i, None])
    x = jnp.stack(xs[::-1], axis=-2)
    return x[..., 0] if vec else x


def spd_solve(M: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve SPD ``M x = b`` via the unrolled Cholesky."""
    return chol_solve(chol(M), b)


def mulsum(a: jnp.ndarray, b: jnp.ndarray, axis) -> jnp.ndarray:
    """``(a * b).sum(axis)`` — broadcast-multiply-reduce contraction.

    The caller aligns axes with None-indexing; this exists to make the
    intent (a dot_general the TPU should NOT tile onto the MXU) searchable.
    """
    return (a * b).sum(axis)
