"""Rotation helpers for the physics core (quaternion / rotation-vector /
Rodrigues). All functions are jit/vmap/grad-safe (no data-dependent control
flow) and operate on single items — batch with ``vmap``."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "quat_to_mat",
    "mat_to_quat",
    "rotvec_to_mat",
    "axis_angle_mat",
    "rotvec_to_quat",
    "vee",
    "hat",
]

_EPS = 1e-9


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """3-vector -> skew-symmetric matrix with hat(v) @ x == cross(v, x)."""
    x, y, z = v[0], v[1], v[2]
    return jnp.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]])


def vee(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`hat` for (possibly non-exactly) skew matrices."""
    return 0.5 * jnp.array([m[2, 1] - m[1, 2], m[0, 2] - m[2, 0], m[1, 0] - m[0, 1]])


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    n = w * w + x * x + y * y + z * z
    s = 2.0 / jnp.maximum(n, _EPS)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return jnp.array(
        [
            [1.0 - (yy + zz), xy - wz, xz + wy],
            [xy + wz, 1.0 - (xx + zz), yz - wx],
            [xz - wy, yz + wx, 1.0 - (xx + yy)],
        ]
    )


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z).

    Branch-free (jit-safe): builds all four candidate quaternions and picks
    the numerically best one by the largest pivot.
    """
    tr = m[0, 0] + m[1, 1] + m[2, 2]
    # candidate pivots
    p = jnp.stack(
        [1.0 + tr, 1.0 + m[0, 0] - m[1, 1] - m[2, 2],
         1.0 - m[0, 0] + m[1, 1] - m[2, 2], 1.0 - m[0, 0] - m[1, 1] + m[2, 2]]
    )
    p = jnp.maximum(p, _EPS)
    s = jnp.sqrt(p)
    q0 = jnp.array([s[0], (m[2, 1] - m[1, 2]) / s[0], (m[0, 2] - m[2, 0]) / s[0], (m[1, 0] - m[0, 1]) / s[0]])
    q1 = jnp.array([(m[2, 1] - m[1, 2]) / s[1], s[1], (m[0, 1] + m[1, 0]) / s[1], (m[0, 2] + m[2, 0]) / s[1]])
    q2 = jnp.array([(m[0, 2] - m[2, 0]) / s[2], (m[0, 1] + m[1, 0]) / s[2], s[2], (m[1, 2] + m[2, 1]) / s[2]])
    q3 = jnp.array([(m[1, 0] - m[0, 1]) / s[3], (m[0, 2] + m[2, 0]) / s[3], (m[1, 2] + m[2, 1]) / s[3], s[3]])
    idx = jnp.argmax(p)
    q = 0.5 * jnp.stack([q0, q1, q2, q3])[idx]
    q = q / jnp.linalg.norm(q)
    return q * jnp.sign(q[0] + _EPS)  # canonical hemisphere


def axis_angle_mat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation about a (unit) axis by ``angle``."""
    k = hat(axis)
    s, c = jnp.sin(angle), jnp.cos(angle)
    kk = (k[:, :, None] * k[None, :, :]).sum(1)  # k @ k, no dot_general
    return jnp.eye(3) + s * k + (1.0 - c) * kk


def rotvec_to_mat(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector (exp map) -> rotation matrix.

    Uses the sinc-style Rodrigues form that stays smooth (and correctly
    differentiable) at r -> 0.
    """
    t2 = (r * r).sum()
    t = jnp.sqrt(t2 + _EPS)
    k = hat(r)
    a = jnp.sin(t) / t                 # ~1 - t^2/6
    b = (1.0 - jnp.cos(t)) / (t2 + _EPS)  # ~1/2 - t^2/24
    kk = (k[:, :, None] * k[None, :, :]).sum(1)
    return jnp.eye(3) + a * k + b * kk


def rotvec_to_quat(r: jnp.ndarray) -> jnp.ndarray:
    t = jnp.sqrt((r * r).sum() + _EPS)
    half = 0.5 * t
    axis_scaled = r * (jnp.sin(half) / t)
    return jnp.concatenate([jnp.cos(half)[None], axis_scaled])
