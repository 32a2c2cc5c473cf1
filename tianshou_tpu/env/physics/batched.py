"""Env-last batched dynamics: the physics substep with environments in the
TPU's 128-lane axis.

Same math as :mod:`tianshou_tpu.env.physics.dynamics` (symplectic Euler on
the Euler-Lagrange momentum form, MuJoCo-style soft-constraint contacts),
re-expressed so that EVERY intermediate carries the env batch axis LAST:

- ``dynamics.py`` is written per-env and batched with ``jax.vmap(in_axes=0)``.
  vmap's batching rules move the batch dim to the FRONT of most
  intermediates (measured on the substep jaxpr: 6,193 of 7,440 batched
  eqn outputs are env-major), so a [E, 3, 3] elementwise op uses 3 of the
  VPU's 128 lanes — ~2% lane utilization once per-dispatch overhead is
  removed.
- Here the structural dims (3-vectors, 3x3 rotations, nq <= 23 joint
  spaces) sit in SUBLANES and the env axis rides the lanes at full width.
  ``jax.jvp``/``jax.vjp``/``jax.linearize`` are shape-preserving, so the
  autodiff recipe (mass matrix from linearized FK, forces from one vjp)
  carries over verbatim; only ``jacfwd`` — whose internal vmap would
  shuffle axes — is replaced by an explicit tangent-basis batch.

This layout exists for the fused Pallas step kernel
(:mod:`tianshou_tpu.ops.pallas.physics_fused`), where the whole
``frame_skip*substeps`` chain runs as ONE kernel and lane utilization — not
dispatch overhead — sets the speed. It also runs under plain jit on any
backend (the parity tests compare it to ``dynamics.step`` elementwise).

Conventions: ``q, qd: [nq, E]``; FK returns ``p: [nb, 3, E]``,
``R: [nb, 3, 3, E]``; all constant-index selections (contact bodies, limit
dofs) unroll at trace time over static numpy indices — no gathers reach the
compiler (TPU Pallas has no general gather).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.env.physics.dynamics import _armature, quat_np
from tianshou_tpu.env.physics.model import FREE, HINGE, SLIDE, Model

__all__ = ["fk_b", "step_b", "substep_b", "actuation_b", "mass_matrix_b"]

_EPS = 1e-9


# ---------------------------------------------------------------------------
# env-last algebra helpers ([*, E] arrays; struct dims lead, env is lanes)
# ---------------------------------------------------------------------------
def mvT(A: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """[m, n, E] @ [n, E] -> [m, E] via mul+reduce."""
    return (A * x[None, :, :]).sum(1)


def mmT(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """[m, k, E] @ [k, n, E] -> [m, n, E] via mul+reduce."""
    return (A[:, :, None, :] * B[None, :, :, :]).sum(1)


def hat_t(v: jnp.ndarray) -> jnp.ndarray:
    """[3, E] -> skew [3, 3, E]."""
    z = jnp.zeros_like(v[0])
    return jnp.stack(
        [
            jnp.stack([z, -v[2], v[1]]),
            jnp.stack([v[2], z, -v[0]]),
            jnp.stack([-v[1], v[0], z]),
        ]
    )


def _eye_t(n: int, E: int, dtype) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.eye(n, dtype=dtype)[:, :, None], (n, n, E))


def rotvec_to_mat_t(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector [3, E] -> rotation matrix [3, 3, E] (algebra.rotvec_to_mat)."""
    t2 = (r * r).sum(0)
    t = jnp.sqrt(t2 + _EPS)
    k = hat_t(r)
    a = jnp.sin(t) / t
    b = (1.0 - jnp.cos(t)) / (t2 + _EPS)
    kk = mmT(k, k)
    return _eye_t(3, r.shape[-1], r.dtype) + a[None, None, :] * k + b[None, None, :] * kk


def axis_angle_mat_t(axis: np.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues about a STATIC axis by per-env angle [E] -> [3, 3, E]."""
    ax = np.asarray(axis, np.float64)
    k = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
    kk = k @ k
    s, c = jnp.sin(angle), jnp.cos(angle)
    k_ = jnp.asarray(k, angle.dtype)[:, :, None]
    kk_ = jnp.asarray(kk, angle.dtype)[:, :, None]
    eye = jnp.asarray(np.eye(3), angle.dtype)[:, :, None]
    return eye + k_ * s[None, None, :] + kk_ * (1.0 - c)[None, None, :]


def inv3_t(A: jnp.ndarray) -> jnp.ndarray:
    """Adjugate inverse of [3, 3, E]."""
    a, b, c = A[0, 0], A[0, 1], A[0, 2]
    d, e, f = A[1, 0], A[1, 1], A[1, 2]
    g, h, i = A[2, 0], A[2, 1], A[2, 2]
    co00, co01, co02 = e * i - f * h, c * h - b * i, b * f - c * e
    co10, co11, co12 = f * g - d * i, a * i - c * g, c * d - a * f
    co20, co21, co22 = d * h - e * g, b * g - a * h, a * e - b * d
    det = a * co00 + b * co10 + c * co20
    adj = jnp.stack(
        [
            jnp.stack([co00, co01, co02]),
            jnp.stack([co10, co11, co12]),
            jnp.stack([co20, co21, co22]),
        ]
    )
    return adj / det[None, None, :]


def chol_t(M: jnp.ndarray) -> jnp.ndarray:
    """Unrolled Cholesky of SPD [n, n, E] (linalg.chol, env-last)."""
    n = M.shape[0]
    cols = []
    A = M
    for k in range(n):
        d = jnp.sqrt(jnp.maximum(A[k, k], 1e-30))
        col = A[:, k] / d[None, :]
        # float mask, not bool jnp.where: bool array constants can't be
        # hoisted into Pallas kernel inputs (Mosaic VMEM is typed f/i)
        mask = (np.arange(n) >= k).astype(np.float32)[:, None]
        col = col * mask
        cols.append(col)
        A = A - col[:, None, :] * col[None, :, :]
    return jnp.stack(cols, axis=1)  # [n, n, E] lower


def chol_solve_t(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L L^T x = b with b [n, E] or [n, m, E] (linalg.chol_solve)."""
    vec = b.ndim == 2
    if vec:
        b = b[:, None, :]
    n = L.shape[0]
    ys: list = []
    for i in range(n):
        acc = b[i]
        if i:
            Y = jnp.stack(ys)  # [i, m, E]
            acc = acc - (L[i, :i][:, None, :] * Y).sum(0)
        ys.append(acc / L[i, i][None, :])
    xs: list = [None] * n
    # natural row order throughout — a traced [::-1] lowers to lax.rev,
    # which Mosaic (TPU Pallas) has no lowering for
    for i in reversed(range(n)):
        acc = ys[i]
        if i < n - 1:
            X = jnp.stack(xs[i + 1 :])  # [n-1-i, m, E]
            acc = acc - (L[i + 1 :, i][:, None, :] * X).sum(0)
        xs[i] = acc / L[i, i][None, :]
    x = jnp.stack(xs, axis=0)
    return x[:, 0, :] if vec else x


# ---------------------------------------------------------------------------
# kinematics (dynamics.forward_kinematics, env-last)
# ---------------------------------------------------------------------------
def fk_b(model: Model, q: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Body poses for q [nq, E]: (p [nb, 3, E], R [nb, 3, 3, E])."""
    E = q.shape[-1]
    dtype = q.dtype
    ps: list = []
    Rs: list = []
    for b in range(model.nbody):
        par = model.parent[b]
        joints = model.joints_of(b)
        if joints and joints[0].jtype == FREE:
            i = joints[0].q_idx
            pb = q[i : i + 3]
            Rb = rotvec_to_mat_t(q[i + 3 : i + 6])
        else:
            if par < 0:
                pp = jnp.zeros((3, E), dtype)
                Rp = _eye_t(3, E, dtype)
            else:
                pp, Rp = ps[par], Rs[par]
            bp = np.asarray(model.body_pos[b])
            pb = pp + (Rp * jnp.asarray(bp, dtype)[None, :, None]).sum(1)
            Rq = jnp.asarray(quat_np(model.body_quat[b]), dtype)
            # Rp @ const: [3,3,E] x [3,3] over middle index
            Rb = (Rp[:, :, None, :] * Rq[None, :, :, None]).sum(1)
            for j in joints:
                qi = q[j.q_idx] - j.ref  # [E]
                axis = np.asarray(j.axis)
                if j.jtype == SLIDE:
                    ax = jnp.asarray(axis, dtype)
                    pb = pb + (Rb * ax[None, :, None]).sum(1) * qi[None, :]
                else:  # HINGE about anchor j.pos
                    Rj = axis_angle_mat_t(axis, qi)
                    anchor = jnp.asarray(j.pos, dtype)
                    Rj_a = (Rj * anchor[None, :, None]).sum(1)  # [3, E]
                    pb = pb + mvT(Rb, anchor[:, None] - Rj_a)
                    Rb = mmT(Rb, Rj)
        ps.append(pb)
        Rs.append(Rb)
    return jnp.stack(ps), jnp.stack(Rs)


def _fk_com_b(model: Model, q: jnp.ndarray):
    p, R = fk_b(model, q)
    com = jnp.asarray(model.body_com, q.dtype)  # [nb, 3]
    pcom = p + (R * com[:, None, :, None]).sum(2)
    return pcom, R


def _vee_batch(W: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3, E] skew -> [..., 3, E]."""
    return 0.5 * jnp.stack(
        [
            W[..., 2, 1, :] - W[..., 1, 2, :],
            W[..., 0, 2, :] - W[..., 2, 0, :],
            W[..., 1, 0, :] - W[..., 0, 1, :],
        ],
        axis=-2,
    )


def _body_velocities_b(model: Model, q: jnp.ndarray, qd: jnp.ndarray):
    (pcom, R), (vcom, Rd) = jax.jvp(lambda q_: _fk_com_b(model, q_), (q,), (qd,))
    # omega = vee(Rd R^T): W[b,i,k,e] = sum_j Rd[b,i,j,e] R[b,k,j,e]
    W = (Rd[:, :, None, :, :] * R[:, None, :, :, :]).sum(3)
    return pcom, R, vcom, _vee_batch(W)


def _inertia_world_b(model: Model, R: jnp.ndarray) -> jnp.ndarray:
    """R I R^T per body: [nb, 3, 3, E]."""
    I_body = jnp.asarray(model.body_inertia, R.dtype)  # [nb, 3, 3]
    RI = (R[:, :, :, None, :] * I_body[:, None, :, :, None]).sum(2)  # R @ I
    return (RI[:, :, None, :, :] * R[:, None, :, :, :]).sum(3)  # (RI) @ R^T


def kinetic_b(model: Model, q: jnp.ndarray, qd: jnp.ndarray) -> jnp.ndarray:
    """Kinetic energy per env: [E]."""
    _, R, vcom, omega = _body_velocities_b(model, q, qd)
    m = jnp.asarray(model.body_mass, q.dtype)
    Iw = _inertia_world_b(model, R)
    T = 0.5 * (m[:, None, None] * vcom * vcom).sum((0, 1))
    Iw_om = (Iw * omega[:, None, :, :]).sum(2)  # [nb, 3, E]
    T = T + 0.5 * (Iw_om * omega).sum((0, 1))
    arm = jnp.asarray(_armature(model), q.dtype)
    return T + 0.5 * (arm[:, None] * qd * qd).sum(0)


def potential_b(model: Model, q: jnp.ndarray) -> jnp.ndarray:
    pcom, _ = _fk_com_b(model, q)
    g = jnp.asarray(model.gravity, q.dtype)
    m = jnp.asarray(model.body_mass, q.dtype)
    return -(m[:, None] * (pcom * g[None, :, None]).sum(1)).sum(0)


def mass_matrix_fk_b(model: Model, q: jnp.ndarray):
    """(M [nq,nq,E], pcom, R, dp [nq,nb,3,E], dR [nq,nb,3,3,E]).

    dynamics.mass_matrix_fk with the jacfwd replaced by an explicit
    tangent-basis batch: ``jax.linearize`` once, then vmap the linear map
    over the nq basis tangents. The tangent batch leads (axis 0) and the
    env axis stays last in every intermediate.
    """
    nq, E = q.shape
    (pcom, R), f_lin = jax.linearize(lambda q_: _fk_com_b(model, q_), q)
    basis = jnp.broadcast_to(jnp.eye(nq, dtype=q.dtype)[:, :, None], (nq, nq, E))
    dp, dR = jax.vmap(f_lin)(basis)  # [nq, nb, 3, E], [nq, nb, 3, 3, E]
    # J_omega per tangent: vee(dR_t @ R^T)
    W = (dR[:, :, :, None, :, :] * R[None, :, None, :, :, :]).sum(4)  # [nq,nb,3,3,E]
    Jw = _vee_batch(W)  # [nq, nb, 3, E]
    mass = np.asarray(model.body_mass)
    Iw = _inertia_world_b(model, R)  # [nb, 3, 3, E]
    M = jnp.zeros((nq, nq, E), q.dtype)
    for b in range(model.nbody):  # accumulate per body: bounded live memory
        dpb = dp[:, b]  # [nq, 3, E]
        M = M + float(mass[b]) * (dpb[:, None] * dpb[None, :]).sum(2)
        IJw = (Iw[b][None, :, :, :] * Jw[:, b][:, None, :, :]).sum(2)  # [nq,3,E]
        M = M + (Jw[:, b][:, None] * IJw[None, :]).sum(2)
    arm = np.diag(_armature(model))
    return M + jnp.asarray(arm, q.dtype)[:, :, None], pcom, R, dp, dR


def mass_matrix_b(model: Model, q: jnp.ndarray) -> jnp.ndarray:
    return mass_matrix_fk_b(model, q)[0]


# ---------------------------------------------------------------------------
# forces (dynamics._passive_joint_forces / _external_forces, env-last)
# ---------------------------------------------------------------------------
def _passive_b(
    model: Model, q: jnp.ndarray, qd: jnp.ndarray, m_diag: jnp.ndarray,
    include_limits: bool,
):
    damping = np.zeros(model.nq)
    stiffness = np.zeros(model.nq)
    springref = np.zeros(model.nq)
    lo = np.full(model.nq, -np.inf)
    hi = np.full(model.nq, np.inf)
    for j in model.joints:
        if j.jtype == FREE:
            continue
        damping[j.q_idx] = j.damping
        stiffness[j.q_idx] = j.stiffness
        springref[j.q_idx] = j.springref
        if j.limited:
            lo[j.q_idx], hi[j.q_idx] = j.range
    dt_ = q.dtype
    tau = -jnp.asarray(stiffness, dt_)[:, None] * (q - jnp.asarray(springref, dt_)[:, None])
    if not include_limits:
        return tau, jnp.broadcast_to(jnp.asarray(damping, dt_)[:, None], q.shape)
    omega_l = 2.0 / 0.02
    k_lim = m_diag * omega_l * omega_l
    d_lim = 2.0 * m_diag * omega_l
    hi_ = jnp.asarray(np.where(np.isfinite(hi), hi, 1e30), dt_)[:, None]
    lo_ = jnp.asarray(np.where(np.isfinite(lo), lo, -1e30), dt_)[:, None]
    viol_hi = jnp.maximum(q - hi_, 0.0)
    viol_lo = jnp.maximum(lo_ - q, 0.0)
    in_viol = (viol_hi > 0) | (viol_lo > 0)
    tau = tau - k_lim * viol_hi + k_lim * viol_lo
    D = jnp.asarray(damping, dt_)[:, None] + jnp.where(in_viol, d_lim, 0.0)
    return tau, D


def _contact_points_b(model: Model, q: jnp.ndarray) -> jnp.ndarray:
    """World contact-sphere centers [nc, 3, E] via static per-row selection."""
    p, R = fk_b(model, q)
    cb = np.asarray(model.contact_body)
    off = np.asarray(model.contact_offset)
    rows = []
    for c in range(len(cb)):
        b = int(cb[c])
        o = jnp.asarray(off[c], q.dtype)
        rows.append(p[b] + (R[b] * o[None, :, None]).sum(1))
    return jnp.stack(rows)


def _external_b(
    model: Model, q: jnp.ndarray, qd: jnp.ndarray, include_contacts: bool
) -> jnp.ndarray:
    nc = len(model.contact_radius) if include_contacts else 0
    has_fluid = model.fluid_density > 0 or model.fluid_viscosity > 0
    if nc == 0 and not has_fluid:
        return jnp.zeros_like(q)
    dt_ = q.dtype

    def points_and_frames(q_):
        pcom, R = _fk_com_b(model, q_)
        out = [pcom, R]
        if nc:
            out.append(_contact_points_b(model, q_))
        return tuple(out)

    prim, tangent = jax.jvp(points_and_frames, (q,), (qd,))
    pcom, R = prim[0], prim[1]
    vcom, Rd = tangent[0], tangent[1]

    F_com = jnp.zeros_like(pcom)
    T_body = jnp.zeros_like(pcom)
    f_contact = None

    if has_fluid:
        W = (Rd[:, :, None, :, :] * R[:, None, :, :, :]).sum(3)
        omega = _vee_batch(W)  # [nb, 3, E]
        m = np.maximum(model.body_mass, 1e-9)
        diag = np.einsum("bii->bi", model.body_inertia)
        box2 = np.maximum(6.0 / m[:, None] * (diag.sum(1, keepdims=True) - 2 * diag), 1e-8)
        box = np.sqrt(box2)
        half = jnp.asarray(box / 2.0, dt_)  # [nb, 3]
        # world -> body: R^T v
        v_l = (R * vcom[:, :, None, :]).sum(1)  # [nb, 3, E]
        w_l = (R * omega[:, :, None, :]).sum(1)
        d_eq = jnp.asarray(box.mean(axis=1), dt_)  # [nb]
        mu = model.fluid_viscosity
        rho = model.fluid_density
        F_l = -3.0 * jnp.pi * mu * d_eq[:, None, None] * v_l
        T_l = -jnp.pi * mu * (d_eq ** 3)[:, None, None] * w_l
        if rho > 0:
            area = jnp.stack(
                [4 * half[:, 1] * half[:, 2], 4 * half[:, 0] * half[:, 2], 4 * half[:, 0] * half[:, 1]],
                axis=1,
            )  # [nb, 3]
            F_l = F_l - 0.5 * rho * area[:, :, None] * jnp.abs(v_l) * v_l
            it = jnp.stack(
                [
                    half[:, 1] ** 4 * half[:, 2] + half[:, 2] ** 4 * half[:, 1],
                    half[:, 0] ** 4 * half[:, 2] + half[:, 2] ** 4 * half[:, 0],
                    half[:, 0] ** 4 * half[:, 1] + half[:, 1] ** 4 * half[:, 0],
                ],
                axis=1,
            )
            T_l = T_l - 0.5 * rho * it[:, :, None] * jnp.abs(w_l) * w_l
        F_com = F_com + (R * F_l[:, None, :, :]).sum(2)  # R @ F_l
        T_body = T_body + (R * T_l[:, None, :, :]).sum(2)

    if nc:
        x, v = prim[2], tangent[2]  # [nc, 3, E]
        r = jnp.asarray(model.contact_radius, dt_)[:, None]
        mu_c = jnp.asarray(model.contact_friction, dt_)[:, None]
        depth = r - x[:, 2]
        active = depth > 0
        kp, kd = model.contact_stiffness, model.contact_damping
        fn = jnp.where(active, jnp.maximum(kp * depth - kd * v[:, 2], 0.0), 0.0)
        vt = v[:, :2]  # [nc, 2, E]
        speed = jnp.sqrt((vt * vt).sum(1) + 1e-12)
        kt = 2.0 * kd
        ft_mag = jnp.minimum(kt * speed, mu_c * fn)
        ft = -vt * (ft_mag / speed)[:, None, :]
        f_contact = jnp.concatenate([ft, fn[:, None, :]], axis=1)  # [nc, 3, E]

    # power-conjugate cotangents: 1/2 hat(T) R on rotations
    def hat_body(v):  # [nb, 3, E] -> [nb, 3, 3, E]
        z = jnp.zeros_like(v[:, 0])
        return jnp.stack(
            [
                jnp.stack([z, -v[:, 2], v[:, 1]], axis=1),
                jnp.stack([v[:, 2], z, -v[:, 0]], axis=1),
                jnp.stack([-v[:, 1], v[:, 0], z], axis=1),
            ],
            axis=1,
        )

    hT = hat_body(T_body)
    cot_R = 0.5 * (hT[:, :, :, None, :] * R[:, None, :, :, :]).sum(2)  # hat(T) @ R
    cots = [F_com, cot_R]
    if nc:
        cots.append(f_contact)
    _, pullback = jax.vjp(points_and_frames, q)
    (tau,) = pullback(tuple(cots))
    return tau


def _impedance_t(solimp: np.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """dynamics._impedance with static [n,5] solimp and pos [n, E]."""
    dt_ = pos.dtype
    d0 = jnp.asarray(solimp[:, 0], dt_)[:, None]
    dmax = jnp.asarray(solimp[:, 1], dt_)[:, None]
    width = jnp.asarray(np.maximum(solimp[:, 2], 1e-12), dt_)[:, None]
    mid = jnp.asarray(solimp[:, 3], dt_)[:, None]
    power = jnp.asarray(solimp[:, 4], dt_)[:, None]
    x = jnp.clip(jnp.abs(pos) / width, 0.0, 1.0)
    lo = mid * (x / mid) ** power
    hi = 1.0 - (1.0 - mid) * ((1.0 - x) / (1.0 - mid)) ** power
    s = jnp.where(x < mid, lo, hi)
    return jnp.clip(d0 + s * (dmax - d0), 1e-4, 0.9999)


def _sol_kb_t(solref: np.ndarray, solimp: np.ndarray, pos: jnp.ndarray):
    d = _impedance_t(np.asarray(solimp), pos)
    dt_ = pos.dtype
    tau_c = jnp.asarray(solref[:, 0], dt_)[:, None]
    zeta = jnp.asarray(solref[:, 1], dt_)[:, None]
    dmax = jnp.asarray(solimp[:, 1], dt_)[:, None]
    k = d / (dmax * dmax * tau_c * tau_c * zeta * zeta)
    b = 2.0 / (dmax * tau_c)
    return d, k, b


def _contact_constraint_b(
    model: Model, q: jnp.ndarray, qd: jnp.ndarray, f_free: jnp.ndarray,
    M: jnp.ndarray, fk,
) -> jnp.ndarray:
    """dynamics._contact_forces_constraint, env-last. J rows [nr, nq, E];
    the dual QP (A + R) with pyramidal facets solved by fixed-iteration APGD."""
    nc = len(model.contact_radius)
    nl = len(model.limit_q_idx)
    nq, E = q.shape
    dt_ = q.dtype
    L_M = chol_t(M)
    qdd0 = chol_solve_t(L_M, f_free)  # [nq, E]

    J_rows, vel_rows, bias_rows, aref_rows, act_rows, R_rows = [], [], [], [], [], []

    if nc:
        cb = np.asarray(model.contact_body)
        e_off = np.asarray(model.contact_offset - model.body_com[model.contact_body])

        def xc(q_):
            pcom, R = _fk_com_b(model, q_)
            rows = []
            for c in range(nc):
                b = int(cb[c])
                o = jnp.asarray(e_off[c], dt_)
                rows.append(pcom[b] + (R[b] * o[None, :, None]).sum(1))
            return jnp.stack(rows)  # [nc, 3, E]

        pcom_, R_, dp_, dR_ = fk  # dp [nq, nb, 3, E], dR [nq, nb, 3, 3, E]
        xs, Js = [], []
        for c in range(nc):
            b = int(cb[c])
            o = jnp.asarray(e_off[c], dt_)
            xs.append(pcom_[b] + (R_[b] * o[None, :, None]).sum(1))
            # J_c[t, i, e] = dp[t, b, i, e] + sum_j dR[t, b, i, j, e] o[j]
            Js.append(dp_[:, b] + (dR_[:, b] * o[None, None, :, None]).sum(2))
        x = jnp.stack(xs)  # [nc, 3, E]
        J = jnp.stack(Js, axis=0)  # [nc, nq, 3, E]
        J = jnp.swapaxes(J, 1, 2)  # [nc, 3, nq, E]
        v = (J * qd[None, None, :, :]).sum(2)  # [nc, 3, E]
        # contact-point acceleration bias (Jdot qd)
        _, a_bias = jax.jvp(lambda q_: jax.jvp(xc, (q_,), (qd,))[1], (q,), (qd,))

        radius = jnp.asarray(model.contact_radius, dt_)[:, None]
        margin = jnp.asarray(model.contact_margin, dt_)[:, None]
        dist = x[:, 2] - radius  # [nc, E]
        pos = dist - margin
        active = dist < margin

        d, k, b_ = _sol_kb_t(np.asarray(model.contact_solref), np.asarray(model.contact_solimp), pos)

        mu = jnp.asarray(model.contact_friction, dt_)
        sgn = np.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]])  # [4, 2]
        s0 = jnp.asarray(sgn[:, 0], dt_)
        s1 = jnp.asarray(sgn[:, 1], dt_)
        # tan[c, f, t, e] = s0[f] Jx + s1[f] Jy — pure slices (J[:, 0:1]),
        # not mixed None+int indexing: the latter lowers to lax.gather,
        # which Mosaic (TPU Pallas) can't lower
        tan = s0[None, :, None, None] * J[:, 0:1] + s1[None, :, None, None] * J[:, 1:2]
        Jf = J[:, 2:3] + mu[:, None, None, None] * tan  # [nc, 4, nq, E]
        vt = s0[None, :, None] * v[:, 0:1] + s1[None, :, None] * v[:, 1:2]
        vel_f = v[:, 2:3] + mu[:, None, None] * vt  # [nc, 4, E]
        bt = s0[None, :, None] * a_bias[:, 0:1] + s1[None, :, None] * a_bias[:, 1:2]
        bias_f = a_bias[:, 2:3] + mu[:, None, None] * bt

        Jn = J[:, 2] * active[:, None, :]  # [nc, nq, E]
        sol_Jn = chol_solve_t(L_M, jnp.swapaxes(Jn, 0, 1))  # [nq, nc, E]
        A_nn = (Jn * jnp.swapaxes(sol_Jn, 0, 1)).sum(1)  # [nc, E]
        muc = jnp.maximum(mu, 1.0)[:, None]
        R_c = (1.0 - d) / d * 2.0 * muc * muc * (1.0 + muc * muc) * A_nn  # [nc, E]

        J_rows.append((Jf * active[:, None, None, :]).reshape(nc * 4, nq, E))
        vel_rows.append(vel_f.reshape(nc * 4, E))
        bias_rows.append((bias_f * active[:, None, :]).reshape(nc * 4, E))
        aref_rows.append((-b_[:, None] * vel_f - k[:, None] * pos[:, None]).reshape(nc * 4, E))
        act_rows.append(jnp.repeat(active, 4, axis=0))
        R_rows.append(jnp.repeat(R_c, 4, axis=0))

    if nl:
        li = np.asarray(model.limit_q_idx)
        lo = np.asarray(model.limit_range)[:, 0]
        hi = np.asarray(model.limit_range)[:, 1]
        q_li = jnp.stack([q[int(i)] for i in li])  # [nl, E]
        qd_li = jnp.stack([qd[int(i)] for i in li])
        d_lo = q_li - jnp.asarray(lo, dt_)[:, None]
        d_hi = jnp.asarray(hi, dt_)[:, None] - q_li
        side = jnp.where(d_lo < d_hi, 1.0, -1.0)
        dist_l = jnp.minimum(d_lo, d_hi)
        active_l = dist_l < 0.0
        d_l, k_l, b_l = _sol_kb_t(np.asarray(model.limit_solref), np.asarray(model.limit_solimp), dist_l)
        onehot = np.zeros((nl, model.nq))
        onehot[np.arange(nl), li] = 1.0
        Jl = jnp.asarray(onehot, dt_)[:, :, None] * side[:, None, :] * active_l[:, None, :]
        vel_l = side * qd_li
        Minv = chol_solve_t(L_M, _eye_t(nq, E, dt_))  # [nq, nq, E]
        Minv_diag_li = jnp.stack([Minv[int(i), int(i)] for i in li])  # [nl, E]
        R_l = (1.0 - d_l) / d_l * Minv_diag_li

        J_rows.append(Jl)
        vel_rows.append(vel_l)
        bias_rows.append(jnp.zeros((nl, E), dt_))
        aref_rows.append(-b_l * vel_l - k_l * dist_l)
        act_rows.append(active_l)
        R_rows.append(R_l)

    Jr = jnp.concatenate(J_rows, axis=0)  # [nr, nq, E]
    act = jnp.concatenate(act_rows, axis=0)
    aref = jnp.concatenate(aref_rows, axis=0) * act
    bias = jnp.concatenate(bias_rows, axis=0)
    Rreg = jnp.maximum(jnp.concatenate(R_rows, axis=0), 1e-10)  # [nr, E]
    nr = Jr.shape[0]

    a0 = (Jr * qdd0[None, :, :]).sum(1) + bias  # [nr, E]
    MinvJT = chol_solve_t(L_M, jnp.swapaxes(Jr, 0, 1))  # [nq, nr, E]
    # A[r, s, e] = sum_k Jr[r, k, e] MinvJT[k, s, e] — accumulate over k to
    # bound live memory at [nr, nr, E]
    A = jnp.zeros((nr, nr, E), dt_)
    for k_i in range(nq):
        # slices, not int indexing (int+None mixing emits lax.gather)
        A = A + Jr[:, k_i : k_i + 1, :] * MinvJT[k_i : k_i + 1]
    g0 = a0 - aref

    L = jnp.max((jnp.abs(A).sum(1) + Rreg), axis=0) + 1e-8  # [E]

    n_iter = int(getattr(model, "contact_iterations", 30))

    def body(_, carry):
        lam, y, t = carry
        grad = (A * y[None, :, :]).sum(1) + Rreg * y + g0
        lam_new = jnp.maximum(y - grad / L[None, :], 0.0)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = lam_new + (t - 1.0) / t_new * (lam_new - lam)
        return (lam_new, y_new, t_new)

    lam0 = jnp.zeros((nr, E), dt_)
    lam, _, _ = jax.lax.fori_loop(
        0, n_iter, body, (lam0, lam0, jnp.asarray(1.0, dt_))
    )
    return (Jr * lam[:, None, :]).sum(0)  # [nq, E]


# ---------------------------------------------------------------------------
# actuation + integration
# ---------------------------------------------------------------------------
def actuation_b(model: Model, ctrl: jnp.ndarray) -> jnp.ndarray:
    """Controls [nu, E] -> joint-space torques [nq, E]."""
    tau = jnp.zeros((model.nq, ctrl.shape[-1]), ctrl.dtype)
    for i, a in enumerate(model.actuators):
        c = jnp.clip(ctrl[i], a.ctrlrange[0], a.ctrlrange[1])
        tau = tau.at[a.q_idx].add(a.gear * c)
    return tau


def substep_b(model: Model, q: jnp.ndarray, qd: jnp.ndarray, tau_act: jnp.ndarray, dt: float):
    """One semi-implicit Euler substep, env-last (dynamics._substep)."""
    nq, E = q.shape
    dt_ = q.dtype
    M, pcom, R, dp, dR = mass_matrix_fk_b(model, q)
    m_diag = jnp.stack([M[i, i] for i in range(nq)])  # [nq, E]
    use_constraint = getattr(model, "contact_model", "penalty") == "constraint" and (
        len(model.contact_radius) > 0 or len(model.limit_q_idx) > 0
    )
    tau_p, D = _passive_b(model, q, qd, m_diag, include_limits=not use_constraint)
    # grad of the Lagrangian via one vjp with per-env unit cotangents (envs
    # are independent, so the ones-cotangent pullback IS the batched grad)
    ones = jnp.ones(E, dt_)
    _, pull = jax.vjp(lambda q_: kinetic_b(model, q_, qd) - potential_b(model, q_), q)
    dLdq = pull(ones)[0]

    def dT_dqd(q_):
        _, pb = jax.vjp(lambda qd_: kinetic_b(model, q_, qd_), qd)
        return pb(ones)[0]

    _, mdot_qd = jax.jvp(dT_dqd, (q,), (qd,))
    f = tau_act + dLdq - mdot_qd + tau_p + _external_b(
        model, q, qd, include_contacts=not use_constraint
    )
    if use_constraint:
        f = f + _contact_constraint_b(model, q, qd, f - D * qd, M, fk=(pcom, R, dp, dR))
    A = M + dt * (jnp.eye(nq, dtype=dt_)[:, :, None] * D[:, None, :])
    qd_new = chol_solve_t(chol_t(A), (M * qd[None, :, :]).sum(1) + dt * f)
    q_new = q + dt * qd_new
    return q_new, qd_new


def _rotvec_jacobian_t(r: jnp.ndarray) -> jnp.ndarray:
    """B(r) [3, 3, E] with omega = B(r) rdot, via 3 explicit basis jvps."""
    E = r.shape[-1]
    cols = []
    for k in range(3):
        e_k = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype)[k][:, None], (3, E))
        R, Rd = jax.jvp(rotvec_to_mat_t, (r,), (e_k,))
        W = (Rd[:, None, :, :] * R[None, :, :, :]).sum(2)  # Rd @ R^T [3,3,E]
        w = 0.5 * jnp.stack([W[2, 1] - W[1, 2], W[0, 2] - W[2, 0], W[1, 0] - W[0, 1]])
        cols.append(w)
    return jnp.stack(cols, axis=1)  # [3(omega), 3(rdot), E]


def _remap_free_b(model: Model, q: jnp.ndarray, qd: jnp.ndarray):
    """dynamics._remap_free_rotations, env-last.

    Row updates are rebuilt by concatenation, not ``.at[slice].set`` —
    jnp's at-set lowers to lax.scatter, which Mosaic (TPU Pallas) cannot
    lower; concatenate/slice both can.
    """
    for j in model.joints:
        if j.jtype != FREE:
            continue
        i = j.q_idx + 3
        r = q[i : i + 3]
        rd = qd[i : i + 3]
        norm = jnp.sqrt((r * r).sum(0) + 1e-12)
        need = norm > jnp.pi
        r_new = r * (1.0 - 2.0 * jnp.pi / norm)[None, :]
        omega = mvT(_rotvec_jacobian_t(r), rd)
        rd_new = mvT(inv3_t(_rotvec_jacobian_t(r_new)), omega)
        r_out = jnp.where(need[None, :], r_new, r)
        rd_out = jnp.where(need[None, :], rd_new, rd)
        q = jnp.concatenate([q[:i], r_out, q[i + 3 :]], axis=0)
        qd = jnp.concatenate([qd[:i], rd_out, qd[i + 3 :]], axis=0)
    return q, qd


def resolve_substeps(model: Model, substeps: int | None) -> int:
    """dynamics.step's integrator-aware substep default."""
    if substeps is not None:
        return substeps
    if getattr(model, "integrator", "euler") == "euler":
        return 1
    return max(1, int(np.ceil(model.timestep / 0.002 - 1e-9)))


def step_b(
    model: Model,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    ctrl: jnp.ndarray,
    frame_skip: int = 1,
    substeps: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Advance frame_skip model timesteps for q, qd [nq, E], ctrl [nu, E].

    Same semantics as dynamics.step, env-last. No matmul-precision pin is
    needed: every contraction is mul+reduce (no dot_general reaches XLA).
    """
    if getattr(model, "enable_pair_contacts", False) and len(model.pair_body1):
        raise NotImplementedError(
            "geom-pair contacts are only implemented on the vmapped dynamics.step "
            "path; disable enable_pair_contacts or use physics_mode='xla' vmapped"
        )

    substeps = resolve_substeps(model, substeps)
    tau = actuation_b(model, ctrl)
    dt = model.timestep / substeps
    n = frame_skip * substeps
    has_free = any(j.jtype == FREE for j in model.joints)

    def body(_, carry):
        q, qd = carry
        q, qd = substep_b(model, q, qd, tau, dt)
        if has_free:
            q, qd = _remap_free_b(model, q, qd)
        return (q, qd)

    return jax.lax.fori_loop(0, n, body, (q, qd))
