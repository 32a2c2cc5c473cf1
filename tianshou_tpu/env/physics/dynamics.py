"""Generalized-coordinate articulated dynamics from JAX transforms.

Design (TPU-first, not a port of any engine):

- ``forward_kinematics`` is the ONLY hand-written model function — a
  trace-time Python loop over the (static, tiny) kinematic tree emitting
  pure jnp ops.
- Body velocities come from ``jvp`` of FK; kinetic energy T(q, qd) is then a
  plain scalar function, so the mass matrix is ``jacfwd(grad(T, qd), qd)``
  (exact — T is quadratic in qd) and the Coriolis/centrifugal forces come
  from the Euler-Lagrange momentum form: d/dt(M qd) = ∂T/∂q - ∂V/∂q + τ.
  No Christoffel symbols, no RNEA indexing to get wrong.
- Contact/fluid forces act on world-frame points/bodies; their generalized
  projection J^T f is ONE ``vjp`` of FK with the force as the cotangent.
- Integration is symplectic-Euler on (q, p=M qd): p' = p + dt·f,
  q' = q + dt·M⁻¹p'. Stable for the stiff penalty contacts at the MuJoCo
  model timesteps.

Everything vmaps over environments; a batch of envs becomes a handful of
large fused XLA ops (batched small matrices), which is exactly the shape
TPUs like. Replaces the MuJoCo dependency of the reference benchmark suite
(/root/reference/examples/mujoco).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.env.physics.algebra import axis_angle_mat, hat, quat_to_mat, rotvec_to_mat
from tianshou_tpu.env.physics.linalg import chol, chol_solve, inv3, mm, mv
from tianshou_tpu.env.physics.model import FREE, HINGE, SLIDE, Model

# TPU note: every contraction in this module is written as broadcast-
# multiply-reduce (linalg.mv/mm or explicit mul+sum) rather than
# einsum/@/dot_general, and the SPD solves use the unrolled small-matrix
# Cholesky in linalg.py. On TPU the dot_general path tiles each tiny
# (3..23-wide) contraction onto the 128-lane MXU (plus a 6-pass emulation
# under the fp32 pin) and the LAPACK-style batched Cholesky costs ~3 ms at
# [2048, 9, 9]; the mul+reduce/unrolled forms run on the VPU in native fp32
# (measured 2.5x for the mass matrix, scripts/physics_stage_probe.py).

__all__ = ["forward_kinematics", "kinetic_energy", "mass_matrix", "step", "init_state"]


# ---------------------------------------------------------------------------
# kinematics
# ---------------------------------------------------------------------------
def forward_kinematics(model: Model, q: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Body frame poses: returns (p [nb,3], R [nb,3,3])."""
    ps: list = []
    Rs: list = []
    for b in range(model.nbody):
        par = model.parent[b]
        joints = model.joints_of(b)
        if joints and joints[0].jtype == FREE:
            # free joint: q holds the GLOBAL pose (pos, rotvec) — MuJoCo
            # semantics where qpos0 = body pos/quat
            i = joints[0].q_idx
            pb = q[i : i + 3]
            Rb = rotvec_to_mat(q[i + 3 : i + 6])
        else:
            if par < 0:
                pp, Rp = jnp.zeros(3), jnp.eye(3)
            else:
                pp, Rp = ps[par], Rs[par]
            pb = pp + mv(Rp, jnp.asarray(model.body_pos[b]))
            Rb = mm(Rp, jnp.asarray(quat_np(model.body_quat[b])))
            for j in joints:
                qi = q[j.q_idx] - j.ref
                axis = jnp.asarray(j.axis)
                if j.jtype == SLIDE:
                    pb = pb + mv(Rb, axis * qi)
                else:  # HINGE about anchor j.pos
                    Rj = axis_angle_mat(axis, qi)
                    anchor = jnp.asarray(j.pos)
                    pb = pb + mv(Rb, anchor - mv(Rj, anchor))
                    Rb = mm(Rb, Rj)
        ps.append(pb)
        Rs.append(Rb)
    return jnp.stack(ps), jnp.stack(Rs)


def quat_np(q: np.ndarray) -> np.ndarray:
    """Numpy quaternion->matrix for static body offsets (trace-time)."""
    w, x, y, z = q / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _fk_com(model: Model, q: jnp.ndarray):
    """COM world positions + body rotations (the vjp/jvp workhorse)."""
    p, R = forward_kinematics(model, q)
    pcom = p + mv(R, jnp.asarray(model.body_com))
    return pcom, R


def _body_velocities(model: Model, q: jnp.ndarray, qd: jnp.ndarray):
    """(pcom, R, vcom, omega) via one jvp of FK."""
    (pcom, R), (vcom, Rd) = jax.jvp(lambda q: _fk_com(model, q), (q,), (qd,))
    W = (Rd[:, :, None, :] * R[:, None, :, :]).sum(-1)  # Rd @ R^T, skew
    omega = 0.5 * jnp.stack(
        [W[:, 2, 1] - W[:, 1, 2], W[:, 0, 2] - W[:, 2, 0], W[:, 1, 0] - W[:, 0, 1]], axis=1
    )
    return pcom, R, vcom, omega


# ---------------------------------------------------------------------------
# energies
# ---------------------------------------------------------------------------
def kinetic_energy(model: Model, q: jnp.ndarray, qd: jnp.ndarray) -> jnp.ndarray:
    _, R, vcom, omega = _body_velocities(model, q, qd)
    m = jnp.asarray(model.body_mass)
    I_world = _inertia_world(model, R)
    T = 0.5 * jnp.sum(m * jnp.sum(vcom * vcom, axis=1))
    T = T + 0.5 * ((mv(I_world, omega) * omega).sum())
    # rotor/armature inertia per scalar dof (MuJoCo joint/@armature)
    arm = _armature(model)
    return T + 0.5 * jnp.sum(jnp.asarray(arm) * qd * qd)


def _inertia_world(model: Model, R: jnp.ndarray) -> jnp.ndarray:
    """R I R^T per body ([nb,3,3]) via mul+reduce (no dot_general)."""
    I_body = jnp.asarray(model.body_inertia)
    RI = (R[:, :, :, None] * I_body[:, None, :, :]).sum(2)      # R @ I
    return (RI[:, :, None, :] * R[:, None, :, :]).sum(-1)       # (RI) @ R^T


def _armature(model: Model) -> np.ndarray:
    arm = np.zeros(model.nq)
    for j in model.joints:
        if j.jtype != FREE:
            arm[j.q_idx] = j.armature
    return arm


def potential_energy(model: Model, q: jnp.ndarray) -> jnp.ndarray:
    pcom, _ = _fk_com(model, q)
    g = jnp.asarray(model.gravity)
    return -jnp.sum(jnp.asarray(model.body_mass) * (pcom * g[None, :]).sum(-1))


def mass_matrix_fk(model: Model, q: jnp.ndarray):
    """(M, pcom, R, dp, dR): the mass matrix plus the FK values and
    Jacobians it was assembled from — ONE ``jacfwd`` of FK gives
    J_v (COM linear) and J_omega (angular) per body, then
    M = sum_b m J_v^T J_v + J_w^T I_world J_w + diag(armature).
    Equals hessian_qd(T) exactly but costs only forward-mode passes.
    The FK Jacobians are returned so the contact solver can build contact-
    point Jacobians from them instead of running a second jacfwd pass
    (see _contact_forces_constraint)."""
    pcom, R = _fk_com(model, q)
    dp, dR = jax.jacfwd(lambda q_: _fk_com(model, q_))(q)  # [nb,3,n], [nb,3,3,n]
    # J_omega[:, :, i] = vee(dR[..., i] @ R^T)
    W = (dR[:, :, None, :, :] * R[:, None, :, :, None]).sum(3)   # bijn,bkj->bikn
    Jw = 0.5 * jnp.stack(
        [W[:, 2, 1] - W[:, 1, 2], W[:, 0, 2] - W[:, 2, 0], W[:, 1, 0] - W[:, 0, 1]], axis=1
    )  # [nb, 3, n]
    mass = jnp.asarray(model.body_mass)
    I_world = _inertia_world(model, R)
    M = (mass[:, None, None, None] * dp[:, :, :, None] * dp[:, :, None, :]).sum((0, 1))
    IJw = (I_world[:, :, :, None] * Jw[:, None, :, :]).sum(2)    # I @ Jw
    M = M + (Jw[:, :, :, None] * IJw[:, :, None, :]).sum((0, 1))
    return M + jnp.diag(jnp.asarray(_armature(model))), pcom, R, dp, dR


def mass_matrix(model: Model, q: jnp.ndarray) -> jnp.ndarray:
    """M(q); see mass_matrix_fk."""
    return mass_matrix_fk(model, q)[0]


# ---------------------------------------------------------------------------
# forces
# ---------------------------------------------------------------------------
def _passive_joint_forces(
    model: Model, q: jnp.ndarray, qd: jnp.ndarray, m_diag: jnp.ndarray,
    include_limits: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Joint springs + limit penalty springs, and the joint-space damping
    DIAGONAL (joint damping + limit damping) to be integrated implicitly —
    explicit damping at these gains is unstable when a model starts on its
    limits (walker2d/hopper ranges end at 0)."""
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
    tau = -jnp.asarray(stiffness) * (q - jnp.asarray(springref))
    if not include_limits:
        # constraint mode: limits are rows in the soft-constraint solver
        return tau, jnp.asarray(damping)
    # limits: penalty spring with per-dof gains scaled by the joint's own
    # inertia (MuJoCo solreflimit=(0.02, 1) critically damped analogue)
    omega_l = 2.0 / 0.02
    k_lim = m_diag * omega_l * omega_l
    d_lim = 2.0 * m_diag * omega_l
    viol_hi = jnp.maximum(q - jnp.asarray(hi), 0.0)
    viol_lo = jnp.maximum(jnp.asarray(lo) - q, 0.0)
    in_viol = (viol_hi > 0) | (viol_lo > 0)
    tau = tau - k_lim * viol_hi + k_lim * viol_lo
    D = jnp.asarray(damping) + jnp.where(in_viol, d_lim, 0.0)
    return tau, D


def _external_forces(
    model: Model, q: jnp.ndarray, qd: jnp.ndarray, include_contacts: bool = True
) -> jnp.ndarray:
    """Generalized forces from plane contacts (penalty model) + ambient
    fluid, via ONE vjp of FK with world-frame forces/torques as cotangents.
    ``include_contacts=False`` gives the fluid-only part (the constraint
    contact model handles contacts separately)."""
    nc = len(model.contact_radius) if include_contacts else 0
    has_fluid = model.fluid_density > 0 or model.fluid_viscosity > 0
    if nc == 0 and not has_fluid:
        return jnp.zeros(model.nq)

    def points_and_frames(q):
        pcom, R = _fk_com(model, q)
        out = [pcom, R]
        if nc:
            cb = jnp.asarray(model.contact_body)
            off = jnp.asarray(model.contact_offset)
            p, Rb = forward_kinematics(model, q)
            x = p[cb] + mv(Rb[cb], off)
            out.append(x)
        return tuple(out)

    prim, tangent = jax.jvp(points_and_frames, (q,), (qd,))
    pcom, R = prim[0], prim[1]
    vcom, Rd = tangent[0], tangent[1]

    F_com = jnp.zeros_like(pcom)
    T_body = jnp.zeros_like(pcom)
    f_contact = None

    if has_fluid:
        W = (Rd[:, :, None, :] * R[:, None, :, :]).sum(-1)
        omega = 0.5 * jnp.stack(
            [W[:, 2, 1] - W[:, 1, 2], W[:, 0, 2] - W[:, 2, 0], W[:, 1, 0] - W[:, 0, 1]], axis=1
        )
        # equivalent inertia box (MuJoCo legacy fluid model)
        m = np.maximum(model.body_mass, 1e-9)
        diag = np.einsum("bii->bi", model.body_inertia)
        # MuJoCo equivalent inertia box (engine_passive.c mj_inertiaBoxFluid):
        # box_x^2 = 6*(I_y + I_z - I_x)/m  (FULL edge length squared)
        box2 = np.maximum(
            6.0 / m[:, None] * (diag.sum(1, keepdims=True) - 2 * diag), 1e-8
        )
        box = np.sqrt(box2)  # full edge lengths
        half = jnp.asarray(box / 2.0)
        v_l = (R * vcom[:, :, None]).sum(1)  # R^T v: world -> body
        w_l = (R * omega[:, :, None]).sum(1)
        d_eq = jnp.asarray(box.mean(axis=1))
        mu = model.fluid_viscosity
        rho = model.fluid_density
        F_l = -3.0 * jnp.pi * mu * d_eq[:, None] * v_l
        T_l = -jnp.pi * mu * (d_eq**3)[:, None] * w_l
        if rho > 0:
            area = jnp.stack(
                [4 * half[:, 1] * half[:, 2], 4 * half[:, 0] * half[:, 2], 4 * half[:, 0] * half[:, 1]],
                axis=1,
            )
            F_l = F_l - 0.5 * rho * area * jnp.abs(v_l) * v_l
            # quadratic rotational drag over the box faces
            it = jnp.stack(
                [
                    half[:, 1] ** 4 * half[:, 2] + half[:, 2] ** 4 * half[:, 1],
                    half[:, 0] ** 4 * half[:, 2] + half[:, 2] ** 4 * half[:, 0],
                    half[:, 0] ** 4 * half[:, 1] + half[:, 1] ** 4 * half[:, 0],
                ],
                axis=1,
            )
            T_l = T_l - 0.5 * rho * it * jnp.abs(w_l) * w_l
        F_com = F_com + mv(R, F_l)
        T_body = T_body + mv(R, T_l)

    if nc:
        x, v = prim[2], tangent[2]
        r = jnp.asarray(model.contact_radius)
        mu_c = jnp.asarray(model.contact_friction)
        depth = r - x[:, 2]
        active = depth > 0
        kp, kd = model.contact_stiffness, model.contact_damping
        fn = jnp.where(active, jnp.maximum(kp * depth - kd * v[:, 2], 0.0), 0.0)
        vt = v[:, :2]
        speed = jnp.sqrt(jnp.sum(vt * vt, axis=1) + 1e-12)
        # viscous tangential force capped by the Coulomb cone
        kt = 2.0 * kd
        ft_mag = jnp.minimum(kt * speed, mu_c * fn)
        ft = -vt * (ft_mag / speed)[:, None]
        f_contact = jnp.concatenate([ft, fn[:, None]], axis=1)

    # power-conjugate cotangents: force on COM point, ½ hat(T) R on rotation
    cot_R = 0.5 * mm(_hat_batch(T_body), R)
    cots = [F_com, cot_R]
    if nc:
        cots.append(f_contact)
    _, pullback = jax.vjp(points_and_frames, q)
    (tau,) = pullback(tuple(cots))
    return tau


def _impedance(solimp: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """MuJoCo position-dependent impedance d(r) (Computation docs):
    two-piece power sigmoid from d0 to dmax over |pos|/width."""
    d0, dmax, width, mid, power = (solimp[:, i] for i in range(5))
    x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, 1e-12), 0.0, 1.0)
    lo = mid * (x / mid) ** power
    hi = 1.0 - (1.0 - mid) * ((1.0 - x) / (1.0 - mid)) ** power
    s = jnp.where(x < mid, lo, hi)
    return jnp.clip(d0 + s * (dmax - d0), 1e-4, 0.9999)


def _sol_kb(solref: jnp.ndarray, solimp: jnp.ndarray, pos: jnp.ndarray):
    """(d, k, b) from solref/solimp at violation pos (MuJoCo Computation
    chapter; validated against mjData.efc_aref/efc_R)."""
    d = _impedance(solimp, pos)
    tau_c, zeta = solref[:, 0], solref[:, 1]
    dmax = solimp[:, 1]
    k = d / (dmax * dmax * tau_c * tau_c * zeta * zeta)
    b = 2.0 / (dmax * tau_c)
    return d, k, b


def _seg_seg_closest(p1, q1, p2, q2, eps: float = 1e-9):
    """Closest-point parameters (s, t) in [0,1] between segments
    [p1,q1] and [p2,q2], vectorized over the leading axis (Ericson,
    Real-Time Collision Detection 5.1.9; branchless via where so it
    vmaps/jits cleanly). Zero-length segments (spheres) degenerate safely."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = (d1 * d1).sum(-1)
    e = (d2 * d2).sum(-1)
    f = (d2 * r).sum(-1)
    c = (d1 * r).sum(-1)
    b = (d1 * d2).sum(-1)
    a_s = jnp.where(a > eps, a, 1.0)
    e_s = jnp.where(e > eps, e, 1.0)
    denom = a * e - b * b
    s0 = jnp.where(
        denom > eps,
        jnp.clip((b * f - c * e) / jnp.where(denom > eps, denom, 1.0), 0.0, 1.0),
        0.0,
    )
    t0 = (b * s0 + f) / e_s
    # re-clamp s for t outside [0,1] (closest point on seg2 is an endpoint)
    s = jnp.where(
        t0 < 0.0,
        jnp.clip(-c / a_s, 0.0, 1.0),
        jnp.where(t0 > 1.0, jnp.clip((b - c) / a_s, 0.0, 1.0), s0),
    )
    # degenerate segments: point-vs-seg / point-vs-point
    s = jnp.where(a > eps, s, 0.0)
    s = jnp.where((e > eps) | (a <= eps), s, jnp.clip(-c / a_s, 0.0, 1.0))
    t = jnp.where(e > eps, jnp.clip(t0, 0.0, 1.0), 0.0)
    return s, t


def _contact_forces_constraint(
    model: Model, q: jnp.ndarray, qd: jnp.ndarray, f_free: jnp.ndarray, M: jnp.ndarray,
    fk=None,
) -> jnp.ndarray:
    """Generalized constraint force (plane contacts + joint limits) from
    MuJoCo's soft-constraint model.

    Solves the regularized dual QP  min_{lam>=0} 1/2 lam^T (A+R) lam +
    lam^T (a0 - aref)  with contacts in the PYRAMIDAL facet basis (rows
    n +- mu t, the MuJoCo default cone) and one row per violated joint
    limit, where A = J M^-1 J^T, aref = -b v - k pos with k, b from
    solref and impedance d from solimp, R_ii = (1-d)/d A_ii for limits
    and (1-d)/d * 2 muc^2 (1+muc^2) A_nn (muc = max(mu,1)) for pyramid
    rows — both reverse-engineered from and validated against
    mjData.efc_* / qfrc_constraint (tests/test_physics_contact.py).

    TPU-native shape: all candidate rows are computed every substep with
    inactive rows masked (static shapes), and the QP is solved with a
    fixed-iteration accelerated projected gradient (APGD) — fully
    vectorized, no data-dependent control flow, batched over envs by the
    caller's vmap."""
    nc = len(model.contact_radius)
    nl = len(model.limit_q_idx)
    L_M = chol(M)
    qdd0 = chol_solve(L_M, f_free)

    J_rows, vel_rows, bias_rows, aref_rows, act_rows, R_rows = [], [], [], [], [], []

    if nc:
        cb = jnp.asarray(model.contact_body)
        e = jnp.asarray(model.contact_offset - model.body_com[model.contact_body])

        def xc(q_):
            pcom, R = _fk_com(model, q_)
            return pcom[cb] + mv(R[cb], e)

        if fk is not None:
            # reuse the FK values/Jacobians mass_matrix_fk already computed:
            # x = p[cb] + R[cb] e,  J = dp[cb] + dR[cb] e,  v = J qd —
            # identical math to jacfwd(xc), one full FK-jacfwd pass cheaper
            pcom_, R_, dp_, dR_ = fk
            x = pcom_[cb] + mv(R_[cb], e)
            J = dp_[cb] + (dR_[cb] * e[:, None, :, None]).sum(2)  # [nc,3,nq]
            v = (J * qd[None, None, :]).sum(-1)
        else:
            x, v = jax.jvp(xc, (q,), (qd,))
            J = jax.jacfwd(xc)(q)  # [nc, 3, nq]
        # contact-point acceleration bias (Jdot qd)
        _, a_bias = jax.jvp(lambda q_: jax.jvp(xc, (q_,), (qd,))[1], (q,), (qd,))

        radius = jnp.asarray(model.contact_radius)
        margin = jnp.asarray(model.contact_margin)
        dist = x[:, 2] - radius
        pos = dist - margin            # < 0 when the constraint is violated
        active = dist < margin

        d, k, b = _sol_kb(
            jnp.asarray(model.contact_solref), jnp.asarray(model.contact_solimp), pos
        )

        # pyramidal facets: rows (z + s*mu*x), (z + s*mu*y), s in {+1,-1}
        mu = jnp.asarray(model.contact_friction)
        sgn = jnp.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]])  # [4,2]
        tan = sgn[None, :, 0, None] * J[:, None, 0, :] + sgn[None, :, 1, None] * J[:, None, 1, :]
        Jf = J[:, None, 2, :] + mu[:, None, None] * tan        # [nc, 4, nq]
        vt = sgn[None, :, 0] * v[:, None, 0] + sgn[None, :, 1] * v[:, None, 1]
        vel_f = v[:, None, 2] + mu[:, None] * vt               # [nc, 4]
        bt = sgn[None, :, 0] * a_bias[:, None, 0] + sgn[None, :, 1] * a_bias[:, None, 1]
        bias_f = a_bias[:, None, 2] + mu[:, None] * bt         # [nc, 4]

        Jn = J[:, 2, :] * active[:, None]                      # [nc, nq]
        A_nn = jnp.sum(Jn * chol_solve(L_M, Jn.T).T, axis=1)
        muc = jnp.maximum(mu, 1.0)
        R_c = (1.0 - d) / d * 2.0 * muc * muc * (1.0 + muc * muc) * A_nn

        J_rows.append((Jf * active[:, None, None]).reshape(nc * 4, model.nq))
        vel_rows.append(vel_f.reshape(-1))
        bias_rows.append((bias_f * active[:, None]).reshape(-1))
        aref_rows.append((-b[:, None] * vel_f - k[:, None] * pos[:, None]).reshape(-1))
        act_rows.append(jnp.repeat(active, 4))
        R_rows.append(jnp.repeat(R_c, 4))

    npair = (
        len(model.pair_body1)
        if getattr(model, "enable_pair_contacts", False) and model.pair_body1 is not None
        else 0
    )
    if npair:
        # geom-pair (self-collision) rows: one contact per candidate pair at
        # the segment-segment closest points (MuJoCo capsule-capsule
        # narrowphase). condim-1 pairs (e.g. every humanoid body pair —
        # geom default condim=1 in humanoid.xml) contribute a single
        # frictionless normal row; condim>=3 pairs get the 4 pyramidal
        # facets like floor contacts. The row Jacobian is the gradient of
        # the pair distance: by the envelope theorem (s*, t* are the
        # minimizers) that is n . (Jc1 - Jc2) at fixed (s*, t*), composed
        # from the FK Jacobians mass_matrix_fk already produced — no extra
        # jacfwd pass.
        b1 = jnp.asarray(model.pair_body1)
        b2 = jnp.asarray(model.pair_body2)
        ea1 = jnp.asarray(model.pair_a1 - model.body_com[model.pair_body1])
        eb1 = jnp.asarray(model.pair_b1 - model.body_com[model.pair_body1])
        ea2 = jnp.asarray(model.pair_a2 - model.body_com[model.pair_body2])
        eb2 = jnp.asarray(model.pair_b2 - model.body_com[model.pair_body2])

        if fk is not None:
            pcom_, R_, dp_, dR_ = fk
        else:
            pcom_, R_ = _fk_com(model, q)
            dp_, dR_ = jax.jacfwd(lambda q_: _fk_com(model, q_))(q)

        def _pt(bi, e):
            x = pcom_[bi] + mv(R_[bi], e)
            Jx = dp_[bi] + (dR_[bi] * e[:, None, :, None]).sum(2)  # [np,3,nq]
            return x, Jx

        A1, JA1 = _pt(b1, ea1)
        B1, JB1 = _pt(b1, eb1)
        A2, JA2 = _pt(b2, ea2)
        B2, JB2 = _pt(b2, eb2)
        s_p, t_p = _seg_seg_closest(A1, B1, A2, B2)
        c1 = A1 + s_p[:, None] * (B1 - A1)
        c2 = A2 + t_p[:, None] * (B2 - A2)
        dvec = c1 - c2
        dist_p = jnp.sqrt((dvec * dvec).sum(-1) + 1e-12)
        n_p = dvec / dist_p[:, None]
        Jrel = (
            JA1 + s_p[:, None, None] * (JB1 - JA1)
            - JA2 - t_p[:, None, None] * (JB2 - JA2)
        )  # [np, 3, nq]
        Jn = (n_p[:, :, None] * Jrel).sum(1)  # [np, nq]

        sdist = dist_p - jnp.asarray(model.pair_radius)
        marg_p = jnp.asarray(model.pair_margin)
        pos_p = sdist - marg_p
        active_p = sdist < marg_p
        d_p, k_p, b_pc = _sol_kb(
            jnp.asarray(model.pair_solref), jnp.asarray(model.pair_solimp), pos_p
        )
        vel_n = (Jn * qd[None, :]).sum(-1)

        # Jdot qd bias of the relative closest-point (fixed s*, t*), same
        # double-jvp pattern as the floor-contact a_bias
        sg = jax.lax.stop_gradient(s_p)
        tg = jax.lax.stop_gradient(t_p)

        def relp(q_):
            p_, R__ = _fk_com(model, q_)
            a1_ = p_[b1] + mv(R__[b1], ea1)
            b1_ = p_[b1] + mv(R__[b1], eb1)
            a2_ = p_[b2] + mv(R__[b2], ea2)
            b2_ = p_[b2] + mv(R__[b2], eb2)
            return (a1_ + sg[:, None] * (b1_ - a1_)) - (a2_ + tg[:, None] * (b2_ - a2_))

        _, rel_bias = jax.jvp(
            lambda q_: jax.jvp(relp, (q_,), (qd,))[1], (q,), (qd,)
        )
        bias_n = (n_p * rel_bias).sum(1)

        Jn_act = Jn * active_p[:, None]
        A_nn_p = jnp.sum(Jn_act * chol_solve(L_M, Jn_act.T).T, axis=1)

        idx1 = np.where(np.asarray(model.pair_condim) < 3)[0]
        idx3 = np.where(np.asarray(model.pair_condim) >= 3)[0]
        if len(idx1):
            i1 = jnp.asarray(idx1)
            J_rows.append(Jn_act[i1])
            vel_rows.append(vel_n[i1])
            bias_rows.append((bias_n * active_p)[i1])
            aref_rows.append(((-b_pc * vel_n - k_p * pos_p) * active_p)[i1])
            act_rows.append(active_p[i1])
            # frictionless rows regularize like limit rows: R = (1-d)/d A_ii
            R_rows.append(((1.0 - d_p) / d_p * A_nn_p)[i1])
        if len(idx3):
            i3 = jnp.asarray(idx3)
            # tangent frame from the contact normal (any orthonormal pair)
            ref = jnp.where(
                (jnp.abs(n_p[i3, 0]) < 0.9)[:, None],
                jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (len(idx3), 3)),
                jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (len(idx3), 3)),
            )
            t1 = jnp.cross(ref, n_p[i3])
            t1 = t1 / jnp.sqrt((t1 * t1).sum(-1, keepdims=True) + 1e-12)
            t2 = jnp.cross(n_p[i3], t1)
            mu_p = jnp.asarray(model.pair_friction)[i3]
            # Friction acts at the contact SURFACE point, not at the segment
            # closest points: the tangential rows must see the material
            # velocity there (incl. omega x r), otherwise spheres transmit no
            # rolling torque and a ball perched on a ball sticks where
            # MuJoCo's rolls off. Contact pos is midway between the two
            # surfaces along the normal (MuJoCo mjc_convex convention); its
            # body-local coords are held fixed for the row Jacobians.
            r1_p = jnp.asarray(model.pair_r1)[i3]
            r2_p = (jnp.asarray(model.pair_radius) - jnp.asarray(model.pair_r1))[i3]
            b1i, b2i = b1[i3], b2[i3]
            pc = 0.5 * (c1[i3] + c2[i3]) + 0.5 * (r2_p - r1_p)[:, None] * n_p[i3]
            e1c = (R_[b1i] * (pc - pcom_[b1i])[:, :, None]).sum(1)  # R^T (pc - com)
            e2c = (R_[b2i] * (pc - pcom_[b2i])[:, :, None]).sum(1)
            J1c = dp_[b1i] + (dR_[b1i] * e1c[:, None, :, None]).sum(2)
            J2c = dp_[b2i] + (dR_[b2i] * e2c[:, None, :, None]).sum(2)
            Jc = J1c - J2c  # [k, 3, nq] relative material-point Jacobian
            Jt1 = (t1[:, :, None] * Jc).sum(1)
            Jt2 = (t2[:, :, None] * Jc).sum(1)
            sgn_p = jnp.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]])
            tanJ = (
                sgn_p[None, :, 0, None] * Jt1[:, None, :]
                + sgn_p[None, :, 1, None] * Jt2[:, None, :]
            )
            Jf_p = Jn[i3][:, None, :] + mu_p[:, None, None] * tanJ  # [k,4,nq]
            vt1 = (Jt1 * qd[None, :]).sum(-1)
            vt2 = (Jt2 * qd[None, :]).sum(-1)
            vtt = sgn_p[None, :, 0] * vt1[:, None] + sgn_p[None, :, 1] * vt2[:, None]
            vel_f = vel_n[i3][:, None] + mu_p[:, None] * vtt
            # Jdot qd bias at the contact material points (fixed body-local
            # coords), same double-jvp as the center-segment bias above
            e1g = jax.lax.stop_gradient(e1c)
            e2g = jax.lax.stop_gradient(e2c)

            def relc(q_):
                p_, R__ = _fk_com(model, q_)
                return (p_[b1i] + mv(R__[b1i], e1g)) - (p_[b2i] + mv(R__[b2i], e2g))

            _, relc_bias = jax.jvp(
                lambda q_: jax.jvp(relc, (q_,), (qd,))[1], (q,), (qd,)
            )
            bt1 = (t1 * relc_bias).sum(1)
            bt2 = (t2 * relc_bias).sum(1)
            btt = sgn_p[None, :, 0] * bt1[:, None] + sgn_p[None, :, 1] * bt2[:, None]
            bias_f = bias_n[i3][:, None] + mu_p[:, None] * btt
            act3 = active_p[i3]
            muc_p = jnp.maximum(mu_p, 1.0)
            R_p3 = (
                (1.0 - d_p[i3]) / d_p[i3]
                * 2.0 * muc_p * muc_p * (1.0 + muc_p * muc_p) * A_nn_p[i3]
            )
            J_rows.append((Jf_p * act3[:, None, None]).reshape(len(idx3) * 4, model.nq))
            vel_rows.append(vel_f.reshape(-1))
            bias_rows.append((bias_f * act3[:, None]).reshape(-1))
            aref_rows.append(
                ((-b_pc[i3][:, None] * vel_f - k_p[i3][:, None] * pos_p[i3][:, None])
                 * act3[:, None]).reshape(-1)
            )
            act_rows.append(jnp.repeat(act3, 4))
            R_rows.append(jnp.repeat(R_p3, 4))

    if nl:
        li = jnp.asarray(model.limit_q_idx)
        lo = jnp.asarray(model.limit_range)[:, 0]
        hi = jnp.asarray(model.limit_range)[:, 1]
        d_lo = q[li] - lo
        d_hi = hi - q[li]
        side = jnp.where(d_lo < d_hi, 1.0, -1.0)     # +1: lower limit row
        dist_l = jnp.minimum(d_lo, d_hi)
        active_l = dist_l < 0.0                       # limits have no margin
        d_l, k_l, b_l = _sol_kb(
            jnp.asarray(model.limit_solref), jnp.asarray(model.limit_solimp), dist_l
        )
        Jl = side[:, None] * jax.nn.one_hot(li, model.nq, dtype=q.dtype)
        Jl = Jl * active_l[:, None]
        vel_l = side * qd[li]
        Minv_diag = jnp.diagonal(chol_solve(L_M, jnp.eye(model.nq, dtype=q.dtype)))
        R_l = (1.0 - d_l) / d_l * Minv_diag[li]

        J_rows.append(Jl)
        vel_rows.append(vel_l)
        bias_rows.append(jnp.zeros(nl, q.dtype))
        aref_rows.append(-b_l * vel_l - k_l * dist_l)
        act_rows.append(active_l)
        R_rows.append(R_l)

    Jr = jnp.concatenate(J_rows, axis=0)
    act = jnp.concatenate(act_rows)
    aref = jnp.concatenate(aref_rows) * act
    bias = jnp.concatenate(bias_rows)
    Rreg = jnp.maximum(jnp.concatenate(R_rows), 1e-10)

    a0 = mv(Jr, qdd0) + bias
    MinvJT = chol_solve(L_M, Jr.T)                         # [nq, nr]
    A = (Jr[:, None, :] * MinvJT.T[None, :, :]).sum(-1)    # [nr, nr]
    g0 = a0 - aref

    # APGD with Gershgorin step bound (deterministic, fixed iterations)
    L = jnp.max(jnp.sum(jnp.abs(A), axis=1) + Rreg) + 1e-8

    def body(carry, _):
        lam, y, t = carry
        grad = mv(A, y) + Rreg * y + g0
        lam_new = jnp.maximum(y - grad / L, 0.0)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = lam_new + (t - 1.0) / t_new * (lam_new - lam)
        return (lam_new, y_new, t_new), None

    lam0 = jnp.zeros(Jr.shape[0], q.dtype)
    (lam, _, _), _ = jax.lax.scan(
        body, (lam0, lam0, jnp.asarray(1.0, q.dtype)), None,
        length=int(getattr(model, "contact_iterations", 30)),
    )
    return (Jr * lam[:, None]).sum(0)


def _hat_batch(v: jnp.ndarray) -> jnp.ndarray:
    z = jnp.zeros_like(v[:, 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[:, 2], v[:, 1]], axis=1),
            jnp.stack([v[:, 2], z, -v[:, 0]], axis=1),
            jnp.stack([-v[:, 1], v[:, 0], z], axis=1),
        ],
        axis=1,
    )


# ---------------------------------------------------------------------------
# actuation + integration
# ---------------------------------------------------------------------------
def actuation(model: Model, ctrl: jnp.ndarray) -> jnp.ndarray:
    """Map clipped controls through gears onto joint dofs."""
    tau = jnp.zeros(model.nq)
    for i, a in enumerate(model.actuators):
        c = jnp.clip(ctrl[i], a.ctrlrange[0], a.ctrlrange[1])
        tau = tau.at[a.q_idx].add(a.gear * c)
    return tau


def bias_force(model: Model, q: jnp.ndarray, qd: jnp.ndarray) -> jnp.ndarray:
    """Exact Coriolis/centrifugal bias  ∂T/∂q − Ṁqd  (so that
    M q̈ = τ + bias − ∂V/∂q), from two second-order AD passes — no
    Christoffel symbols, no RNEA."""
    dTdq = jax.grad(lambda q_: kinetic_energy(model, q_, qd))(q)
    # Ṁ qd = d/dq (∂T/∂qd) · qd   (directional derivative along qd)
    _, mdot_qd = jax.jvp(
        lambda q_: jax.grad(lambda qd_: kinetic_energy(model, q_, qd_))(qd), (q,), (qd,)
    )
    return dTdq - mdot_qd


def _substep(model: Model, q: jnp.ndarray, qd: jnp.ndarray, tau_act: jnp.ndarray, dt: float):
    M, pcom, R, dp, dR = mass_matrix_fk(model, q)
    m_diag = jnp.diagonal(M)
    n_pairs = (
        len(model.pair_body1)
        if getattr(model, "enable_pair_contacts", False) and model.pair_body1 is not None
        else 0
    )
    use_constraint = getattr(model, "contact_model", "penalty") == "constraint" and (
        len(model.contact_radius) > 0 or len(model.limit_q_idx) > 0 or n_pairs > 0
    )
    tau_p, D = _passive_joint_forces(
        model, q, qd, m_diag, include_limits=not use_constraint
    )
    # grad of the Lagrangian L = T - V in ONE reverse pass (fuses the
    # Coriolis dT/dq and gravity -dV/dq terms' FK work)
    dLdq = jax.grad(lambda q_: kinetic_energy(model, q_, qd) - potential_energy(model, q_))(q)
    _, mdot_qd = jax.jvp(
        lambda q_: jax.grad(lambda qd_: kinetic_energy(model, q_, qd_))(qd), (q,), (qd,)
    )
    f = tau_act + dLdq - mdot_qd + tau_p + _external_forces(
        model, q, qd, include_contacts=not use_constraint
    )
    if use_constraint:
        # the solver's unconstrained acceleration a0 sees the damping force
        # explicitly (as MuJoCo's does); the integrator below still applies
        # damping implicitly, so it is NOT added to f itself
        f = f + _contact_forces_constraint(model, q, qd, f - D * qd, M,
                                           fk=(pcom, R, dp, dR))
    # semi-implicit Euler with IMPLICIT joint-space damping:
    # (M + dt·diag(D)) qd' = M qd + dt·f  — unconditionally stable in D.
    # A is SPD (M is a mass matrix + armature, D >= 0) -> Cholesky solve.
    A = M + dt * jnp.diag(D)
    qd_new = chol_solve(chol(A), mv(M, qd) + dt * f)
    q_new = q + dt * qd_new
    return q_new, qd_new


def _rotvec_jacobian(r: jnp.ndarray) -> jnp.ndarray:
    """B(r) with omega = B(r) @ rdot, from autodiff of the exp map."""

    def omega_of(rd):
        R, Rd = jax.jvp(rotvec_to_mat, (r,), (rd,))
        W = (Rd[:, None, :] * R[None, :, :]).sum(-1)  # Rd @ R^T
        return 0.5 * jnp.array([W[2, 1] - W[1, 2], W[0, 2] - W[2, 0], W[1, 0] - W[0, 1]])

    return jax.vmap(omega_of)(jnp.eye(3, dtype=r.dtype)).T


def _remap_free_rotations(model: Model, q: jnp.ndarray, qd: jnp.ndarray):
    """Keep free-joint rotation vectors in |r| <= pi: the exp map is
    singular at |r| = 2*pi (mass matrix in these coordinates drops rank),
    so a tumbling body must be re-chartted. r -> r(1 - 2*pi/|r|) is the
    same rotation; rdot is remapped so the physical angular velocity is
    unchanged (omega = B(r) rdot = B(r') rdot')."""
    for j in model.joints:
        if j.jtype != FREE:
            continue
        i = j.q_idx + 3
        r = q[i : i + 3]
        rd = qd[i : i + 3]
        norm = jnp.sqrt(jnp.sum(r * r) + 1e-12)
        need = norm > jnp.pi
        r_new = r * (1.0 - 2.0 * jnp.pi / norm)
        omega = mv(_rotvec_jacobian(r), rd)
        rd_new = mv(inv3(_rotvec_jacobian(r_new)), omega)
        q = q.at[i : i + 3].set(jnp.where(need, r_new, r))
        qd = qd.at[i : i + 3].set(jnp.where(need, rd_new, rd))
    return q, qd


def step(
    model: Model,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    ctrl: jnp.ndarray,
    frame_skip: int = 1,
    substeps: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Advance ``frame_skip`` model timesteps (each split into ``substeps``
    integrator substeps; the default is integrator-aware, see below).
    Returns (q, qd).

    Substep default (measured on scripts/physics_parity.py, per-step qvel
    error vs real MuJoCo): for models that *declare* Euler integration
    (MuJoCo's default; of the benchmark set only HalfCheetah) the most
    faithful choice is to match the source model's own discretization, i.e.
    substeps=1: MuJoCo Euler IS semi-implicit Euler at dt=timestep, and
    HalfCheetah measures 3.3% rel error at substeps=1 vs 8.2% at substeps=5.
    For RK4 models (Hopper/Walker2d at dt=2ms, Swimmer/Ant at 10ms,
    Humanoid at 3ms) the source is a higher-order integrator, so we keep
    subdividing to dt<=2ms (Ant: 16.6% at substeps=1, 4.7% at substeps=5).
    Pass ``substeps`` explicitly (or set ``MujocoEnv.substeps``) to
    override."""
    if substeps is None:
        if getattr(model, "integrator", "euler") == "euler":
            substeps = 1
        else:
            substeps = max(1, int(np.ceil(model.timestep / 0.002 - 1e-9)))
    tau = actuation(model, ctrl)
    dt = model.timestep / substeps
    n = frame_skip * substeps
    has_free = any(j.jtype == FREE for j in model.joints)

    def body(carry, _):
        q, qd = carry
        q, qd = _substep(model, q, qd, tau, dt)
        if has_free:
            q, qd = _remap_free_rotations(model, q, qd)
        return (q, qd), None

    # Pin every matmul in the dynamics to true fp32: TPU matmuls default to
    # bf16 multiplicands (8-bit mantissa), which is fine for neural nets but
    # corrupts the small-force balance the physics depends on (Swimmer's
    # viscous propulsion is O(1e-2) against O(1) inertia terms; trained
    # returns cap at ~half the reference under default precision). The
    # matrices here are tiny (nq<=23), so fp32 costs nothing measurable.
    with jax.default_matmul_precision("float32"):
        (q, qd), _ = jax.lax.scan(body, (q, qd), None, length=n)
    return q, qd


def init_state(model: Model) -> tuple[jnp.ndarray, jnp.ndarray]:
    return jnp.asarray(model.qpos0, jnp.float32), jnp.zeros(model.nq, jnp.float32)
