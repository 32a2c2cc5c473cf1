"""Fused Pallas physics step: the whole frame_skip x substeps chain in ONE
TPU kernel.

Why: the jitted XLA substep is ~100 small VPU ops; on this backend each op
costs ~20 us of per-kernel overhead (measured, docs/03_benchmarks.md), so a
HalfCheetah env-step (5 substeps) pays ~2.5 ms/megastep in kernel-boundary
overhead alone — ~10x the FLOP time. Running the entire step chain inside
one `pl.pallas_call` removes every interior kernel boundary and HBM
round-trip: state lives in VMEM registers for the whole chain.

Layout: the kernel body IS :mod:`tianshou_tpu.env.physics.batched` — the
env-last (struct dims in sublanes, envs in lanes) re-expression of
`dynamics.py`'s math. Each grid step owns a [nq, BLOCK_E] slab of state;
the env axis rides the 128-wide lane dimension at full width. All
contractions are broadcast-multiply-reduce (no dot_general -> no MXU pass,
native fp32 on the VPU); autodiff (jvp/vjp/linearize for the Lagrangian
terms) happens at trace time, so the compiled kernel is a straight-line
elementwise program.

Parity: bit-compatible with `dynamics.step` up to fp32 reassociation
(tests/test_physics_fused.py runs the same tolerance gate as the batched
layout). Reference counterpart: none — the reference (thu-ml/tianshou)
delegates physics to MuJoCo on host CPU; this kernel is the TPU-native
replacement for that entire layer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tianshou_tpu.env.physics import batched as B
from tianshou_tpu.env.physics.model import FREE, Model

__all__ = ["fused_step", "fused_step_available"]


def fused_step_available() -> bool:
    """True when the default backend can run Mosaic TPU kernels."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _make_chain(model, dt, n, has_free):
    """The whole step chain as a pure fn of (q, qd, tau) slabs."""

    def chain(q, qd, tau):
        def body(_, carry):
            q, qd = carry
            q, qd = B.substep_b(model, q, qd, tau, dt)
            if has_free:
                q, qd = B._remap_free_b(model, q, qd)
            return (q, qd)

        return jax.lax.fori_loop(0, n, body, (q, qd))

    return chain


def fused_step(
    model: Model,
    q: jnp.ndarray,
    qd: jnp.ndarray,
    ctrl: jnp.ndarray,
    frame_skip: int = 1,
    substeps: int | None = None,
    block_e: int = 128,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Advance ``frame_skip`` model timesteps for env-last state.

    Args: ``q, qd: [nq, E]``, ``ctrl: [nu, E]`` (fp32, env axis LAST).
    E is padded to a multiple of ``block_e`` internally; each grid step
    integrates one [nq, block_e] slab entirely in VMEM.

    Not jitted here (Model is an unhashable pytree of numpy constants):
    close over the model and jit the caller, as with ``dynamics.step``.
    """
    if getattr(model, "enable_pair_contacts", False) and len(model.pair_body1):
        raise NotImplementedError(
            "geom-pair contacts are only implemented on the vmapped dynamics.step "
            "path; disable enable_pair_contacts or use physics_mode='xla' vmapped"
        )

    substeps = B.resolve_substeps(model, substeps)
    n = frame_skip * substeps
    dt = model.timestep / substeps
    has_free = any(j.jtype == FREE for j in model.joints)
    nq, E = q.shape

    tau = B.actuation_b(model, ctrl)  # [nq, E]; a handful of ops, stays in XLA

    E_pad = -(-E // block_e) * block_e
    if E_pad != E:
        pad = ((0, 0), (0, E_pad - E))
        # pad with the home state: padding lanes must stay numerically tame
        # (NaNs or zeros in a contact solve could poison reductions under
        # flush-to-zero), and home-state lanes integrate like real envs.
        q0 = jnp.asarray(model.qpos0, q.dtype)[:, None]
        q = jnp.pad(q, pad).at[:, E:].set(q0)
        qd = jnp.pad(qd, pad)
        tau = jnp.pad(tau, pad)

    # Pallas kernels may not capture array constants, and all the model's
    # static geometry (body offsets, rotations, solref tables, basis
    # matrices) enters the trace as jnp constants. Trace the chain to a
    # jaxpr once, hoist its consts into explicit kernel inputs (deduped —
    # the trace repeats identities/zeros per body), and eval the jaxpr
    # inside the kernel. The consts are tiny ([3], [3,3], [nc]-class) and
    # land in VMEM once per grid step.
    chain = _make_chain(model, dt, n, has_free)
    slab = jax.ShapeDtypeStruct((nq, block_e), q.dtype)
    closed = jax.make_jaxpr(chain)(slab, slab, slab)

    uniq: list[np.ndarray] = []
    index_of: list[int] = []
    seen: dict = {}
    for c in closed.consts:
        a = np.asarray(c)
        if a.ndim == 0:  # Mosaic VMEM wants >=1d; lift scalars
            a = a.reshape(1)
        key = (a.tobytes(), a.shape, str(a.dtype))
        if key not in seen:
            seen[key] = len(uniq)
            uniq.append(a)
        index_of.append(seen[key])
    const_shapes = [np.asarray(c).shape for c in closed.consts]

    def kernel(*refs):
        q_ref, qd_ref, tau_ref = refs[:3]
        uniq_refs = refs[3 : 3 + len(uniq)]
        qo_ref, qdo_ref = refs[3 + len(uniq) :]
        uvals = [r[...] for r in uniq_refs]
        cvals = [uvals[i].reshape(s) for i, s in zip(index_of, const_shapes)]
        q_new, qd_new = jax.core.eval_jaxpr(
            closed.jaxpr, cvals, q_ref[...], qd_ref[...], tau_ref[...]
        )
        qo_ref[...] = q_new
        qdo_ref[...] = qd_new

    grid = (E_pad // block_e,)
    spec = pl.BlockSpec((nq, block_e), lambda i: (0, i), memory_space=pltpu.VMEM)

    def _const_spec(c):
        nd = c.ndim
        return pl.BlockSpec(c.shape, lambda i, _nd=nd: (0,) * _nd, memory_space=pltpu.VMEM)

    q_new, qd_new = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec, *[_const_spec(c) for c in uniq]],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((nq, E_pad), q.dtype),
            jax.ShapeDtypeStruct((nq, E_pad), qd.dtype),
        ),
        interpret=interpret,
    )(q, qd, tau, *[jnp.asarray(u) for u in uniq])
    if E_pad != E:
        q_new, qd_new = q_new[:, :E], qd_new[:, :E]
    return q_new, qd_new
