"""TRPO (trust region policy optimization, arXiv:1502.05477).

Rebuild of reference ``modelfree/trpo.py:23``: NPG search direction +
backtracking line search enforcing the KL constraint and objective
improvement. The line search is a fixed-depth ``fori_loop`` with select —
branch-free under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from tianshou_tpu.algorithm.base import TrainState
from tianshou_tpu.algorithm.modelfree.npg import NPG
from tianshou_tpu.data.batch import Batch

__all__ = ["TRPO"]


class TRPO(NPG):
    def __init__(
        self,
        *args,
        max_kl: float = 0.01,
        backtrack_coeff: float = 0.8,
        max_backtracks: int = 10,
        **kwargs,
    ) -> None:
        kwargs.setdefault("trust_region_size", max_kl)
        super().__init__(*args, **kwargs)
        self.max_kl = max_kl
        self.backtrack_coeff = backtrack_coeff
        self.max_backtracks = max_backtracks

    def _update_minibatch(self, ts: TrainState, mb: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        pa = ts.params["actor"]
        flat_pa, unravel = ravel_pytree(pa)
        s_tree, obj_old, sHs = self._natural_step(pa, mb)
        s_flat, _ = ravel_pytree(s_tree)
        full_step = jnp.sqrt(2.0 * self.max_kl / jnp.maximum(sHs, 1e-8)) * s_flat

        def eval_at(frac):
            fp = flat_pa + frac * full_step
            p = unravel(fp)
            return self._actor_objective(p, mb), self._kl_to_old(p, mb)

        def body(i, carry):
            best_frac, done = carry
            frac = self.backtrack_coeff**i
            obj, kl = eval_at(frac)
            ok = (kl <= self.max_kl) & (obj > obj_old) & ~done
            return jnp.where(ok, frac, best_frac), done | ok

        best_frac, accepted = jax.lax.fori_loop(
            0, self.max_backtracks, body, (jnp.float32(0.0), jnp.bool_(False))
        )
        new_flat = flat_pa + best_frac * full_step
        new_pa = unravel(new_flat)

        ts = ts.replace(params={**ts.params, "actor": new_pa})
        ts, vf_loss = self._critic_steps(ts, mb)
        kl = self._kl_to_old(ts.params["actor"], mb)
        ts = ts.replace(step=ts.step + 1)
        return ts, Batch(
            loss=-obj_old, actor_objective=obj_old, vf_loss=vf_loss, kl=kl,
            step_frac=best_frac, accepted=accepted.astype(jnp.float32),
        )
