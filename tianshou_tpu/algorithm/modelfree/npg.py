"""NPG (natural policy gradient).

Rebuild of reference ``modelfree/npg.py:27``: natural gradient via conjugate
gradient on Fisher-vector products (Hessian of the KL to the rollout-time
policy), fixed-size trust-region step for the actor, plain gradient descent
for the critic (``optim_critic_iters`` steps per minibatch).

All linear algebra runs on flattened params (``ravel_pytree``); the CG loop
is a fixed-iteration ``fori_loop``, so the whole update stays one XLA
program.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from tianshou_tpu.algorithm.base import TrainState
from tianshou_tpu.algorithm.modelfree.onpolicy import OnPolicyActorCritic
from tianshou_tpu.data.batch import Batch

__all__ = ["NPG", "conjugate_gradient"]


def conjugate_gradient(mvp, b: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Solve A x = b with A given implicitly by mvp (reference npg.py:187)."""

    def body(_, carry):
        x, r, p, rdotr = carry
        Ap = mvp(p)
        alpha = rdotr / (p @ Ap + 1e-8)
        x = x + alpha * p
        r = r - alpha * Ap
        new_rdotr = r @ r
        beta = new_rdotr / (rdotr + 1e-8)
        p = r + beta * p
        return x, r, p, new_rdotr

    x0 = jnp.zeros_like(b)
    x, *_ = jax.lax.fori_loop(0, iters, body, (x0, b, b, b @ b))
    return x


class NPG(OnPolicyActorCritic):
    def __init__(
        self,
        actor,
        critic,
        action_space,
        optim=None,
        trust_region_size: float = 0.5,
        optim_critic_iters: int = 5,
        damping: float = 0.1,
        cg_iters: int = 10,
        advantage_normalization: bool = True,
        **kwargs,
    ) -> None:
        super().__init__(
            actor=actor, critic=critic, action_space=action_space, optim=optim,
            advantage_normalization=advantage_normalization, **kwargs,
        )
        self.trust_region_size = trust_region_size
        self.optim_critic_iters = optim_critic_iters
        self.damping = damping
        self.cg_iters = cg_iters

    # ------------------------------------------------------------------
    def _actor_objective(self, pa: Any, mb: Batch) -> jnp.ndarray:
        """Surrogate to MAXIMIZE: E[ratio * adv] (reference npg.py:110)."""
        dist = self._dist({"actor": pa}, mb.obs)
        ratio = jnp.exp(dist.log_prob(mb.act) - mb.logp_old)
        return (ratio * mb.adv).mean()

    def _kl_to_old(self, pa: Any, mb: Batch) -> jnp.ndarray:
        dist_old = self._dist_from_batch(mb.dist_old)
        dist = self._dist({"actor": pa}, mb.obs)
        return dist_old.kl_divergence(dist).mean()

    def _natural_step(self, pa: Any, mb: Batch) -> tuple[Any, jnp.ndarray, jnp.ndarray]:
        """Returns (search_direction_tree, objective, step_denominator sHs)."""
        flat_pa, unravel = ravel_pytree(pa)
        obj, g_tree = jax.value_and_grad(self._actor_objective)(pa, mb)
        g, _ = ravel_pytree(g_tree)

        def kl_flat(fp):
            return self._kl_to_old(unravel(fp), mb)

        def fvp(v):
            hv = jax.jvp(jax.grad(kl_flat), (flat_pa,), (v,))[1]
            return hv + self.damping * v

        s = conjugate_gradient(fvp, g, self.cg_iters)
        sHs = s @ fvp(s)
        return unravel(s), obj, sHs

    # ------------------------------------------------------------------
    def _update_minibatch(self, ts: TrainState, mb: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        pa = ts.params["actor"]
        s_tree, obj, sHs = self._natural_step(pa, mb)
        # fixed step along the natural direction (reference npg.py:170:
        # new = theta + trust_region_size * search_direction)
        new_pa = jax.tree.map(lambda p, d: p + self.trust_region_size * d, pa, s_tree)

        ts = ts.replace(params={**ts.params, "actor": new_pa})
        ts, vf_loss = self._critic_steps(ts, mb)
        kl = self._kl_to_old(ts.params["actor"], mb)
        ts = ts.replace(step=ts.step + 1)
        return ts, Batch(loss=-obj, actor_objective=obj, vf_loss=vf_loss, kl=kl)

    def _critic_steps(self, ts: TrainState, mb: Batch) -> tuple[TrainState, jnp.ndarray]:
        def one(carry, _):
            ts = carry

            def vloss(params):
                v = self._value(params, mb.obs)
                return ((mb.returns - v) ** 2).mean()

            loss, g_critic = jax.value_and_grad(lambda pc: vloss({"critic": pc}))(ts.params["critic"])
            grads = {
                "actor": jax.tree.map(jnp.zeros_like, ts.params["actor"]),
                "critic": g_critic,
            }
            new_params, new_opt = self._apply_grads(self.optim, ts.params, grads, ts.opt_state)
            # keep the actor untouched by the critic optimizer
            new_params["actor"] = ts.params["actor"]
            ts = ts.replace(params=new_params, opt_state=new_opt)
            return ts, loss

        ts, losses = jax.lax.scan(one, ts, None, length=self.optim_critic_iters)
        return ts, losses.mean()
