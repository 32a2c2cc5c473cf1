"""TD3+BC (arXiv:2106.06860) for offline RL.

Rebuild of reference ``imitation/td3_bc.py:14``: TD3 with a behavior-cloning
regularizer on the actor, ``lambda = alpha / mean|Q|`` adaptive weighting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.base import TrainState
from tianshou_tpu.algorithm.modelfree.td3 import TD3
from tianshou_tpu.data.batch import Batch

__all__ = ["TD3BC"]


class TD3BC(TD3):
    run_mode = "offline"

    def __init__(self, *args, alpha: float = 2.5, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.bc_alpha = alpha

    def update_step(self, ts: TrainState, batch: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        weight = batch.get("weight", jnp.ones_like(batch.returns))

        def critic_loss(cp, cp2):
            q1 = self.critic.apply(cp, batch.obs, batch.act)
            q2 = self.critic.apply(cp2, batch.obs, batch.act)
            td1 = batch.returns - q1
            td2 = batch.returns - q2
            return (weight * (td1**2 + td2**2)).mean(), (td1 + td2) / 2.0

        (c_loss, td), (g1, g2) = jax.value_and_grad(critic_loss, argnums=(0, 1), has_aux=True)(
            ts.params["critic"], ts.params["critic2"]
        )
        new_c1, new_o1 = self._apply_grads(self.critic_optim, ts.params["critic"], g1, ts.opt_state["critic"])
        new_c2, new_o2 = self._apply_grads(self.critic_optim, ts.params["critic2"], g2, ts.opt_state["critic2"])

        def actor_loss(ap):
            a = self.actor.apply(ap, batch.obs)
            q = self.critic.apply(new_c1, batch.obs, a)
            lmbda = self.bc_alpha / jnp.maximum(jax.lax.stop_gradient(jnp.abs(q).mean()), 1e-8)
            bc = ((a - batch.act) ** 2).sum(-1).mean()
            return -lmbda * q.mean() + bc, bc

        (a_loss, bc), a_grads = jax.value_and_grad(actor_loss, has_aux=True)(ts.params["actor"])
        cand_actor, cand_aopt = self._apply_grads(self.policy_optim, ts.params["actor"], a_grads, ts.opt_state["actor"])
        do_update = (ts.step % self.update_actor_freq) == 0
        new_actor = jax.tree.map(lambda n, o: jnp.where(do_update, n, o), cand_actor, ts.params["actor"])
        new_aopt = jax.tree.map(lambda n, o: jnp.where(do_update, n, o), cand_aopt, ts.opt_state["actor"])

        ts = ts.replace(
            params={"actor": new_actor, "critic": new_c1, "critic2": new_c2},
            opt_state={"actor": new_aopt, "critic": new_o1, "critic2": new_o2},
            step=ts.step + 1,
        )
        ts = self._polyak(ts)
        return ts, Batch(loss=c_loss, actor_loss=a_loss, bc_loss=bc, td_error=td)
