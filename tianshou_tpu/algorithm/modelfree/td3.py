"""TD3 (twin delayed DDPG, arXiv:1802.09477).

Rebuild of reference ``modelfree/td3.py``: ``ActorDualCriticsOffPolicy
Algorithm`` (:32, twin critics + min-Q target + target-policy smoothing) and
``TD3`` (:105, delayed actor updates). The delayed update is a tree-wise
select on the actor params/opt-state, keeping the whole step branch-free."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.base import ActOut, TrainState, tree_copy
from tianshou_tpu.algorithm.modelfree.ddpg import ContinuousOffPolicyBase
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.prio import PrioritizedReplayBuffer

__all__ = ["TD3"]


class TD3(ContinuousOffPolicyBase):
    def __init__(
        self,
        *args,
        policy_noise: float = 0.2,
        noise_clip: float = 0.5,
        update_actor_freq: int = 2,
        **kwargs,
    ) -> None:
        super().__init__(*args, **kwargs)
        self.policy_noise = policy_noise
        self.noise_clip = noise_clip
        self.update_actor_freq = update_actor_freq

    def init(self, key: jax.Array, obs_example: jnp.ndarray) -> TrainState:
        from tianshou_tpu.algorithm.base import batch_obs_example
        obs = batch_obs_example(obs_example)
        act = jnp.zeros((1,) + self.action_space.shape)
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            "actor": self.actor.init(k1, obs),
            "critic": self.critic.init(k2, obs, act),
            "critic2": self.critic.init(k3, obs, act),
        }
        return TrainState(
            params=params,
            target_params=tree_copy(params),
            opt_state={
                "actor": self.policy_optim.init(params["actor"]),
                "critic": self.critic_optim.init(params["critic"]),
                "critic2": self.critic_optim.init(params["critic2"]),
            },
            hparams=Batch(),
            extra=Batch(),
            step=jnp.int32(0),
        )

    def forward(self, ts: TrainState, obs: jnp.ndarray, key: jax.Array, state=None, deterministic: bool = False) -> ActOut:
        act = self.actor.apply(ts.params["actor"], obs)
        return ActOut(act=act, state=state, info=Batch())

    def _target_q(self, ts: TrainState, obs_next: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        a_next = self.actor.apply(ts.target_params["actor"], obs_next)
        noise = jnp.clip(
            jax.random.normal(key, a_next.shape) * self.policy_noise,
            -self.noise_clip,
            self.noise_clip,
        )
        a_next = jnp.clip(a_next + noise, -1.0, 1.0)
        q1 = self.critic.apply(ts.target_params["critic"], obs_next, a_next)
        q2 = self.critic.apply(ts.target_params["critic2"], obs_next, a_next)
        return jnp.minimum(q1, q2)

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
            return -self.critic.apply(new_c1, batch.obs, a).mean()

        a_loss, a_grads = jax.value_and_grad(actor_loss)(ts.params["actor"])
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
        return ts, Batch(loss=c_loss, actor_loss=a_loss, critic_loss=c_loss, td_error=td)

    def postprocess(self, ts, buffer, buf_state, batch, indices, stats):
        if isinstance(buffer, PrioritizedReplayBuffer) and "td_error" in stats:
            return buffer.update_weight(buf_state, indices, stats.td_error)
        return buf_state
