"""BCQ (batch-constrained deep Q-learning, arXiv:1812.02900), continuous.

Rebuild of reference ``imitation/bcq.py`` (``BCQPolicy:34`` VAE +
perturbation acting, ``BCQ:119``): conditional VAE models the dataset action
distribution; the perturbation net nudges decoded actions; twin critics with
the lambda min/max mixture target over sampled candidate actions.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tianshou_tpu.algorithm.base import ActOut, OfflineAlgorithm, TrainState, polyak_update, tree_copy
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.env.core import Space

__all__ = ["BCQ"]


class BCQ(OfflineAlgorithm):
    def __init__(
        self,
        actor_perturbation: nn.Module,  # Perturbation(obs, act) -> act
        critic: nn.Module,              # (obs, act) -> q
        vae: nn.Module,                 # VAE(obs, act, key) -> recon, mean, std
        action_space: Space,
        actor_optim: optax.GradientTransformation | None = None,
        critic_optim: optax.GradientTransformation | None = None,
        vae_optim: optax.GradientTransformation | None = None,
        gamma: float = 0.99,
        tau: float = 0.005,
        lmbda: float = 0.75,
        forward_sampled_times: int = 100,
        num_sampled_action: int = 10,
        **kwargs: Any,
    ) -> None:
        kwargs.setdefault("action_scaling", True)
        super().__init__(action_space=action_space, gamma=gamma, **kwargs)
        self.actor_perturbation = actor_perturbation
        self.critic = critic
        self.vae = vae
        self.actor_optim = actor_optim if actor_optim is not None else optax.adam(1e-3)
        self.critic_optim = critic_optim if critic_optim is not None else optax.adam(1e-3)
        self.vae_optim = vae_optim if vae_optim is not None else optax.adam(1e-3)
        self.tau = tau
        self.lmbda = lmbda
        self.forward_sampled_times = forward_sampled_times
        self.num_sampled_action = num_sampled_action

    def init(self, key: jax.Array, obs_example: jnp.ndarray) -> TrainState:
        from tianshou_tpu.algorithm.base import batch_obs_example
        obs = batch_obs_example(obs_example)
        act = jnp.zeros((1,) + self.action_space.shape)
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        params = {
            "actor": self.actor_perturbation.init(k1, obs, act),
            "critic": self.critic.init(k2, obs, act),
            "critic2": self.critic.init(k3, obs, act),
            "vae": self.vae.init({"params": k4}, obs, act, k5),
        }
        return TrainState(
            params=params,
            target_params=tree_copy({k: params[k] for k in ("actor", "critic", "critic2")}),
            opt_state={
                "actor": self.actor_optim.init(params["actor"]),
                "critic": self.critic_optim.init(params["critic"]),
                "critic2": self.critic_optim.init(params["critic2"]),
                "vae": self.vae_optim.init(params["vae"]),
            },
            hparams=Batch(),
            extra=Batch(),
            step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def forward(self, ts: TrainState, obs: jnp.ndarray, key: jax.Array, state=None, deterministic: bool = False) -> ActOut:
        """Sample N candidate actions, perturb, take argmax Q (bcq.py:76)."""
        B = obs.shape[0]
        n = self.forward_sampled_times
        obs_rep = jnp.repeat(obs, n, axis=0)
        dec = self.vae.apply(ts.params["vae"], obs_rep, key=key, method="decode")
        act = self.actor_perturbation.apply(ts.params["actor"], obs_rep, dec)
        q = self.critic.apply(ts.params["critic"], obs_rep, act).reshape(B, n)
        best = jnp.argmax(q, axis=-1)
        act = act.reshape(B, n, -1)[jnp.arange(B), best]
        return ActOut(act=act, state=state, info=Batch())

    # ------------------------------------------------------------------
    def update_step(self, ts: TrainState, batch: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        k_vae, k_dec, k_actor = jax.random.split(key, 3)
        B = batch.obs.shape[0]

        # 1. VAE (bcq.py:146)
        def vae_loss_fn(vp):
            recon, mean, std = self.vae.apply(vp, batch.obs, batch.act, k_vae)
            recon_loss = ((recon - batch.act) ** 2).sum(-1).mean()
            kl = (-jnp.log(std) + (std**2 + mean**2 - 1) / 2).sum(-1).mean()
            return recon_loss + kl / 2.0

        vae_loss, vg = jax.value_and_grad(vae_loss_fn)(ts.params["vae"])
        new_vae, new_vo = self._apply_grads(self.vae_optim, ts.params["vae"], vg, ts.opt_state["vae"])

        # 2. critics: target over num_sampled_action candidates (bcq.py:160)
        n = self.num_sampled_action
        obs_next_rep = jnp.repeat(batch.obs_next, n, axis=0)
        dec = self.vae.apply(new_vae, obs_next_rep, key=k_dec, method="decode")
        a_next = self.actor_perturbation.apply(ts.target_params["actor"], obs_next_rep, dec)
        q1_t = self.critic.apply(ts.target_params["critic"], obs_next_rep, a_next)
        q2_t = self.critic.apply(ts.target_params["critic2"], obs_next_rep, a_next)
        q_t = self.lmbda * jnp.minimum(q1_t, q2_t) + (1 - self.lmbda) * jnp.maximum(q1_t, q2_t)
        q_t = q_t.reshape(B, n).max(-1)
        mask = 1.0 - batch.terminated.astype(jnp.float32)
        target = batch.rew + self.gamma * mask * q_t

        def critic_loss(cp, cp2):
            q1 = self.critic.apply(cp, batch.obs, batch.act)
            q2 = self.critic.apply(cp2, batch.obs, batch.act)
            return ((q1 - target) ** 2).mean() + ((q2 - target) ** 2).mean(), (q1, q2)

        (c_loss, _), (g1, g2) = jax.value_and_grad(critic_loss, argnums=(0, 1), has_aux=True)(
            ts.params["critic"], ts.params["critic2"]
        )
        new_c1, new_o1 = self._apply_grads(self.critic_optim, ts.params["critic"], g1, ts.opt_state["critic"])
        new_c2, new_o2 = self._apply_grads(self.critic_optim, ts.params["critic2"], g2, ts.opt_state["critic2"])

        # 3. perturbation actor (bcq.py:186)
        dec_cur = self.vae.apply(new_vae, batch.obs, key=k_actor, method="decode")

        def actor_loss_fn(ap):
            a = self.actor_perturbation.apply(ap, batch.obs, dec_cur)
            return -self.critic.apply(new_c1, batch.obs, a).mean()

        a_loss, ag = jax.value_and_grad(actor_loss_fn)(ts.params["actor"])
        new_actor, new_ao = self._apply_grads(self.actor_optim, ts.params["actor"], ag, ts.opt_state["actor"])

        new_params = {"actor": new_actor, "critic": new_c1, "critic2": new_c2, "vae": new_vae}
        ts = ts.replace(
            params=new_params,
            opt_state={"actor": new_ao, "critic": new_o1, "critic2": new_o2, "vae": new_vo},
            step=ts.step + 1,
        )
        ts = ts.replace(
            target_params=polyak_update(
                ts.target_params, {k: new_params[k] for k in ("actor", "critic", "critic2")}, self.tau
            )
        )
        return ts, Batch(loss=c_loss, actor_loss=a_loss, vae_loss=vae_loss)
