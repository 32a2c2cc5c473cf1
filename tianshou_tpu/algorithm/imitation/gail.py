"""GAIL (generative adversarial imitation learning, arXiv:1606.03476).

Rebuild of reference ``imitation/gail.py:31``: PPO with a discriminator net
D(s, a); policy reward becomes ``-log(1 - sigmoid(D)) = softplus(D)``; the
discriminator trains expert-vs-policy each update. The expert dataset is
held as device arrays and sampled inside the jitted update.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tianshou_tpu.algorithm.base import TrainState
from tianshou_tpu.algorithm.modelfree.ppo import PPO
from tianshou_tpu.data.batch import Batch

__all__ = ["GAIL"]


class GAIL(PPO):
    def __init__(
        self,
        *args,
        disc_net: nn.Module,             # (obs, act) -> logit [B]
        expert_obs: jnp.ndarray,
        expert_act: jnp.ndarray,
        disc_optim: optax.GradientTransformation | None = None,
        disc_update_num: int = 4,
        **kwargs,
    ) -> None:
        super().__init__(*args, **kwargs)
        self.disc_net = disc_net
        self.expert_obs = jnp.asarray(expert_obs)
        self.expert_act = jnp.asarray(expert_act)
        self.disc_optim = disc_optim if disc_optim is not None else optax.adam(1e-3)
        self.disc_update_num = disc_update_num

    def init(self, key: jax.Array, obs_example: jnp.ndarray) -> TrainState:
        k1, k2 = jax.random.split(key)
        ts = super().init(k1, obs_example)
        from tianshou_tpu.algorithm.base import batch_obs_example
        obs = batch_obs_example(obs_example)
        act = self.expert_act[:1]
        dparams = self.disc_net.init(k2, obs, act)
        return ts.replace(
            params={**ts.params, "disc": dparams},
            opt_state={"ac": ts.opt_state, "disc": self.disc_optim.init(dparams)},
        )

    def update_rollout(self, ts: TrainState, rollout: Batch, key: jax.Array, repeat: int, batch_size: int):
        k_disc, k_ppo, k_samp = jax.random.split(key, 3)
        T, E = rollout.rew.shape
        obs = rollout.obs.reshape((T * E,) + rollout.obs.shape[2:])
        act = rollout.act.reshape((T * E,) + rollout.act.shape[2:])

        # 1. discriminator updates (gail.py:214)
        def disc_step(carry, k):
            dparams, dopt = carry
            ke, kp = jax.random.split(k)
            ei = jax.random.randint(ke, (batch_size,), 0, self.expert_obs.shape[0])
            pi = jax.random.randint(kp, (batch_size,), 0, obs.shape[0])

            def dloss(dp):
                d_exp = self.disc_net.apply(dp, self.expert_obs[ei], self.expert_act[ei])
                d_pol = self.disc_net.apply(dp, obs[pi], act[pi])
                # BCE: expert -> 1, policy -> 0
                loss = jax.nn.softplus(-d_exp).mean() + jax.nn.softplus(d_pol).mean()
                acc = ((d_exp > 0).astype(jnp.float32).mean() + (d_pol < 0).astype(jnp.float32).mean()) / 2.0
                return loss, acc

            (loss, acc), g = jax.value_and_grad(dloss, has_aux=True)(dparams)
            upd, dopt = self.disc_optim.update(g, dopt, dparams)
            dparams = optax.apply_updates(dparams, upd)
            return (dparams, dopt), Batch(disc_loss=loss, disc_acc=acc)

        (dparams, dopt), dstats = jax.lax.scan(
            disc_step, (ts.params["disc"], ts.opt_state["disc"]), jax.random.split(k_disc, self.disc_update_num)
        )
        ts = ts.replace(
            params={**ts.params, "disc": dparams},
            opt_state={**ts.opt_state, "disc": dopt},
        )

        # 2. replace env reward with the adversarial reward (gail.py:188)
        d = self.disc_net.apply(dparams, obs, act).reshape(T, E)
        rollout = rollout.copy()
        rollout.rew = jax.nn.softplus(d)

        # 3. standard PPO over the relabeled rollout, threading the ac opt state
        inner_ts = ts.replace(
            params={k: v for k, v in ts.params.items() if k != "disc"},
            opt_state=ts.opt_state["ac"],
        )
        inner_ts, stats = super().update_rollout(inner_ts, rollout, k_ppo, repeat, batch_size)
        ts = ts.replace(
            params={**inner_ts.params, "disc": dparams},
            opt_state={"ac": inner_ts.opt_state, "disc": dopt},
            step=inner_ts.step,
        )
        stats.disc_loss = dstats.disc_loss.mean()
        stats.disc_acc = dstats.disc_acc.mean()
        return ts, stats
