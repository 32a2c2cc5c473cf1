"""ICM wrapper (intrinsic curiosity module, arXiv:1705.05363).

Rebuild of reference ``modelbased/icm.py`` (``ICMOffPolicyWrapper:112``,
``ICMOnPolicyWrapper:187``): wraps any base algorithm, adds the forward-
model prediction error as intrinsic reward and trains the ICM net alongside.
The wrapper namespaces its params under ``"icm"`` in the shared TrainState
and re-merges them after the wrapped update (which rebuilds its own keys).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tianshou_tpu.algorithm.base import OffPolicyAlgorithm, OnPolicyAlgorithm, TrainState
from tianshou_tpu.data.batch import Batch

__all__ = ["ICMOffPolicyWrapper", "ICMOnPolicyWrapper"]


class _ICMMixin:
    def _icm_setup(self, model: nn.Module, optim, lr_scale: float, reward_scale: float, forward_loss_weight: float):
        self.icm_model = model
        self.icm_optim = optim if optim is not None else optax.adam(1e-3)
        self.lr_scale = lr_scale
        self.reward_scale = reward_scale
        self.forward_loss_weight = forward_loss_weight

    def _icm_init(self, ts: TrainState, key: jax.Array, obs_example: jnp.ndarray) -> TrainState:
        from tianshou_tpu.algorithm.base import batch_obs_example
        obs = batch_obs_example(obs_example)
        act = jnp.zeros((1,), jnp.int32)
        iparams = self.icm_model.init(key, obs, act, obs)
        return ts.replace(
            params={**ts.params, "icm": iparams},
            opt_state={**ts.opt_state, "icm": self.icm_optim.init(iparams)},
        )

    def _intrinsic(self, ts: TrainState, obs, act, obs_next) -> jnp.ndarray:
        mse, _ = self.icm_model.apply(ts.params["icm"], obs, act, obs_next)
        return self.reward_scale * mse

    def _icm_update(self, ts: TrainState, obs, act, obs_next) -> tuple[TrainState, Batch]:
        def loss_fn(ip):
            mse, act_hat = self.icm_model.apply(ip, obs, act, obs_next)
            forward_loss = mse.mean()
            logp = jax.nn.log_softmax(act_hat, axis=-1)
            inverse_loss = -jnp.take_along_axis(logp, act.astype(jnp.int32)[:, None], axis=1).mean()
            loss = (
                (1 - self.forward_loss_weight) * inverse_loss + self.forward_loss_weight * forward_loss
            ) * self.lr_scale
            return loss, (forward_loss, inverse_loss)

        (loss, (fl, il)), g = jax.value_and_grad(loss_fn, has_aux=True)(ts.params["icm"])
        upd, new_opt = self.icm_optim.update(g, ts.opt_state["icm"], ts.params["icm"])
        new_ip = optax.apply_updates(ts.params["icm"], upd)
        ts = ts.replace(params={**ts.params, "icm": new_ip}, opt_state={**ts.opt_state, "icm": new_opt})
        return ts, Batch(icm_loss=loss, icm_forward_loss=fl, icm_inverse_loss=il)

    def _merge(self, inner_ts: TrainState, icm_params, icm_opt) -> TrainState:
        return inner_ts.replace(
            params={**inner_ts.params, "icm": icm_params},
            opt_state={**inner_ts.opt_state, "icm": icm_opt},
        )


class ICMOffPolicyWrapper(OffPolicyAlgorithm, _ICMMixin):
    def __init__(self, wrapped: OffPolicyAlgorithm, model: nn.Module, optim=None,
                 lr_scale: float = 1.0, reward_scale: float = 0.01, forward_loss_weight: float = 0.2) -> None:
        self.wrapped = wrapped
        super().__init__(action_space=wrapped.action_space, gamma=wrapped.gamma)
        self._icm_setup(model, optim, lr_scale, reward_scale, forward_loss_weight)
        self.n_step = wrapped.n_step

    def init(self, key: jax.Array, obs_example: jnp.ndarray) -> TrainState:
        k1, k2 = jax.random.split(key)
        ts = self.wrapped.init(k1, obs_example)
        return self._icm_init(ts, k2, obs_example)

    def forward(self, ts, obs, key, state=None, deterministic=False):
        return self.wrapped.forward(ts, obs, key, state, deterministic)

    def exploration_noise(self, ts, act, obs, key, training=True):
        return self.wrapped.exploration_noise(ts, act, obs, key, training)

    def map_action(self, act):
        return self.wrapped.map_action(act)

    def preprocess(self, ts, buffer, buf_state, batch, indices, key):
        batch = self.wrapped.preprocess(ts, buffer, buf_state, batch, indices, key)
        # add intrinsic bonus onto the sampled-step return
        bonus = self._intrinsic(ts, batch.obs, batch.act, batch.obs_next)
        batch.returns = batch.returns + bonus.reshape(batch.returns.shape[:1] + (1,) * (batch.returns.ndim - 1))
        return batch

    def update_step(self, ts: TrainState, batch: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        icm_p, icm_o = ts.params["icm"], ts.opt_state["icm"]
        inner = ts.replace(
            params={k: v for k, v in ts.params.items() if k != "icm"},
            opt_state={k: v for k, v in ts.opt_state.items() if k != "icm"},
        )
        inner, stats = self.wrapped.update_step(inner, batch, key)
        ts = self._merge(inner, icm_p, icm_o)
        ts, icm_stats = self._icm_update(ts, batch.obs, batch.act, batch.obs_next)
        stats.update(icm_stats)
        return ts, stats

    def postprocess(self, ts, buffer, buf_state, batch, indices, stats):
        return self.wrapped.postprocess(ts, buffer, buf_state, batch, indices, stats)


class ICMOnPolicyWrapper(OnPolicyAlgorithm, _ICMMixin):
    """The wrapped on-policy algorithm keeps its opt_state as one optax tree;
    the wrapper namespaces it under ``"ac"`` next to ``"icm"``."""

    def __init__(self, wrapped, model: nn.Module, optim=None,
                 lr_scale: float = 1.0, reward_scale: float = 0.01, forward_loss_weight: float = 0.2) -> None:
        self.wrapped = wrapped
        super().__init__(action_space=wrapped.action_space, gamma=wrapped.gamma)
        self._icm_setup(model, optim, lr_scale, reward_scale, forward_loss_weight)

    def init(self, key: jax.Array, obs_example: jnp.ndarray) -> TrainState:
        k1, k2 = jax.random.split(key)
        ts = self.wrapped.init(k1, obs_example)
        from tianshou_tpu.algorithm.base import batch_obs_example
        obs = batch_obs_example(obs_example)
        act = jnp.zeros((1,), jnp.int32)
        iparams = self.icm_model.init(k2, obs, act, obs)
        return ts.replace(
            params={**ts.params, "icm": iparams},
            opt_state={"ac": ts.opt_state, "icm": self.icm_optim.init(iparams)},
        )

    def forward(self, ts, obs, key, state=None, deterministic=False):
        return self.wrapped.forward(ts, obs, key, state, deterministic)

    def exploration_noise(self, ts, act, obs, key, training=True):
        return self.wrapped.exploration_noise(ts, act, obs, key, training)

    def map_action(self, act):
        return self.wrapped.map_action(act)

    def update_rollout(self, ts: TrainState, rollout: Batch, key: jax.Array, repeat: int, batch_size: int):
        T, E = rollout.rew.shape
        obs = rollout.obs.reshape((T * E,) + rollout.obs.shape[2:])
        act = rollout.act.reshape((T * E,) + rollout.act.shape[2:])
        obs_next = rollout.obs_next.reshape((T * E,) + rollout.obs_next.shape[2:])
        bonus = self._intrinsic(ts, obs, act, obs_next).reshape(T, E)
        rollout = rollout.copy()
        rollout.rew = rollout.rew + bonus

        icm_p, icm_o = ts.params["icm"], ts.opt_state["icm"]
        inner = ts.replace(
            params={k: v for k, v in ts.params.items() if k != "icm"},
            opt_state=ts.opt_state["ac"],
        )
        inner, stats = self.wrapped.update_rollout(inner, rollout, key, repeat, batch_size)
        ts = inner.replace(
            params={**inner.params, "icm": icm_p},
            opt_state={"ac": inner.opt_state, "icm": icm_o},
        )
        ts, icm_stats = self._icm_update(ts, obs, act, obs_next)
        stats.update(icm_stats)
        return ts, stats
