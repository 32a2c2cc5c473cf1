"""Discrete BCQ (arXiv:1910.01708).

Rebuild of reference ``imitation/discrete_bcq.py`` (``DiscreteBCQPolicy:37``
imitation-logits action filtering, ``DiscreteBCQ:130``): a Q-net plus an
imitation head; actions are restricted to those whose imitation probability
is within ``unlikely_action_threshold`` of the best, then argmax Q.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tianshou_tpu.algorithm.base import ActOut, OfflineAlgorithm, TrainState, tree_copy
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.env.core import Discrete, Space
from tianshou_tpu.models.distributions import Categorical
from tianshou_tpu.ops.returns import nstep_returns, value_mask

__all__ = ["DiscreteBCQ"]


class DiscreteBCQ(OfflineAlgorithm):
    def __init__(
        self,
        model: nn.Module,            # obs -> Q [B, A]
        imitator: nn.Module,         # obs -> logits [B, A]
        action_space: Space,
        optim: optax.GradientTransformation | None = None,
        gamma: float = 0.99,
        n_step_return_horizon: int = 1,
        target_update_freq: int = 8000,
        unlikely_action_threshold: float = 0.3,
        imitation_logits_penalty: float = 1e-2,
        **kwargs,
    ) -> None:
        assert isinstance(action_space, Discrete)
        super().__init__(action_space=action_space, gamma=gamma, optim=optim, **kwargs)
        self.model = model
        self.imitator = imitator
        self.n_step = n_step_return_horizon
        self.target_update_freq = target_update_freq
        self.use_target = target_update_freq > 0
        self.log_tau = float(jnp.log(unlikely_action_threshold))
        self.penalty = imitation_logits_penalty

    def init(self, key: jax.Array, obs_example: jnp.ndarray) -> TrainState:
        from tianshou_tpu.algorithm.base import batch_obs_example
        obs = batch_obs_example(obs_example)
        k1, k2 = jax.random.split(key)
        params = {"model": self.model.init(k1, obs), "imitator": self.imitator.init(k2, obs)}
        return TrainState(
            params=params,
            target_params=tree_copy(params) if self.use_target else {},
            opt_state={"all": self.optim.init(params)},
            hparams=Batch(),
            extra=Batch(),
            step=jnp.int32(0),
        )

    def _select(self, params, obs: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        q = self.model.apply(params["model"], obs)
        logits = self.imitator.apply(params["imitator"], obs)
        logp = jax.nn.log_softmax(logits, axis=-1)
        mask = logp - logp.max(-1, keepdims=True) >= self.log_tau
        act = jnp.argmax(jnp.where(mask, q, -jnp.inf), axis=-1).astype(jnp.int32)
        return act, q, logits

    def forward(self, ts: TrainState, obs: jnp.ndarray, key: jax.Array, state=None, deterministic: bool = False) -> ActOut:
        act, q, _ = self._select(ts.params, obs)
        return ActOut(act=act, state=state, info=Batch(q=q))

    def _target_q(self, ts: TrainState, obs_next: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        tp = ts.target_params if self.use_target else ts.params
        act, _, _ = self._select(ts.params, obs_next)  # online selection (bcq.py:100)
        q_t = self.model.apply(tp["model"], obs_next)
        return jnp.take_along_axis(q_t, act[:, None], axis=1)[:, 0]

    def preprocess(self, ts, buffer, buf_state, batch, indices, key):
        rews, ends, obs_next_t, terminated_t = self._nstep_terminal(buffer, buf_state, batch, indices)
        tq = self._target_q(ts, obs_next_t, key)
        tq = tq * value_mask(terminated_t.astype(jnp.float32))
        batch.returns = nstep_returns(rews, ends, tq, self.gamma)
        return batch

    def update_step(self, ts: TrainState, batch: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        act = batch.act.astype(jnp.int32)

        def loss_fn(params):
            q = self.model.apply(params["model"], batch.obs)
            q_a = jnp.take_along_axis(q, act[:, None], axis=1)[:, 0]
            td = batch.returns - q_a
            logits = self.imitator.apply(params["imitator"], batch.obs)
            ce = -Categorical(logits=logits).log_prob(act).mean()
            reg = (logits**2).mean()
            loss = (td**2).mean() + ce + self.penalty * reg
            return loss, (td, ce)

        (loss, (td, ce)), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        new_params, new_opt = self._apply_grads(self.optim, ts.params, grads, ts.opt_state["all"])
        ts = ts.replace(params=new_params, opt_state={"all": new_opt}, step=ts.step + 1)
        if self.use_target:
            sync = (ts.step % self.target_update_freq) == 0
            ts = ts.replace(
                target_params=jax.tree.map(lambda t, o: jnp.where(sync, o, t), ts.target_params, ts.params)
            )
        return ts, Batch(loss=loss, ce_loss=ce, td_error=td)
