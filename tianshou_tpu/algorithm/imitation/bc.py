"""Behavior cloning / imitation learning.

Rebuild of reference ``imitation/imitation_base.py``: ``ImitationPolicy:37``,
``OffPolicyImitationLearning:130``, ``OfflineImitationLearning:158``.
Discrete actions -> cross-entropy on logits; continuous -> MSE on actions.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tianshou_tpu.algorithm.base import ActOut, OfflineAlgorithm, TrainState
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.env.core import Space
from tianshou_tpu.models.distributions import Categorical

__all__ = ["ImitationLearning"]


class ImitationLearning(OfflineAlgorithm):
    """Model: obs -> logits (discrete) or action (continuous)."""

    def __init__(
        self,
        model: nn.Module,
        action_space: Space,
        optim: optax.GradientTransformation | None = None,
        **kwargs,
    ) -> None:
        kwargs.setdefault("action_scaling", False)
        super().__init__(action_space=action_space, optim=optim, **kwargs)
        self.model = model

    def init(self, key: jax.Array, obs_example: jnp.ndarray) -> TrainState:
        from tianshou_tpu.algorithm.base import batch_obs_example
        obs = batch_obs_example(obs_example)
        params = self.model.init(key, obs)
        return TrainState(
            params={"model": params},
            target_params={},
            opt_state={"model": self.optim.init(params)},
            hparams=Batch(),
            extra=Batch(),
            step=jnp.int32(0),
        )

    def forward(self, ts: TrainState, obs: jnp.ndarray, key: jax.Array, state=None, deterministic: bool = False) -> ActOut:
        out = self.model.apply(ts.params["model"], obs)
        if self.is_discrete:
            act = jnp.argmax(out, axis=-1).astype(jnp.int32)
        else:
            act = out
        return ActOut(act=act, state=state, info=Batch())

    def update_step(self, ts: TrainState, batch: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        def loss_fn(params):
            out = self.model.apply(params, batch.obs)
            if self.is_discrete:
                return -Categorical(logits=out).log_prob(batch.act.astype(jnp.int32)).mean()
            return ((out - batch.act) ** 2).sum(-1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(ts.params["model"])
        new_params, new_opt = self._apply_grads(self.optim, ts.params["model"], grads, ts.opt_state["model"])
        ts = ts.replace(params={"model": new_params}, opt_state={"model": new_opt}, step=ts.step + 1)
        return ts, Batch(loss=loss)
