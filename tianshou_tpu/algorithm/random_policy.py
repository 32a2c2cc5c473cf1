"""Random action policy (reference algorithm_base.py:1063
``RandomActionPolicy``): uniform sampling from the action space, usable
anywhere an Algorithm is expected (prefill, baselines)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.base import ActOut, Algorithm, TrainState
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.env.core import Discrete, Space

__all__ = ["RandomActionPolicy"]


class RandomActionPolicy(Algorithm):
    def __init__(self, action_space: Space, **kwargs) -> None:
        super().__init__(action_space=action_space, **kwargs)

    def init(self, key: jax.Array, obs_example) -> TrainState:
        return TrainState(
            params={}, target_params={}, opt_state={},
            hparams=Batch(), extra=Batch(), step=jnp.int32(0),
        )

    def forward(self, ts: TrainState, obs, key: jax.Array, state=None, deterministic: bool = False) -> ActOut:
        n = obs.shape[0] if hasattr(obs, "shape") else len(obs)
        keys = jax.random.split(key, n)
        act = jax.vmap(self.action_space.sample)(keys)
        if isinstance(self.action_space, Discrete):
            act = act.astype(jnp.int32)
        return ActOut(act=act, state=state, info=Batch())

    def update_step(self, ts, batch, key):
        return ts, Batch()
