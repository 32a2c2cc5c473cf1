"""IQN (implicit quantile networks, arXiv:1806.06923).

Rebuild of reference ``modelfree/iqn.py`` (``IQNPolicy:21`` tau sampling,
``IQN:103``). The model is an ``ImplicitQuantileNetwork``:
``apply(params, obs, taus) -> [B, K, A]``. Online/target tau draws come from
the threaded PRNG keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.base import ActOut, TrainState
from tianshou_tpu.algorithm.modelfree.dqn import QLearningOffPolicyAlgorithm
from tianshou_tpu.algorithm.modelfree.qrdqn import quantile_huber_loss
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.prio import PrioritizedReplayBuffer

__all__ = ["IQN"]


class IQN(QLearningOffPolicyAlgorithm):
    def __init__(
        self,
        *args,
        sample_size: int = 32,
        online_sample_size: int = 8,
        target_sample_size: int = 8,
        **kwargs,
    ) -> None:
        super().__init__(*args, **kwargs)
        self.sample_size = sample_size
        self.online_sample_size = online_sample_size
        self.target_sample_size = target_sample_size

    def _z(self, params, obs: jnp.ndarray, taus: jnp.ndarray) -> jnp.ndarray:
        return self.model.apply(params, obs, taus)  # [B, K, A]

    def forward(self, ts: TrainState, obs: jnp.ndarray, key: jax.Array, state=None, deterministic: bool = False) -> ActOut:
        taus = jax.random.uniform(key, (obs.shape[0], self.sample_size))
        q = self._z(ts.params["model"], obs, taus).mean(1)  # [B, A]
        act = jnp.argmax(q, axis=-1).astype(jnp.int32)
        return ActOut(act=act, state=state, info=Batch(q=q))

    def _target_q(self, ts: TrainState, obs_next: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        tparams = ts.target_params["model"] if self.use_target else ts.params["model"]
        k1, k2 = jax.random.split(key)
        B = obs_next.shape[0]
        taus_t = jax.random.uniform(k1, (B, self.target_sample_size))
        z_t = self._z(tparams, obs_next, taus_t)  # [B, Kt, A]
        # action selection with online net (double)
        taus_o = jax.random.uniform(k2, (B, self.online_sample_size))
        a_star = jnp.argmax(self._z(ts.params["model"], obs_next, taus_o).mean(1), axis=-1)
        return jnp.take_along_axis(z_t, a_star[:, None, None], axis=2)[..., 0]  # [B, Kt]

    def update_step(self, ts: TrainState, batch: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        B = batch.returns.shape[0]
        weight = batch.get("weight", jnp.ones(B))
        taus = jax.random.uniform(key, (B, self.sample_size))

        def loss_fn(params):
            z = self._z(params, batch.obs, taus)  # [B, K, A]
            curr = jnp.take_along_axis(z, batch.act.astype(jnp.int32)[:, None, None], axis=2)[..., 0]
            per = quantile_huber_loss(curr, batch.returns, taus)
            td = jnp.abs(batch.returns.mean(-1) - curr.mean(-1))
            return (weight * per).mean(), td

        (loss, td), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params["model"])
        new_params, new_opt = self._apply_grads(self.optim, ts.params["model"], grads, ts.opt_state["model"])
        ts = ts.replace(params={"model": new_params}, opt_state={"model": new_opt}, step=ts.step + 1)
        ts = self._sync_target(ts)
        return ts, Batch(loss=loss, td_error=td)

    def postprocess(self, ts, buffer, buf_state, batch, indices, stats):
        if isinstance(buffer, PrioritizedReplayBuffer):
            return buffer.update_weight(buf_state, indices, stats.td_error)
        return buf_state

    def init(self, key: jax.Array, obs_example: jnp.ndarray) -> TrainState:
        # model init needs taus
        from tianshou_tpu.algorithm.base import batch_obs_example
        obs = batch_obs_example(obs_example)
        k1, k2 = jax.random.split(key)
        taus = jax.random.uniform(k2, (1, self.sample_size))
        params = self.model.init(k1, obs, taus)
        from tianshou_tpu.algorithm.base import tree_copy

        return TrainState(
            params={"model": params},
            target_params={"model": tree_copy(params)} if self.use_target else {},
            opt_state={"model": self.optim.init(params)},
            hparams=Batch(eps_training=jnp.float32(self.eps_training), eps_inference=jnp.float32(self.eps_inference)),
            extra=Batch(),
            step=jnp.int32(0),
        )
