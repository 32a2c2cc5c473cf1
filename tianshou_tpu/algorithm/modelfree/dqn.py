"""Deep Q-Network family base + DQN.

Rebuild of reference ``tianshou/algorithm/modelfree/dqn.py``:
``DiscreteQLearningPolicy`` (:39, eps-greedy exploration :153, masked Q
:145), ``QLearningOffPolicyAlgorithm`` (:180, n-step preprocessing :257,
periodic target sync :277) and ``DQN`` (:288, double-DQN :365-379, optional
Huber loss :392, PER weight writeback :401).

Everything is one pure update function: n-step targets come from the device
buffer's gather chain + ``nstep_returns``; the target net is a second param
copy synced with a step-counter select (no host control flow).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tianshou_tpu.algorithm.base import ActOut, OffPolicyAlgorithm, TrainState, tree_copy
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.prio import PrioritizedReplayBuffer
from tianshou_tpu.env.core import Discrete, Space

__all__ = ["DQN", "QLearningOffPolicyAlgorithm"]


class QLearningOffPolicyAlgorithm(OffPolicyAlgorithm):
    """Shared machinery for DQN/C51/QRDQN/IQN/FQF/BDQN: eps-greedy policy,
    n-step targets, lagged target network."""

    def __init__(
        self,
        model: nn.Module,
        action_space: Space,
        optim: optax.GradientTransformation | None = None,
        gamma: float = 0.99,
        n_step_return_horizon: int = 1,
        target_update_freq: int = 0,
        eps_training: float = 0.0,
        eps_inference: float = 0.0,
        **kwargs: Any,
    ) -> None:
        from tianshou_tpu.env.core import MultiDiscrete

        assert isinstance(action_space, (Discrete, MultiDiscrete))
        super().__init__(action_space=action_space, gamma=gamma, optim=optim, **kwargs)
        self.model = model
        self.n_step = n_step_return_horizon
        # targets come from the n-step terminal row (preprocess), and the
        # Q-learning update_step reads only (obs, act, returns, weight) —
        # so for n_step>1 the sampled row's obs_next is never consumed and
        # its frame-stacked gather (the costliest kernel of a pixel update,
        # scripts/mfu_probe.py) is skipped at the source
        if self.n_step > 1:
            self.update_sample_drop_keys = ("obs_next",)
        self.target_update_freq = target_update_freq
        self.use_target = target_update_freq > 0
        self.eps_training = eps_training
        self.eps_inference = eps_inference

    # ------------------------------------------------------------------
    def init(self, key: jax.Array, obs_example: jnp.ndarray) -> TrainState:
        from tianshou_tpu.algorithm.base import batch_obs_example
        obs = batch_obs_example(obs_example)
        params = self.model.init(key, obs)
        return TrainState(
            params={"model": params},
            target_params={"model": tree_copy(params)} if self.use_target else {},
            opt_state={"model": self.optim.init(params)},
            hparams=Batch(eps_training=jnp.float32(self.eps_training), eps_inference=jnp.float32(self.eps_inference)),
            extra=Batch(),
            step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def _q(self, params: Any, obs: jnp.ndarray) -> jnp.ndarray:
        """Subclasses may reduce distributional output to scalar Q here."""
        return self.model.apply(params, obs)

    @staticmethod
    def _action_mask(obs) -> jnp.ndarray | None:
        return obs.mask if isinstance(obs, Batch) and "mask" in obs else None

    def forward(self, ts: TrainState, obs: jnp.ndarray, key: jax.Array, state=None, deterministic: bool = False) -> ActOut:
        q = self._q(ts.params["model"], obs)
        mask = self._action_mask(obs)
        if mask is not None:  # invalid-action masking (reference dqn.py:145)
            q = jnp.where(mask, q, -jnp.inf)
        act = jnp.argmax(q, axis=-1).astype(jnp.int32)
        return ActOut(act=act, state=state, info=Batch(q=q))

    def exploration_noise(
        self, ts: TrainState, act: jnp.ndarray, obs: jnp.ndarray, key: jax.Array, training: bool = True
    ) -> jnp.ndarray:
        """eps-greedy, restricted to valid actions when masked (dqn.py:153);
        eps_training vs eps_inference selected by the static flag (dqn.py:158)."""
        k1, k2 = jax.random.split(key)
        mask = self._action_mask(obs)
        if mask is None:
            rand_act = jax.random.randint(k1, act.shape, 0, self.action_space.n, dtype=act.dtype)
        else:
            rand_act = jax.random.categorical(k1, jnp.where(mask, 0.0, -jnp.inf), axis=-1).astype(act.dtype)
        eps = ts.hparams.eps_training if training else ts.hparams.eps_inference
        explore = jax.random.uniform(k2, act.shape) < eps
        return jnp.where(explore, rand_act, act)

    # ------------------------------------------------------------------
    # n-step target preprocessing inherited from OffPolicyAlgorithm.preprocess

    # ------------------------------------------------------------------
    def _sync_target(self, ts: TrainState) -> TrainState:
        if not self.use_target:
            return ts
        sync = (ts.step % self.target_update_freq) == 0
        online = {k: ts.params[k] for k in ts.target_params}
        new_target = jax.tree.map(
            lambda t, o: jnp.where(sync, o, t), ts.target_params, online
        )
        return ts.replace(target_params=new_target)


class RecurrentDQN_Mixin:
    """Adds LSTM-carry acting to a Q-learning algorithm whose model is a
    RecurrentQNet (reference Recurrent net/common.py:372 + the collector's
    hidden-state threading). Training consumes frame-stacked samples
    (buffer ``stack_num``) through the model's sequence path."""

    def init_policy_state(self, num_envs: int):
        import flax.linen as nn

        cell = nn.OptimizedLSTMCell(self.model.hidden_size)
        return cell.initialize_carry(jax.random.key(0), (num_envs, self.model.hidden_size))

    def forward(self, ts: TrainState, obs: jnp.ndarray, key: jax.Array, state=None, deterministic: bool = False) -> ActOut:
        q, new_state = self.model.apply(ts.params["model"], obs, state, method="step")
        mask = self._action_mask(obs)
        if mask is not None:
            q = jnp.where(mask, q, -jnp.inf)
        act = jnp.argmax(q, axis=-1).astype(jnp.int32)
        return ActOut(act=act, state=new_state, info=Batch(q=q))


class DQN(QLearningOffPolicyAlgorithm):
    def __init__(self, *args, is_double: bool = True, huber_loss_delta: float | None = None, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.is_double = is_double
        self.huber_loss_delta = huber_loss_delta

    def _target_q(self, ts: TrainState, obs_next: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        tparams = ts.target_params["model"] if self.use_target else ts.params["model"]
        q_t = self._q(tparams, obs_next)
        mask = self._action_mask(obs_next)
        if mask is not None:
            q_t = jnp.where(mask, q_t, -1e9)
        if self.is_double:
            q_sel = self._q(ts.params["model"], obs_next)
            if mask is not None:
                q_sel = jnp.where(mask, q_sel, -jnp.inf)
            a_star = jnp.argmax(q_sel, axis=-1)
            return jnp.take_along_axis(q_t, a_star[:, None], axis=-1)[:, 0]
        return q_t.max(axis=-1)

    def update_step(self, ts: TrainState, batch: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        weight = batch.get("weight", jnp.ones_like(batch.returns))

        def loss_fn(params):
            q = self._q(params, batch.obs)
            q_a = jnp.take_along_axis(q, batch.act.astype(jnp.int32)[:, None], axis=-1)[:, 0]
            td = batch.returns - q_a
            if self.huber_loss_delta is not None:
                elem = optax.huber_loss(q_a, batch.returns, delta=self.huber_loss_delta)
            else:
                elem = td**2
            return (weight * elem).mean(), (td, q)

        (loss, (td, q)), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params["model"])
        new_params, new_opt = self._apply_grads(self.optim, ts.params["model"], grads, ts.opt_state["model"])
        ts = ts.replace(
            params={"model": new_params},
            opt_state={"model": new_opt},
            step=ts.step + 1,
        )
        ts = self._sync_target(ts)
        stats = Batch(loss=loss, q_mean=q.mean(), td_error=td)
        return ts, stats

    def postprocess(self, ts, buffer, buf_state, batch, indices, stats):
        """PER priority writeback (reference dqn.py:401 / prio.py:81)."""
        if isinstance(buffer, PrioritizedReplayBuffer):
            return buffer.update_weight(buf_state, indices, stats.td_error)
        return buf_state


class RecurrentDQN(RecurrentDQN_Mixin, DQN):
    """DQN over a RecurrentQNet with collector-threaded LSTM state."""
