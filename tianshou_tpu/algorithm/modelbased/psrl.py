"""PSRL (posterior sampling RL, Strens 2000).

Rebuild of reference ``modelbased/psrl.py`` (``PSRLModel:24`` Dirichlet /
Gaussian posteriors + value iteration ``:163``, ``PSRLPolicy:163``,
``PSRL:217``): tabular counts live in ``TrainState.extra``; each update
samples a model from the posterior and runs fixed-iteration value iteration
to produce the greedy policy table — all inside one jitted program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.base import ActOut, OnPolicyAlgorithm, TrainState
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.env.core import Discrete

__all__ = ["PSRL"]


class PSRL(OnPolicyAlgorithm):
    def __init__(
        self,
        n_state: int,
        n_action: int,
        action_space: Discrete,
        gamma: float = 0.99,
        add_done_loop: bool = False,
        value_iterations: int = 100,
        rew_mean_prior: float = 0.0,
        rew_std_prior: float = 1.0,
        **kwargs,
    ) -> None:
        super().__init__(action_space=action_space, gamma=gamma, **kwargs)
        self.n_state = n_state
        self.n_action = n_action
        self.add_done_loop = add_done_loop
        self.value_iterations = value_iterations
        self.rew_mean_prior = rew_mean_prior
        self.rew_std_prior = rew_std_prior

    def init(self, key: jax.Array, obs_example: jnp.ndarray) -> TrainState:
        S, A = self.n_state, self.n_action
        return TrainState(
            params={},
            target_params={},
            opt_state={},
            hparams=Batch(),
            extra=Batch(
                trans_count=jnp.ones((S, A, S)),  # Dirichlet prior
                rew_sum=jnp.full((S, A), self.rew_mean_prior),
                rew_count=jnp.ones((S, A)),
                policy=jnp.zeros(S, jnp.int32),
                value=jnp.zeros(S),
            ),
            step=jnp.int32(0),
        )

    def _obs_to_state(self, obs: jnp.ndarray) -> jnp.ndarray:
        return jnp.asarray(obs).reshape(obs.shape[0], -1)[:, 0].astype(jnp.int32)

    def forward(self, ts: TrainState, obs: jnp.ndarray, key: jax.Array, state=None, deterministic: bool = False) -> ActOut:
        s = self._obs_to_state(obs)
        return ActOut(act=ts.extra.policy[s], state=state, info=Batch())

    def exploration_noise(self, ts, act, obs, key, training=True):
        return act  # exploration comes from posterior sampling

    def update_rollout(self, ts: TrainState, rollout: Batch, key: jax.Array, repeat: int, batch_size: int):
        S, A = self.n_state, self.n_action
        T, E = rollout.rew.shape
        s = self._obs_to_state(rollout.obs.reshape(T * E, -1))
        s_next = self._obs_to_state(rollout.obs_next.reshape(T * E, -1))
        a = rollout.act.reshape(T * E).astype(jnp.int32)
        r = rollout.rew.reshape(T * E)

        extra = ts.extra.copy()
        extra.trans_count = extra.trans_count.at[s, a, s_next].add(1.0)
        extra.rew_sum = extra.rew_sum.at[s, a].add(r)
        extra.rew_count = extra.rew_count.at[s, a].add(1.0)
        if self.add_done_loop:
            done = rollout.done.reshape(T * E) if "done" in rollout else (
                rollout.terminated.reshape(T * E) | rollout.truncated.reshape(T * E)
            )
            extra.trans_count = extra.trans_count.at[s_next, :, s_next].add(
                jnp.where(done[:, None], 1.0, 0.0)
            )

        # sample model from posterior (psrl.py:101-117)
        k1, k2 = jax.random.split(key)
        trans = jax.random.dirichlet(k1, extra.trans_count.reshape(S * A, S)).reshape(S, A, S)
        rew_mean = extra.rew_sum / extra.rew_count
        rew_std = self.rew_std_prior / jnp.sqrt(extra.rew_count)
        rew = rew_mean + rew_std * jax.random.normal(k2, (S, A))

        # value iteration (psrl.py:163)
        def vi_body(_, v):
            q = rew + self.gamma * jnp.einsum("ijk,k->ij", trans, v)
            return q.max(-1)

        v = jax.lax.fori_loop(0, self.value_iterations, vi_body, extra.value)
        q = rew + self.gamma * jnp.einsum("ijk,k->ij", trans, v)
        extra.policy = jnp.argmax(q, axis=-1).astype(jnp.int32)
        extra.value = v

        ts = ts.replace(extra=extra, step=ts.step + 1)
        return ts, Batch(value_mean=v.mean(), n_grad_steps=jnp.int32(1))
