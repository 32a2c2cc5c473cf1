"""Recurrent policy support: LSTM state threading through the collector scan
(reset on done) + RecurrentDQN training on a velocity-masked (partially
observable) CartPole with frame-stacked replay (reference Recurrent
net/common.py:372, collector hidden-state handling collector.py:1103)."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import make_collectors
from tianshou_tpu.algorithm.modelfree.dqn import RecurrentDQN
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.env.classic.cartpole import CartPole
from tianshou_tpu.env.core import Env
from tianshou_tpu.models.recurrent import RecurrentQNet
from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams


class MaskVelocity(Env):
    """POMDP CartPole: only position/angle observed — memory required."""

    def __init__(self, env: CartPole) -> None:
        self.env = env
        from tianshou_tpu.env.core import Box

        self.observation_space = Box(low=[-4.8, -0.5], high=[4.8, 0.5])
        self.action_space = env.action_space
        self.max_episode_steps = env.max_episode_steps

    def _mask(self, obs):
        return obs[..., (0, 2)]

    def reset(self, key):
        s, obs = self.env.reset(key)
        return s, self._mask(obs)

    def step(self, state, action, key):
        s = self.env.step(state, action, key)
        return s._replace(obs=self._mask(s.obs))


def test_policy_state_threads_and_resets():
    env = CartPole()
    algo = RecurrentDQN(
        model=RecurrentQNet(hidden_size=32, action_dim=2),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=1e-3),
        eps_training=0.0,
    )
    ts = algo.init(jax.random.key(0), jnp.zeros(4))
    tc, _ = make_collectors(env, algo, None, n_train=4, n_test=4)
    cstate = tc.reset(jax.random.key(1))
    assert cstate.policy_state is not None
    h0 = np.asarray(cstate.policy_state[1])
    cstate, _, out = tc.collect(ts, cstate, None, jax.random.key(2), 10, training=False)
    h1 = np.asarray(cstate.policy_state[1])
    assert not np.allclose(h0, h1), "LSTM state did not evolve"


def test_recurrent_dqn_pomdp_cartpole():
    env = MaskVelocity(CartPole())
    algo = RecurrentDQN(
        model=RecurrentQNet(hidden_size=64, action_dim=2),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.97, n_step_return_horizon=3, target_update_freq=320, eps_training=0.3,
    )
    key = jax.random.key(0)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros((4, 2)))  # init with a stacked example [L, O]
    buffer = VectorReplayBuffer(total_size=20000, buffer_num=10, stack_num=4)
    buf_state = buffer.init(
        Batch(obs=jnp.zeros(2), act=jnp.int32(0), rew=jnp.float32(0),
              terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(2))
    )
    tc, ec = make_collectors(env, algo, buffer)
    params = OffPolicyTrainerParams(
        max_epochs=12, epoch_num_steps=5000, test_step_num_episodes=10,
        batch_size=64, collection_step_num_env_steps=10, update_per_step=0.2,
        start_steps=1000,
        stop_fn=lambda r: r >= 100,
        train_fn=lambda ep, step: {"eps_training": max(0.05, 0.3 * (1 - step / 40000))},
        verbose=False,
    )
    res = OffPolicyTrainer(algo, tc, ec, buffer, params).run(ts, buf_state, key)
    # memoryless policies plateau around ~60-80 on velocity-masked CartPole
    assert res.best_reward >= 100, f"best_reward {res.best_reward}"
