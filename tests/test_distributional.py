"""Distributional DQN family end-to-end (mirroring reference
test/discrete/test_c51.py, test_qrdqn.py, test_iqn.py, test_fqf.py,
test_rainbow.py, test_bdqn.py)."""

import jax
import jax.numpy as jnp
import pytest

from tests.helpers import make_collectors, transition_example
from tianshou_tpu.algorithm.modelfree.bdqn import BDQN
from tianshou_tpu.algorithm.modelfree.c51 import C51, RainbowDQN
from tianshou_tpu.algorithm.modelfree.fqf import FQF
from tianshou_tpu.algorithm.modelfree.iqn import IQN
from tianshou_tpu.algorithm.modelfree.qrdqn import QRDQN
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.env.classic.cartpole import CartPole
from tianshou_tpu.env.classic.pendulum import Pendulum
from tianshou_tpu.env.wrappers import ContinuousToDiscrete
from tianshou_tpu.models.discrete import ImplicitQuantileNetwork, RainbowNet
from tianshou_tpu.models.mlp import BranchingNet, Net
from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams

COMMON = dict(
    gamma=0.95, n_step_return_horizon=3, target_update_freq=320, eps_training=0.3,
)


def run(env, algo, obs_dim, stop, max_epochs=15):
    key = jax.random.key(0)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(obs_dim))
    buffer = VectorReplayBuffer(total_size=20000, buffer_num=10)
    buf_state = buffer.init(transition_example(env))
    tc, ec = make_collectors(env, algo, buffer)
    params = OffPolicyTrainerParams(
        max_epochs=max_epochs, epoch_num_steps=5000, test_step_num_episodes=10,
        batch_size=64, collection_step_num_env_steps=10, update_per_step=0.1,
        start_steps=1000,
        stop_fn=lambda r: r >= stop,
        train_fn=lambda ep, step: {"eps_training": max(0.1, 0.3 * (1 - step / 30000))},
        verbose=False,
    )
    res = OffPolicyTrainer(algo, tc, ec, buffer, params).run(ts, buf_state, key)
    assert res.best_reward >= stop, f"best_reward {res.best_reward}"


def test_c51_cartpole():
    env = CartPole()
    algo = C51(
        model=Net(hidden_sizes=(64, 64), output_dim=2, num_atoms=51, softmax=True),
        action_space=env.action_space, num_atoms=51, v_min=0.0, v_max=200.0,
        optim=AdamOptimizerFactory(lr=1e-3), **COMMON,
    )
    run(env, algo, 4, 195)


def test_rainbow_cartpole():
    env = CartPole()
    algo = RainbowDQN(
        model=RainbowNet(hidden_sizes=(64, 64), action_dim=2, num_atoms=51),
        action_space=env.action_space, num_atoms=51, v_min=0.0, v_max=200.0,
        optim=AdamOptimizerFactory(lr=1e-3), **COMMON,
    )
    run(env, algo, 4, 195)


def test_qrdqn_cartpole():
    env = CartPole()
    algo = QRDQN(
        model=Net(hidden_sizes=(64, 64), output_dim=2, num_atoms=64),
        action_space=env.action_space, num_quantiles=64,
        optim=AdamOptimizerFactory(lr=1e-3), **COMMON,
    )
    run(env, algo, 4, 195)


def test_iqn_cartpole():
    env = CartPole()
    algo = IQN(
        model=ImplicitQuantileNetwork(hidden_sizes=(64, 64), action_dim=2),
        action_space=env.action_space, sample_size=32,
        online_sample_size=8, target_sample_size=8,
        optim=AdamOptimizerFactory(lr=1e-3), **COMMON,
    )
    run(env, algo, 4, 195, max_epochs=25)


def test_fqf_cartpole():
    env = CartPole()
    algo = FQF(
        model=ImplicitQuantileNetwork(hidden_sizes=(64, 64), action_dim=2),
        action_space=env.action_space, num_fractions=32, ent_coef=10.0,
        optim=AdamOptimizerFactory(lr=1e-3), **COMMON,
    )
    run(env, algo, 4, 195)


def test_bdqn_discretized_pendulum():
    env = ContinuousToDiscrete(Pendulum(), 25)
    algo = BDQN(
        model=BranchingNet(hidden_sizes=(128, 128), num_branches=1, action_per_branch=25),
        action_space=env.action_space, gamma=0.99, target_update_freq=320,
        eps_training=0.3, optim=AdamOptimizerFactory(lr=1e-3),
    )
    run(env, algo, 3, -250)
