"""DDPG/TD3/SAC end-to-end on device Pendulum (threshold -250, mirroring
reference test/continuous/test_ddpg.py, test_td3.py, test_sac_with_il.py:86)."""

import jax
import jax.numpy as jnp

from tests.helpers import make_collectors, transition_example
from tianshou_tpu.algorithm.modelfree.ddpg import DDPG
from tianshou_tpu.algorithm.modelfree.sac import SAC
from tianshou_tpu.algorithm.modelfree.td3 import TD3
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.env.classic.pendulum import Pendulum
from tianshou_tpu.models.continuous import (
    ContinuousActorDeterministic,
    ContinuousActorProbabilistic,
    ContinuousCritic,
)
from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams


def run_offpolicy(algo, max_epochs=12, update_per_step=0.5, seed=0):
    env = Pendulum()
    key = jax.random.key(seed)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(3))
    buffer = VectorReplayBuffer(total_size=50000, buffer_num=8)
    buf_state = buffer.init(transition_example(env))
    train_c, test_c = make_collectors(env, algo, buffer, n_train=8, n_test=10)
    params = OffPolicyTrainerParams(
        max_epochs=max_epochs,
        epoch_num_steps=4000,
        test_step_num_episodes=10,
        batch_size=128,
        collection_step_num_env_steps=8,
        update_per_step=update_per_step,
        start_steps=2000,
        start_random=False,
        stop_fn=lambda r: r >= -250,
        verbose=False,
    )
    return OffPolicyTrainer(algo, train_c, test_c, buffer, params).run(ts, buf_state, key)


def test_sac_pendulum():
    env = Pendulum()
    algo = SAC(
        actor=ContinuousActorProbabilistic(hidden_sizes=(128, 128), action_dim=1, conditioned_sigma=True),
        critic=ContinuousCritic(hidden_sizes=(128, 128)),
        action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=3e-4),
        critic_optim=AdamOptimizerFactory(lr=3e-4),
        gamma=0.99, tau=0.005, alpha="auto",
    )
    result = run_offpolicy(algo)
    assert result.best_reward >= -250, f"best_reward {result.best_reward}"
    # auto-alpha must have moved off its init value
    assert float(jnp.exp(result.train_state.params["log_alpha"])) != 1.0


def test_td3_pendulum():
    env = Pendulum()
    algo = TD3(
        actor=ContinuousActorDeterministic(hidden_sizes=(128, 128), action_dim=1),
        critic=ContinuousCritic(hidden_sizes=(128, 128)),
        action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=3e-4),
        critic_optim=AdamOptimizerFactory(lr=3e-4),
        gamma=0.99, tau=0.005,
    )
    result = run_offpolicy(algo)
    assert result.best_reward >= -250, f"best_reward {result.best_reward}"


def test_ddpg_pendulum():
    env = Pendulum()
    algo = DDPG(
        actor=ContinuousActorDeterministic(hidden_sizes=(128, 128), action_dim=1),
        critic=ContinuousCritic(hidden_sizes=(128, 128)),
        action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=1e-3),
        critic_optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.99, tau=0.005,
    )
    result = run_offpolicy(algo)
    assert result.best_reward >= -250, f"best_reward {result.best_reward}"
