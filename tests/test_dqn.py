"""DQN end-to-end: trains on device CartPole to the reference threshold
(195, test/discrete/test_dqn.py:69), plus a prioritized-replay variant
(mirroring test_pdqn.py)."""

import jax
import jax.numpy as jnp

from tests.helpers import make_collectors, transition_example
from tianshou_tpu.algorithm.modelfree.dqn import DQN
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.data.buffer.prio import PrioritizedVectorReplayBuffer
from tianshou_tpu.env.classic.cartpole import CartPole
from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams


def run_dqn(buffer, seed=0):
    env = CartPole()
    from tianshou_tpu.models.mlp import Net

    algo = DQN(
        model=Net(hidden_sizes=(64, 64), output_dim=2),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.97,
        n_step_return_horizon=3,
        target_update_freq=320,
        eps_training=0.3,
    )
    key = jax.random.key(seed)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(4))
    buf_state = buffer.init(transition_example(env))
    train_c, test_c = make_collectors(env, algo, buffer)
    params = OffPolicyTrainerParams(
        max_epochs=15,
        epoch_num_steps=5000,
        test_step_num_episodes=10,
        batch_size=64,
        collection_step_num_env_steps=10,
        update_per_step=0.1,
        start_steps=1000,
        stop_fn=lambda r: r >= 195,
        train_fn=lambda ep, step: {"eps_training": max(0.1, 0.3 * (1 - step / 30000))},
        verbose=False,
    )
    trainer = OffPolicyTrainer(algo, train_c, test_c, buffer, params)
    return trainer.run(ts, buf_state, key)


def test_dqn_cartpole():
    result = run_dqn(VectorReplayBuffer(total_size=20000, buffer_num=10))
    assert result.best_reward >= 195, f"best_reward {result.best_reward}"


def test_dqn_prioritized():
    result = run_dqn(PrioritizedVectorReplayBuffer(total_size=20000, buffer_num=10, alpha=0.6, beta=0.4))
    assert result.best_reward >= 195, f"best_reward {result.best_reward}"


def test_dqn_fused_megastep():
    """Fused collect+update megastep path reaches the same threshold."""
    env = CartPole()
    from tianshou_tpu.models.mlp import Net

    algo = DQN(
        model=Net(hidden_sizes=(64, 64), output_dim=2),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.97, n_step_return_horizon=3, target_update_freq=320, eps_training=0.3,
    )
    key = jax.random.key(0)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(4))
    buffer = VectorReplayBuffer(total_size=20000, buffer_num=10)
    buf_state = buffer.init(transition_example(env))
    train_c, test_c = make_collectors(env, algo, buffer)
    params = OffPolicyTrainerParams(
        max_epochs=15, epoch_num_steps=5000, test_step_num_episodes=10,
        batch_size=64, collection_step_num_env_steps=10, update_per_step=0.1,
        start_steps=1000, fused_megastep=True,
        stop_fn=lambda r: r >= 195,
        train_fn=lambda ep, step: {"eps_training": max(0.1, 0.3 * (1 - step / 30000))},
        verbose=False,
    )
    trainer = OffPolicyTrainer(algo, train_c, test_c, buffer, params)
    result = trainer.run(ts, buf_state, key)
    assert result.best_reward >= 195, f"best_reward {result.best_reward}"
    assert result.gradient_step > 0
