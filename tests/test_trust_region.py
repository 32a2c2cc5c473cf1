"""NPG/TRPO end-to-end (mirroring reference test/discrete/test_npg... and
test/continuous/test_npg.py, test_trpo.py) + REDQ + DiscreteSAC."""

import jax
import jax.numpy as jnp

from tests.helpers import make_collectors, transition_example
from tianshou_tpu.algorithm.modelfree.discrete_sac import DiscreteSAC
from tianshou_tpu.algorithm.modelfree.npg import NPG
from tianshou_tpu.algorithm.modelfree.redq import REDQ
from tianshou_tpu.algorithm.modelfree.trpo import TRPO
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.env.classic.cartpole import CartPole
from tianshou_tpu.env.classic.pendulum import Pendulum
from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, EnsembleCritic
from tianshou_tpu.models.discrete import DiscreteActor, DiscreteCritic
from tianshou_tpu.trainer.trainer import (
    OffPolicyTrainer,
    OffPolicyTrainerParams,
    OnPolicyTrainer,
    OnPolicyTrainerParams,
)


def _run_tr(cls):
    env = CartPole()
    algo = cls(
        actor=DiscreteActor(hidden_sizes=(64, 64), action_dim=2),
        critic=DiscreteCritic(hidden_sizes=(64, 64)),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.99, gae_lambda=0.95, deterministic_eval=True,
    )
    key = jax.random.key(0)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(4))
    tc, ec = make_collectors(env, algo, None, n_train=16, n_test=10)
    params = OnPolicyTrainerParams(
        max_epochs=15, epoch_num_steps=10000, test_step_num_episodes=10,
        batch_size=1024, collection_step_num_env_steps=128,
        update_step_num_repetitions=1,
        stop_fn=lambda r: r >= 195, verbose=False,
    )
    res = OnPolicyTrainer(algo, tc, ec, params).run(ts, key)
    assert res.best_reward >= 195, f"best_reward {res.best_reward}"


def test_npg_cartpole():
    _run_tr(NPG)


def test_trpo_cartpole():
    _run_tr(TRPO)


def test_redq_pendulum():
    env = Pendulum()
    algo = REDQ(
        actor=ContinuousActorProbabilistic(hidden_sizes=(128, 128), action_dim=1, conditioned_sigma=True),
        critic=EnsembleCritic(ensemble_size=10, hidden_sizes=(128, 128)),
        action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=3e-4),
        critic_optim=AdamOptimizerFactory(lr=3e-4),
        ensemble_size=10, subset_size=2, actor_delay=5, gamma=0.99, tau=0.005,
    )
    key = jax.random.key(0)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(3))
    buffer = VectorReplayBuffer(total_size=50000, buffer_num=8)
    buf_state = buffer.init(transition_example(env))
    tc, ec = make_collectors(env, algo, buffer, n_train=8, n_test=10)
    params = OffPolicyTrainerParams(
        max_epochs=12, epoch_num_steps=4000, test_step_num_episodes=10,
        batch_size=128, collection_step_num_env_steps=8, update_per_step=0.5,
        start_steps=2000, start_random=False,
        stop_fn=lambda r: r >= -250, verbose=False,
    )
    res = OffPolicyTrainer(algo, tc, ec, buffer, params).run(ts, buf_state, key)
    assert res.best_reward >= -250, f"best_reward {res.best_reward}"


def test_discrete_sac_cartpole():
    env = CartPole()
    algo = DiscreteSAC(
        actor=DiscreteActor(hidden_sizes=(64, 64), action_dim=2),
        critic=DiscreteCritic(hidden_sizes=(64, 64), last_size=2),
        action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=5e-4),
        critic_optim=AdamOptimizerFactory(lr=5e-4),
        gamma=0.95, tau=0.005, alpha=0.05, n_step_return_horizon=3,
    )
    key = jax.random.key(0)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(4))
    buffer = VectorReplayBuffer(total_size=20000, buffer_num=10)
    buf_state = buffer.init(transition_example(env))
    tc, ec = make_collectors(env, algo, buffer)
    params = OffPolicyTrainerParams(
        max_epochs=15, epoch_num_steps=5000, test_step_num_episodes=10,
        batch_size=64, collection_step_num_env_steps=10, update_per_step=0.1,
        start_steps=1000, start_random=False,
        stop_fn=lambda r: r >= 195, verbose=False,
    )
    res = OffPolicyTrainer(algo, tc, ec, buffer, params).run(ts, buf_state, key)
    assert res.best_reward >= 195, f"best_reward {res.best_reward}"


def test_trpo_continuous_pendulum():
    """Continuous trust-region path: Normal-distribution KL/FVP (reference
    test/continuous/test_trpo.py)."""
    from tianshou_tpu.env.classic.pendulum import Pendulum
    from tianshou_tpu.models.continuous import ContinuousActorProbabilistic

    env = Pendulum()
    algo = TRPO(
        actor=ContinuousActorProbabilistic(hidden_sizes=(64, 64), action_dim=1),
        critic=DiscreteCritic(hidden_sizes=(64, 64)),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.95, gae_lambda=0.95, optim_critic_iters=5, max_kl=0.01,
        deterministic_eval=True,
    )
    key = jax.random.key(0)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(3))
    tc, ec = make_collectors(env, algo, None, n_train=16, n_test=10)
    params = OnPolicyTrainerParams(
        max_epochs=15, epoch_num_steps=10000, test_step_num_episodes=10,
        batch_size=1024, collection_step_num_env_steps=128,
        update_step_num_repetitions=1,
        stop_fn=lambda r: r >= -450, verbose=False,
    )
    res = OnPolicyTrainer(algo, tc, ec, params).run(ts, key)
    assert res.best_reward >= -450, f"best_reward {res.best_reward}"
