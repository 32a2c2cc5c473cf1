"""Reference MuJoCo-table parity rows on device balance envs.

BASELINE.md lists InvertedPendulum at 1000.0 +- 0.0 for every continuous
algorithm; these tests reproduce that row with SAC and TD3 on the device
InvertedPendulum (MuJoCo task structure: alive bonus, |theta|>0.2
termination, 1000-step horizon, rail as a physical stop)."""

import jax
import jax.numpy as jnp
import pytest

from tests.helpers import make_collectors, transition_example
from tianshou_tpu.algorithm import SAC, TD3
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.env.classic.inverted_pendulum import InvertedDoublePendulum, InvertedPendulum
from tianshou_tpu.models.continuous import (
    ContinuousActorDeterministic,
    ContinuousActorProbabilistic,
    ContinuousCritic,
)
from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams


def _run(env, algo, obs_dim, stop, max_epochs=12, update_per_step=0.5):
    key = jax.random.key(0)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(obs_dim))
    buffer = VectorReplayBuffer(total_size=100000, buffer_num=8)
    bs = buffer.init(transition_example(env))
    tc, ec = make_collectors(env, algo, buffer, n_train=8, n_test=10)
    params = OffPolicyTrainerParams(
        max_epochs=max_epochs, epoch_num_steps=5000, test_step_num_episodes=10,
        batch_size=256, collection_step_num_env_steps=8, update_per_step=update_per_step,
        start_steps=2000, start_random=False,
        stop_fn=lambda r: r >= stop, verbose=False,
    )
    return OffPolicyTrainer(algo, tc, ec, buffer, params).run(ts, bs, key)


def test_sac_inverted_pendulum_full_score():
    env = InvertedPendulum()
    algo = SAC(
        actor=ContinuousActorProbabilistic(hidden_sizes=(128, 128), action_dim=1, conditioned_sigma=True),
        critic=ContinuousCritic(hidden_sizes=(128, 128)),
        action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=3e-4),
        critic_optim=AdamOptimizerFactory(lr=3e-4),
        gamma=0.99, tau=0.005,
    )
    res = _run(env, algo, 4, stop=1000)
    # the reference table row: 1000.0 +- 0.0 (examples/mujoco/README.md)
    assert res.best_reward == 1000.0, f"best_reward {res.best_reward}"


def test_td3_inverted_pendulum_full_score():
    env = InvertedPendulum()
    algo = TD3(
        actor=ContinuousActorDeterministic(hidden_sizes=(128, 128), action_dim=1),
        critic=ContinuousCritic(hidden_sizes=(128, 128)),
        action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=3e-4),
        critic_optim=AdamOptimizerFactory(lr=3e-4),
        gamma=0.99, tau=0.005,
    )
    res = _run(env, algo, 4, stop=1000)
    assert res.best_reward == 1000.0, f"best_reward {res.best_reward}"


def test_inverted_double_pendulum_smoke():
    """IDP dynamics are stable and learnable (full ~9350 convergence is a
    longer run; see ROADMAP)."""
    env = InvertedDoublePendulum()
    from tianshou_tpu.env.core import VectorDeviceEnv

    venv = VectorDeviceEnv(env, 4)
    state, obs = venv.reset(jax.random.key(0))
    for i in range(5):
        step = venv.step(state, jnp.zeros((4, 1)), jax.random.key(i))
        state = step.state
    assert bool(jnp.isfinite(step.obs).all())
    assert float(step.reward.max()) <= 10.0


def test_ppo_inverted_pendulum_full_score():
    """On-policy row of the same table (PPO: 1000.0 +- 0.0)."""
    from tianshou_tpu.algorithm import PPO
    from tianshou_tpu.models.discrete import DiscreteCritic
    from tianshou_tpu.trainer.trainer import OnPolicyTrainer, OnPolicyTrainerParams

    env = InvertedPendulum()
    algo = PPO(
        actor=ContinuousActorProbabilistic(hidden_sizes=(64, 64), action_dim=1),
        critic=DiscreteCritic(hidden_sizes=(64, 64)),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=3e-4, max_grad_norm=0.5),
        gamma=0.99, gae_lambda=0.95, eps_clip=0.2, ent_coef=0.0,
        deterministic_eval=True,
    )
    key = jax.random.key(0)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(4))
    tc, ec = make_collectors(env, algo, None, n_train=16, n_test=10)
    params = OnPolicyTrainerParams(
        max_epochs=8, epoch_num_steps=20000, test_step_num_episodes=10,
        batch_size=512, collection_step_num_env_steps=128,
        update_step_num_repetitions=10,
        stop_fn=lambda r: r >= 1000, verbose=False,
    )
    res = OnPolicyTrainer(algo, tc, ec, params).run(ts, key)
    assert res.best_reward == 1000.0, f"best_reward {res.best_reward}"


@pytest.mark.skipif(
    not __import__("os").environ.get("TIANSHOU_TPU_SLOW"),
    reason="~45 min convergence run; measured 2026-08-16: SAC reaches 9995.4 "
    "at 274k steps (reference table: 9359.5 +- 0.4 at 1M). Set "
    "TIANSHOU_TPU_SLOW=1 to run.",
)
def test_sac_inverted_double_pendulum_table_score():
    env = InvertedDoublePendulum()
    algo = SAC(
        actor=ContinuousActorProbabilistic(hidden_sizes=(256, 256), action_dim=1, conditioned_sigma=True),
        critic=ContinuousCritic(hidden_sizes=(256, 256)),
        action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=3e-4),
        critic_optim=AdamOptimizerFactory(lr=3e-4),
        gamma=0.99, tau=0.005,
    )
    key = jax.random.key(1)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(9))
    buffer = VectorReplayBuffer(total_size=200000, buffer_num=8)
    bs = buffer.init(transition_example(env))
    tc, ec = make_collectors(env, algo, buffer, n_train=8, n_test=10)
    params = OffPolicyTrainerParams(
        max_epochs=120, epoch_num_steps=6000, test_step_num_episodes=10,
        batch_size=256, collection_step_num_env_steps=8, update_per_step=0.25,
        start_steps=3000, start_random=False,
        stop_fn=lambda r: r >= 9200, verbose=False,
    )
    res = OffPolicyTrainer(algo, tc, ec, buffer, params).run(ts, bs, key)
    assert res.best_reward >= 9200, f"best_reward {res.best_reward}"
