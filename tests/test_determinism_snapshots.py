"""Golden determinism snapshots across 6 algorithm families.

The reference ships pickled behavior traces in test/resources/determinism
and diffs each algorithm's short training run against them
(test/determinism_test.py:26, utils/determinism.py:250-397). Here each
algorithm runs a tiny fixed-seed training loop under ``TraceLoggerContext``;
the trace (collector episode counts + return sums, trainer env-step marks,
gradient-step param SHA1 hashes) is compared line-by-line against the
committed snapshot in ``tests/resources/determinism/``. Any change to RNG
key-threading, update order, or collection semantics flips the trace and
fails the diff.

To regenerate after an INTENTIONAL behavior change: delete the snapshot
file(s) and re-run — TraceDeterminismTest recreates missing snapshots.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from tests.helpers import make_collectors, transition_example
from tianshou_tpu.algorithm.modelfree.a2c import A2C
from tianshou_tpu.algorithm.modelfree.c51 import C51
from tianshou_tpu.algorithm.modelfree.dqn import DQN
from tianshou_tpu.algorithm.modelfree.ppo import PPO
from tianshou_tpu.algorithm.modelfree.sac import SAC
from tianshou_tpu.algorithm.modelfree.td3 import TD3
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.env.classic.cartpole import CartPole
from tianshou_tpu.env.classic.pendulum import Pendulum
from tianshou_tpu.models.continuous import ContinuousActorDeterministic, ContinuousActorProbabilistic, ContinuousCritic
from tianshou_tpu.models.discrete import DiscreteActor, DiscreteCritic
from tianshou_tpu.models.mlp import Net
from tianshou_tpu.trainer.trainer import (
    OffPolicyTrainer,
    OffPolicyTrainerParams,
    OnPolicyTrainer,
    OnPolicyTrainerParams,
)
from tianshou_tpu.utils.determinism import TraceDeterminismTest, TraceLoggerContext

SNAPSHOT_DIR = os.path.join(os.path.dirname(__file__), "resources", "determinism")

OFF_PARAMS = dict(
    max_epochs=1, epoch_num_steps=160, test_step_num_episodes=2,
    batch_size=32, collection_step_num_env_steps=10, update_per_step=0.25,
    start_steps=80, start_random=False, verbose=False, seed=0,
)
ON_PARAMS = dict(
    max_epochs=1, epoch_num_steps=256, test_step_num_episodes=2,
    batch_size=32, collection_step_num_env_steps=16,
    update_step_num_repetitions=1, verbose=False, seed=0,
)


def _run_off(algo, env, obs_dim):
    key = jax.random.key(0)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(obs_dim))
    buffer = VectorReplayBuffer(total_size=2048, buffer_num=4)
    bs = buffer.init(transition_example(env))
    tc, ec = make_collectors(env, algo, buffer, n_train=4, n_test=4)
    OffPolicyTrainer(algo, tc, ec, buffer, OffPolicyTrainerParams(**OFF_PARAMS)).run(ts, bs, key)


def _run_on(algo, env, obs_dim):
    key = jax.random.key(0)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(obs_dim))
    tc, ec = make_collectors(env, algo, None, n_train=4, n_test=4)
    OnPolicyTrainer(algo, tc, ec, OnPolicyTrainerParams(**ON_PARAMS)).run(ts, key)


def _dqn():
    env = CartPole()
    return _run_off, env, 4, DQN(
        model=Net(hidden_sizes=(32, 32), output_dim=2), action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=1e-3), gamma=0.97, n_step_return_horizon=3,
        target_update_freq=16, eps_training=0.2,
    )


def _c51():
    env = CartPole()
    return _run_off, env, 4, C51(
        model=Net(hidden_sizes=(32, 32), output_dim=2, num_atoms=17),
        action_space=env.action_space, optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.97, num_atoms=17, v_min=-10.0, v_max=10.0,
        n_step_return_horizon=1, target_update_freq=16, eps_training=0.2,
    )


def _sac():
    env = Pendulum()
    return _run_off, env, 3, SAC(
        actor=ContinuousActorProbabilistic(hidden_sizes=(32, 32), action_dim=1, conditioned_sigma=True),
        critic=ContinuousCritic(hidden_sizes=(32, 32)), action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=3e-4), critic_optim=AdamOptimizerFactory(lr=3e-4),
    )


def _td3():
    env = Pendulum()
    return _run_off, env, 3, TD3(
        actor=ContinuousActorDeterministic(hidden_sizes=(32, 32), action_dim=1),
        critic=ContinuousCritic(hidden_sizes=(32, 32)), action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=3e-4), critic_optim=AdamOptimizerFactory(lr=3e-4),
    )


def _ppo():
    env = CartPole()
    return _run_on, env, 4, PPO(
        actor=DiscreteActor(hidden_sizes=(32, 32), action_dim=2),
        critic=DiscreteCritic(hidden_sizes=(32, 32)), action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=3e-4),
    )


def _a2c():
    env = CartPole()
    return _run_on, env, 4, A2C(
        actor=DiscreteActor(hidden_sizes=(32, 32), action_dim=2),
        critic=DiscreteCritic(hidden_sizes=(32, 32)), action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=3e-4),
    )


@pytest.mark.parametrize("make", [_dqn, _c51, _sac, _td3, _ppo, _a2c],
                         ids=["dqn", "c51", "sac", "td3", "ppo", "a2c"])
def test_determinism_snapshot(make):
    runner, env, obs_dim, algo = make()
    with TraceLoggerContext() as tl:
        runner(algo, env, obs_dim)
        trace = tl.get_trace()
    assert trace, "trainer/collector emitted no trace lines"
    assert any("params=" in line for line in trace), "no param-hash lines in trace"
    TraceDeterminismTest(SNAPSHOT_DIR).check(make.__name__.strip("_"), trace)
