"""Offline / imitation algorithms end-to-end (mirroring reference
test/offline/*): expert data is gathered by quickly training an online
algorithm, then offline learners must reach thresholds from the fixed
buffer alone."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import make_collectors, transition_example
from tianshou_tpu.algorithm.imitation.bc import ImitationLearning
from tianshou_tpu.algorithm.imitation.bcq import BCQ
from tianshou_tpu.algorithm.imitation.cql import CQL
from tianshou_tpu.algorithm.imitation.discrete_bcq import DiscreteBCQ
from tianshou_tpu.algorithm.imitation.discrete_cql import DiscreteCQL
from tianshou_tpu.algorithm.imitation.discrete_crr import DiscreteCRR
from tianshou_tpu.algorithm.imitation.td3_bc import TD3BC
from tianshou_tpu.algorithm.modelfree.dqn import DQN
from tianshou_tpu.algorithm.modelfree.sac import SAC
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.env.classic.cartpole import CartPole
from tianshou_tpu.env.classic.pendulum import Pendulum
from tianshou_tpu.env.core import VectorDeviceEnv
from tianshou_tpu.models.continuous import (
    ContinuousActorDeterministic,
    ContinuousActorProbabilistic,
    ContinuousCritic,
    Perturbation,
    VAE,
)
from tianshou_tpu.models.discrete import DiscreteActor, DiscreteCritic
from tianshou_tpu.models.mlp import Net
from tianshou_tpu.trainer.trainer import (
    OfflineTrainer,
    OfflineTrainerParams,
    OffPolicyTrainer,
    OffPolicyTrainerParams,
)

# expert-data fixtures (cartpole_data / pendulum_data) live in conftest.py,
# shared with the GAIL/ICM tests (reference test/offline/gather_*_data.py).


def run_offline(env, buffer, buf_state, algo, obs_dim, stop, epochs=8, grad_steps=500, bs=64):
    key = jax.random.key(1)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(obs_dim))
    _, ec = make_collectors(env, algo, None)
    params = OfflineTrainerParams(
        max_epochs=epochs, update_step_num_gradient_steps_per_epoch=grad_steps,
        batch_size=bs, test_step_num_episodes=10,
        stop_fn=lambda r: r >= stop, verbose=False,
    )
    res = OfflineTrainer(algo, buffer, ec, params).run(ts, buf_state, key)
    assert res.best_reward >= stop, f"best_reward {res.best_reward}"
    return res


# ---------------------------------------------------------------------------
# discrete offline
# ---------------------------------------------------------------------------


def test_bc_discrete(cartpole_data):
    env, buffer, buf_state = cartpole_data
    algo = ImitationLearning(
        model=DiscreteActor(hidden_sizes=(64, 64), action_dim=2),
        action_space=env.action_space, optim=AdamOptimizerFactory(lr=1e-3),
    )
    run_offline(env, buffer, buf_state, algo, 4, 150)


def test_discrete_bcq(cartpole_data):
    env, buffer, buf_state = cartpole_data
    algo = DiscreteBCQ(
        model=Net(hidden_sizes=(64, 64), output_dim=2),
        imitator=DiscreteActor(hidden_sizes=(64, 64), action_dim=2),
        action_space=env.action_space, optim=AdamOptimizerFactory(lr=3e-4),
        gamma=0.97, n_step_return_horizon=3, target_update_freq=320,
        unlikely_action_threshold=0.6,
    )
    run_offline(env, buffer, buf_state, algo, 4, 150)


def test_discrete_cql(cartpole_data):
    env, buffer, buf_state = cartpole_data
    algo = DiscreteCQL(
        model=Net(hidden_sizes=(64, 64), output_dim=2, num_atoms=64),
        action_space=env.action_space, num_quantiles=64,
        optim=AdamOptimizerFactory(lr=3e-4),
        gamma=0.97, n_step_return_horizon=3, target_update_freq=320,
        min_q_weight=10.0,
    )
    run_offline(env, buffer, buf_state, algo, 4, 150)


def test_discrete_crr(cartpole_data):
    env, buffer, buf_state = cartpole_data
    algo = DiscreteCRR(
        actor=DiscreteActor(hidden_sizes=(64, 64), action_dim=2),
        critic=DiscreteCritic(hidden_sizes=(64, 64), last_size=2),
        action_space=env.action_space, optim=AdamOptimizerFactory(lr=3e-4),
        gamma=0.97, target_update_freq=320,
    )
    run_offline(env, buffer, buf_state, algo, 4, 150)


# ---------------------------------------------------------------------------
# continuous offline
# ---------------------------------------------------------------------------


def test_bc_continuous(pendulum_data):
    env, buffer, buf_state = pendulum_data
    algo = ImitationLearning(
        model=ContinuousActorDeterministic(hidden_sizes=(64, 64), action_dim=1, max_action=2.0),
        action_space=env.action_space, optim=AdamOptimizerFactory(lr=1e-3),
        action_bound_method=None,
    )
    run_offline(env, buffer, buf_state, algo, 3, -800)


def test_td3_bc(pendulum_data):
    env, buffer, buf_state = pendulum_data
    algo = TD3BC(
        actor=ContinuousActorDeterministic(hidden_sizes=(128, 128), action_dim=1),
        critic=ContinuousCritic(hidden_sizes=(128, 128)),
        action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=3e-4),
        critic_optim=AdamOptimizerFactory(lr=3e-4),
        gamma=0.99, tau=0.005, alpha=2.5,
    )
    run_offline(env, buffer, buf_state, algo, 3, -800)


def test_bcq(pendulum_data):
    env, buffer, buf_state = pendulum_data
    algo = BCQ(
        actor_perturbation=Perturbation(hidden_sizes=(64, 64), action_dim=1, max_action=1.0, phi=0.05),
        critic=ContinuousCritic(hidden_sizes=(64, 64)),
        vae=VAE(encoder_hidden=(64,), decoder_hidden=(64,), action_dim=1, latent_dim=2, max_action=1.0),
        action_space=env.action_space,
        gamma=0.99, tau=0.005, forward_sampled_times=20, num_sampled_action=10,
    )
    run_offline(env, buffer, buf_state, algo, 3, -800)


def test_cql(pendulum_data):
    env, buffer, buf_state = pendulum_data
    algo = CQL(
        actor=ContinuousActorProbabilistic(hidden_sizes=(128, 128), action_dim=1, conditioned_sigma=True),
        critic=ContinuousCritic(hidden_sizes=(128, 128)),
        action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=3e-4),
        critic_optim=AdamOptimizerFactory(lr=3e-4),
        cql_weight=1.0, with_lagrange=True, num_repeat_actions=10,
    )
    run_offline(env, buffer, buf_state, algo, 3, -800, epochs=10, grad_steps=500, bs=128)
