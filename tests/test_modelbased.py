"""GAIL, ICM wrappers and PSRL end-to-end (mirroring reference
test/offline/test_gail.py, test/modelbased/test_dqn_icm.py,
test_ppo_icm.py, test_psrl.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import make_collectors, transition_example
from tianshou_tpu.algorithm.imitation.gail import GAIL
from tianshou_tpu.algorithm.modelbased.icm import ICMOffPolicyWrapper, ICMOnPolicyWrapper
from tianshou_tpu.algorithm.modelbased.psrl import PSRL
from tianshou_tpu.algorithm.modelfree.dqn import DQN
from tianshou_tpu.algorithm.modelfree.ppo import PPO
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.env.classic.cartpole import CartPole
from tianshou_tpu.env.classic.nchain import NChain
from tianshou_tpu.models.continuous import ContinuousCritic
from tianshou_tpu.models.discrete import DiscreteActor, DiscreteCritic, IntrinsicCuriosityModule
from tianshou_tpu.models.mlp import Net
from tianshou_tpu.trainer.trainer import (
    OffPolicyTrainer,
    OffPolicyTrainerParams,
    OnPolicyTrainer,
    OnPolicyTrainerParams,
)


def test_gail_pendulum(pendulum_data):
    env, data_buffer, dstate = pendulum_data
    # flatten dataset into expert (obs, act) arrays
    E, C = data_buffer.num_envs, data_buffer.capacity
    expert_obs = np.asarray(dstate.data.obs).reshape(E * C, -1)
    expert_act = np.asarray(dstate.data.act).reshape(E * C, -1)
    valid = np.asarray(dstate.size)[:, None] > np.arange(C)[None, :]
    mask = valid.reshape(-1)
    expert_obs, expert_act = expert_obs[mask], expert_act[mask]

    from tianshou_tpu.models.continuous import ContinuousActorProbabilistic

    algo = GAIL(
        actor=ContinuousActorProbabilistic(hidden_sizes=(64, 64), action_dim=1),
        critic=DiscreteCritic(hidden_sizes=(64, 64)),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=3e-4, max_grad_norm=0.5),
        disc_net=ContinuousCritic(hidden_sizes=(64, 64)),
        expert_obs=expert_obs, expert_act=expert_act,
        disc_optim=AdamOptimizerFactory(lr=1e-3),
        disc_update_num=2,
        gamma=0.95, gae_lambda=0.95, eps_clip=0.2, deterministic_eval=True,
    )
    key = jax.random.key(0)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(3))
    tc, ec = make_collectors(env, algo, None, n_train=16, n_test=10)
    params = OnPolicyTrainerParams(
        max_epochs=15, epoch_num_steps=10000, test_step_num_episodes=10,
        batch_size=256, collection_step_num_env_steps=128,
        update_step_num_repetitions=5,
        stop_fn=lambda r: r >= -1100, verbose=False,
    )
    res = OnPolicyTrainer(algo, tc, ec, params).run(ts, key)
    assert res.best_reward >= -1100, f"best_reward {res.best_reward}"


def test_icm_dqn_cartpole():
    env = CartPole()
    base = DQN(
        model=Net(hidden_sizes=(64, 64), output_dim=2),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.97, n_step_return_horizon=3, target_update_freq=320, eps_training=0.3,
    )
    algo = ICMOffPolicyWrapper(
        base,
        model=IntrinsicCuriosityModule(feature_hidden=(64, 32), action_dim=2, hidden_sizes=(64,)),
        lr_scale=1.0, reward_scale=0.01, forward_loss_weight=0.2,
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
        start_steps=1000,
        stop_fn=lambda r: r >= 195,
        train_fn=lambda ep, step: {"eps_training": max(0.1, 0.3 * (1 - step / 30000))},
        verbose=False,
    )
    res = OffPolicyTrainer(algo, tc, ec, buffer, params).run(ts, buf_state, key)
    assert res.best_reward >= 195, f"best_reward {res.best_reward}"
    assert "icm" in res.train_state.params


def test_icm_ppo_cartpole():
    env = CartPole()
    base = PPO(
        actor=DiscreteActor(hidden_sizes=(64, 64), action_dim=2),
        critic=DiscreteCritic(hidden_sizes=(64, 64)),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=3e-4, max_grad_norm=0.5),
        deterministic_eval=True,
    )
    algo = ICMOnPolicyWrapper(
        base,
        model=IntrinsicCuriosityModule(feature_hidden=(64, 32), action_dim=2, hidden_sizes=(64,)),
        lr_scale=1.0, reward_scale=0.01, forward_loss_weight=0.2,
    )
    key = jax.random.key(0)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(4))
    tc, ec = make_collectors(env, algo, None, n_train=16, n_test=10)
    params = OnPolicyTrainerParams(
        max_epochs=20, epoch_num_steps=10000, test_step_num_episodes=10,
        batch_size=256, collection_step_num_env_steps=128,
        update_step_num_repetitions=10,
        stop_fn=lambda r: r >= 195, verbose=False,
    )
    res = OnPolicyTrainer(algo, tc, ec, params).run(ts, key)
    assert res.best_reward >= 195, f"best_reward {res.best_reward}"


def test_psrl_nchain():
    env = NChain(n=5, slip=0.2)
    algo = PSRL(
        n_state=5, n_action=2, action_space=env.action_space,
        gamma=0.95, value_iterations=200,
    )
    key = jax.random.key(0)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(1))
    tc, ec = make_collectors(env, algo, None, n_train=8, n_test=8)
    params = OnPolicyTrainerParams(
        max_epochs=10, epoch_num_steps=2000, test_step_num_episodes=8,
        batch_size=0 or 1024, collection_step_num_env_steps=100,
        update_step_num_repetitions=1,
        stop_fn=lambda r: r >= 340,
        verbose=False,
    )
    res = OnPolicyTrainer(algo, tc, ec, params).run(ts, key)
    # random policy averages ~210 per 100-step episode; optimal ~360+
    assert res.best_reward >= 340, f"best_reward {res.best_reward}"
