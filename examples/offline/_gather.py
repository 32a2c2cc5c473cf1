"""Dataset gathering for the offline example family: train a behavior
policy online, roll it into a fixed buffer (the analogue of the reference's
test/offline/gather_pendulum_data.py / gather_cartpole_data.py, replacing
the d4rl downloads its d4rl_*.py scripts use)."""

import sys as _sys
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.modelfree.dqn import DQN
from tianshou_tpu.algorithm.modelfree.sac import SAC
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.env.classic.cartpole import CartPole
from tianshou_tpu.env.classic.pendulum import Pendulum
from tianshou_tpu.env.core import VectorDeviceEnv
from tianshou_tpu.models.mlp import Net
from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, ContinuousCritic
from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams


def gather_pendulum(key, dataset_size: int = 20_000):
    """Train SAC to >= -250 on Pendulum and collect a mixed dataset.
    Returns (env, data_buffer, data_state, expert_ts, expert_algo)."""
    env = Pendulum()
    example = Batch(obs=jnp.zeros(3), act=jnp.zeros(1), rew=jnp.float32(0),
                    terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(3))
    sac = SAC(
        actor=ContinuousActorProbabilistic(hidden_sizes=(128, 128), action_dim=1, conditioned_sigma=True),
        critic=ContinuousCritic(hidden_sizes=(128, 128)), action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=3e-4), critic_optim=AdamOptimizerFactory(lr=3e-4),
    )
    key, k = jax.random.split(key)
    ts = sac.init(k, jnp.zeros(3))
    rb = VectorReplayBuffer(total_size=50_000, buffer_num=8)
    rb_state = rb.init(example)
    tc = DeviceCollector(VectorDeviceEnv(env, 8), sac, rb)
    ec = DeviceCollector(VectorDeviceEnv(env, 10), sac, None)
    res = OffPolicyTrainer(sac, tc, ec, rb, OffPolicyTrainerParams(
        max_epochs=10, epoch_num_steps=4000, batch_size=128, collection_step_num_env_steps=8,
        update_per_step=0.5, start_steps=2000, start_random=False, stop_fn=lambda r: r >= -250,
    )).run(ts, rb_state, key)
    print(f"[gather] behavior policy best_reward={res.best_reward:.1f}")

    data = VectorReplayBuffer(total_size=dataset_size, buffer_num=8)
    dstate = data.init(example)
    dc = DeviceCollector(VectorDeviceEnv(env, 8), sac, data)
    key, kc, kr = jax.random.split(key, 3)
    dc_state = dc.reset(kr)
    dc_state, dstate, _ = dc.collect(res.train_state, dc_state, dstate, kc, dataset_size // 8)
    return env, data, dstate, res.train_state, sac


def gather_cartpole(key, dataset_size: int = 20_000):
    """Train DQN to >= 195 on CartPole and collect a dataset (the discrete
    analogue, reference gather_cartpole_data.py)."""
    env = CartPole()
    example = Batch(obs=jnp.zeros(4), act=jnp.int32(0), rew=jnp.float32(0),
                    terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(4))
    dqn = DQN(
        model=Net(hidden_sizes=(64, 64), output_dim=2), action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=1e-3), gamma=0.97, n_step_return_horizon=3,
        target_update_freq=320, eps_training=0.3,
    )
    key, k = jax.random.split(key)
    ts = dqn.init(k, jnp.zeros(4))
    rb = VectorReplayBuffer(total_size=50_000, buffer_num=8)
    rb_state = rb.init(example)
    tc = DeviceCollector(VectorDeviceEnv(env, 8), dqn, rb)
    ec = DeviceCollector(VectorDeviceEnv(env, 10), dqn, None)
    res = OffPolicyTrainer(dqn, tc, ec, rb, OffPolicyTrainerParams(
        max_epochs=10, epoch_num_steps=5000, batch_size=64, collection_step_num_env_steps=8,
        update_per_step=0.25, start_steps=1000, stop_fn=lambda r: r >= 195,
        train_fn=lambda ep, step: {"eps_training": max(0.1, 0.3 * (1 - step / 20000))},
    )).run(ts, rb_state, key)
    print(f"[gather] behavior policy best_reward={res.best_reward:.1f}")

    data = VectorReplayBuffer(total_size=dataset_size, buffer_num=8)
    dstate = data.init(example)
    dc = DeviceCollector(VectorDeviceEnv(env, 8), dqn, data)
    key, kc, kr = jax.random.split(key, 3)
    dc_state = dc.reset(kr)
    dc_state, dstate, _ = dc.collect(res.train_state, dc_state, dstate, kc, dataset_size // 8)
    return env, data, dstate, res.train_state, dqn
