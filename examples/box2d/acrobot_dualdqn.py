"""Dueling double DQN on the device Acrobot — rebuild of the reference's
examples/box2d/acrobot_dualdqn.py (dueling Net, eps decay, 500-step cap)."""

import sys as _sys
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import argparse

import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.modelfree.dqn import DQN
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.env.classic.acrobot import Acrobot
from tianshou_tpu.env.core import VectorDeviceEnv
from tianshou_tpu.models.mlp import DuelingNet
from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams


def main(args):
    env = Acrobot()
    algo = DQN(
        model=DuelingNet(hidden_sizes=(128, 128), action_dim=3),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=args.lr),
        gamma=0.99, n_step_return_horizon=3, target_update_freq=320,
        eps_training=0.73,  # reference's tuned start eps
    )
    key = jax.random.key(args.seed)
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros(6))
    buffer = VectorReplayBuffer(total_size=args.buffer_size, buffer_num=args.num_envs)
    buf_state = buffer.init(Batch(
        obs=jnp.zeros(6), act=jnp.int32(0), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(6),
    ))
    tc = DeviceCollector(VectorDeviceEnv(env, args.num_envs), algo, buffer)
    ec = DeviceCollector(VectorDeviceEnv(env, 10), algo, None)
    params = OffPolicyTrainerParams(
        max_epochs=args.epochs, epoch_num_steps=args.epoch_num_steps,
        test_step_num_episodes=10, batch_size=64,
        collection_step_num_env_steps=10, update_per_step=0.1, start_steps=1000,
        stop_fn=lambda r: r >= -80,
        train_fn=lambda ep, step: {"eps_training": max(0.1, 0.73 * (1 - step / 50_000))},
        verbose=True, seed=args.seed,
    )
    res = OffPolicyTrainer(algo, tc, ec, buffer, params).run(ts, buf_state, key)
    print(f"best_reward={res.best_reward:.1f} env_steps={res.env_step}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--epoch-num-steps", type=int, default=10_000)
    p.add_argument("--num-envs", type=int, default=16)
    p.add_argument("--buffer-size", type=int, default=20_000)
    main(p.parse_args())
