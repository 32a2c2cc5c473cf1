"""DQN on device CartPole — low-level API (analogue of reference
test/discrete/test_dqn.py / examples/atari/atari_dqn.py structure)."""

import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))  # run without install


import argparse

import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.modelfree.dqn import DQN
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.env.classic.cartpole import CartPole
from tianshou_tpu.env.core import VectorDeviceEnv
from tianshou_tpu.models.mlp import Net
from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams
from tianshou_tpu.utils.logger.tensorboard import TensorboardLogger


def main(args):
    env = CartPole()
    algo = DQN(
        model=Net(hidden_sizes=(64, 64), output_dim=2),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=args.lr),
        gamma=args.gamma,
        n_step_return_horizon=3,
        target_update_freq=320,
        eps_training=0.3,
    )
    key = jax.random.key(args.seed)
    key, k_init = jax.random.split(key)
    ts = algo.init(k_init, jnp.zeros(4))

    buffer = VectorReplayBuffer(total_size=args.buffer_size, buffer_num=args.num_envs)
    buf_state = buffer.init(
        Batch(obs=jnp.zeros(4), act=jnp.int32(0), rew=jnp.float32(0),
              terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(4))
    )
    train_c = DeviceCollector(VectorDeviceEnv(env, args.num_envs), algo, buffer)
    test_c = DeviceCollector(VectorDeviceEnv(env, 10), algo, None)

    logger = TensorboardLogger(log_dir=args.logdir) if args.logdir else None
    params = OffPolicyTrainerParams(
        max_epochs=args.epochs, epoch_num_steps=5000, test_step_num_episodes=10,
        batch_size=64, collection_step_num_env_steps=10, update_per_step=0.1,
        start_steps=1000,
        stop_fn=lambda r: r >= 195,
        train_fn=lambda ep, step: {"eps_training": max(0.1, 0.3 * (1 - step / 30000))},
        logger=logger,
    )
    result = OffPolicyTrainer(algo, train_c, test_c, buffer, params).run(ts, buf_state, key)
    print(f"best_reward={result.best_reward:.1f} env_steps={result.env_step} "
          f"time={result.train_time:.1f}s timing={result.timing}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--gamma", type=float, default=0.97)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--num-envs", type=int, default=10)
    p.add_argument("--buffer-size", type=int, default=20000)
    p.add_argument("--logdir", type=str, default=None)
    main(p.parse_args())
