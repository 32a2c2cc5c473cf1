"""DQN on Box2D LunarLander through the host path (reference
examples/box2d/lunarlander_dqn.py: 128x128 dueling net, n-step 4).

    python examples/box2d/lunarlander_dqn.py --epochs 10
"""

import sys as _sys
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import argparse

import gymnasium as gym
import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.modelfree.dqn import DQN
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.data.host_collector import HostCollector
from tianshou_tpu.env.core import Discrete
from tianshou_tpu.env.venvs import SubprocVectorEnv
from tianshou_tpu.models.mlp import DuelingNet
from tianshou_tpu.trainer.trainer import HostOffPolicyTrainer, OffPolicyTrainerParams


def main(args):
    task = "LunarLander-v3"
    make = lambda: gym.make(task)
    probe = make()
    obs_dim = probe.observation_space.shape[0]
    n_act = probe.action_space.n
    probe.close()
    algo = DQN(
        model=DuelingNet(hidden_sizes=(128, 128), action_dim=n_act),
        action_space=Discrete(n_act),
        optim=AdamOptimizerFactory(lr=args.lr),
        gamma=0.99, n_step_return_horizon=4, target_update_freq=320,
        eps_training=0.73,  # reference lunarlander eps schedule start
    )
    key = jax.random.key(args.seed)
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros(obs_dim))
    buffer = VectorReplayBuffer(total_size=100_000, buffer_num=args.num_envs)
    buf_state = buffer.init(Batch(
        obs=jnp.zeros(obs_dim), act=jnp.int32(0), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(obs_dim),
    ))
    tc = HostCollector(SubprocVectorEnv([make for _ in range(args.num_envs)]), algo, buffer)
    ec = HostCollector(SubprocVectorEnv([make for _ in range(10)]), algo, None)
    params = OffPolicyTrainerParams(
        max_epochs=args.epochs, epoch_num_steps=10_000, test_step_num_episodes=10,
        batch_size=128, collection_step_num_env_steps=10, update_per_step=0.125,
        start_steps=5_000, stop_fn=lambda r: r >= 200,
        train_fn=lambda ep, step: {"eps_training": max(0.1, 0.73 * (1 - step / 50_000))},
        test_fn=lambda ep, step: {"eps_inference": 0.01},
        verbose=True, seed=args.seed,
    )
    res = HostOffPolicyTrainer(algo, tc, ec, buffer, params).run(ts, buf_state, key)
    print(f"best_reward={res.best_reward:.1f} env_steps={res.env_step}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--num-envs", type=int, default=16)
    main(p.parse_args())
