"""Branching dueling Q (BDQN) on BipedalWalker with per-dim discretized
actions — rebuild of the reference's examples/box2d/bipedal_bdq.py
(ContinuousToDiscrete 25 bins x 4 dims, BranchingNet)."""

import sys as _sys
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import argparse

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.algorithm.modelfree.bdqn import BDQN
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.data.host_collector import HostCollector
from tianshou_tpu.env.core import MultiDiscrete
from tianshou_tpu.env.venvs import SubprocVectorEnv
from tianshou_tpu.models.mlp import BranchingNet
from tianshou_tpu.trainer.trainer import HostOffPolicyTrainer, OffPolicyTrainerParams

BINS = 25


class _DiscretizedBipedal:
    """Host-side per-dim discretization (reference gym_wrappers.py:8
    ContinuousToDiscrete applied to the gym env)."""

    def __init__(self):
        self.env = gym.make("BipedalWalker-v3")
        self.observation_space = self.env.observation_space
        low, high = self.env.action_space.low, self.env.action_space.high
        self._mesh = np.stack([np.linspace(lo, hi, BINS) for lo, hi in zip(low, high)])
        self.action_space = gym.spaces.MultiDiscrete([BINS] * 4)

    def reset(self, **kw):
        return self.env.reset(**kw)

    def step(self, act):
        cont = self._mesh[np.arange(4), np.asarray(act, dtype=np.int64)]
        return self.env.step(cont)

    def close(self):
        self.env.close()


def main(args):
    algo = BDQN(
        model=BranchingNet(hidden_sizes=(512, 256), num_branches=4, action_per_branch=BINS),
        action_space=MultiDiscrete([BINS] * 4),
        optim=AdamOptimizerFactory(lr=args.lr),
        gamma=0.99, target_update_freq=1000, eps_training=0.73,
    )
    key = jax.random.key(args.seed)
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros(24))
    buffer = VectorReplayBuffer(total_size=args.buffer_size, buffer_num=args.num_envs)
    buf_state = buffer.init(Batch(
        obs=jnp.zeros(24), act=jnp.zeros(4, jnp.int32), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(24),
    ))
    tc = HostCollector(SubprocVectorEnv([_DiscretizedBipedal for _ in range(args.num_envs)]), algo, buffer)
    ec = HostCollector(SubprocVectorEnv([_DiscretizedBipedal for _ in range(4)]), algo, None)
    params = OffPolicyTrainerParams(
        max_epochs=args.epochs, epoch_num_steps=args.epoch_num_steps,
        test_step_num_episodes=4, batch_size=512,
        collection_step_num_env_steps=10, update_per_step=0.0625, start_steps=2_000,
        stop_fn=lambda r: r >= 300,
        train_fn=lambda ep, step: {"eps_training": max(0.0, 0.73 * (1 - step / 500_000))},
        verbose=True, seed=args.seed,
    )
    res = HostOffPolicyTrainer(algo, tc, ec, buffer, params).run(ts, buf_state, key)
    print(f"best_reward={res.best_reward:.1f} env_steps={res.env_step}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--epoch-num-steps", type=int, default=80_000)
    p.add_argument("--num-envs", type=int, default=16)
    p.add_argument("--buffer-size", type=int, default=100_000)
    main(p.parse_args())
