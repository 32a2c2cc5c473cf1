"""SAC on the device MountainCarContinuous — rebuild of the reference's
examples/box2d/mcc_sac.py (OU exploration noise on top of the squashed
policy, auto-alpha)."""

import sys as _sys
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import argparse

import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.modelfree.sac import SAC
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.env.classic.mountain_car import MountainCarContinuous
from tianshou_tpu.env.core import VectorDeviceEnv
from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, ContinuousCritic
from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams


def main(args):
    env = MountainCarContinuous()
    algo = SAC(
        actor=ContinuousActorProbabilistic(hidden_sizes=(128, 128), action_dim=1, conditioned_sigma=True),
        critic=ContinuousCritic(hidden_sizes=(128, 128)),
        action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=args.lr),
        critic_optim=AdamOptimizerFactory(lr=args.lr),
        alpha="auto", gamma=0.99, tau=0.005,
    )
    key = jax.random.key(args.seed)
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros(2))
    buffer = VectorReplayBuffer(total_size=50_000, buffer_num=args.num_envs)
    buf_state = buffer.init(Batch(
        obs=jnp.zeros(2), act=jnp.zeros(1), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(2),
    ))
    tc = DeviceCollector(VectorDeviceEnv(env, args.num_envs), algo, buffer)
    ec = DeviceCollector(VectorDeviceEnv(env, 10), algo, None)
    params = OffPolicyTrainerParams(
        max_epochs=args.epochs, epoch_num_steps=args.epoch_num_steps,
        test_step_num_episodes=10, batch_size=128,
        collection_step_num_env_steps=10, update_per_step=0.2, start_steps=5_000,
        stop_fn=lambda r: r >= 90,
        verbose=True, seed=args.seed,
    )
    res = OffPolicyTrainer(algo, tc, ec, buffer, params).run(ts, buf_state, key)
    print(f"best_reward={res.best_reward:.1f} env_steps={res.env_step}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--epoch-num-steps", type=int, default=12_000)
    p.add_argument("--num-envs", type=int, default=16)
    main(p.parse_args())
