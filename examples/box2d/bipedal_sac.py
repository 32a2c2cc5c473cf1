"""SAC on Box2D BipedalWalker through the host path (reference
examples/box2d/bipedal_hardcore_sac.py).

    python examples/box2d/bipedal_sac.py --epochs 20 [--hardcore]
"""

import sys as _sys
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import argparse

import gymnasium as gym
import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.modelfree.sac import SAC
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.data.host_collector import HostCollector
from tianshou_tpu.env.core import Box
from tianshou_tpu.env.venvs import SubprocVectorEnv
from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, ContinuousCritic
from tianshou_tpu.trainer.trainer import HostOffPolicyTrainer, OffPolicyTrainerParams


def main(args):
    task = "BipedalWalker-v3"
    make = lambda: gym.make(task, hardcore=args.hardcore)
    probe = make()
    obs_dim = probe.observation_space.shape[0]
    nu = probe.action_space.shape[0]
    probe.close()
    algo = SAC(
        actor=ContinuousActorProbabilistic(hidden_sizes=(128, 128), action_dim=nu, conditioned_sigma=True),
        critic=ContinuousCritic(hidden_sizes=(128, 128)),
        action_space=Box(low=[-1.0] * nu, high=[1.0] * nu),
        policy_optim=AdamOptimizerFactory(lr=3e-4),
        critic_optim=AdamOptimizerFactory(lr=3e-4),
        alpha="auto", tau=0.005, gamma=0.99, n_step_return_horizon=1,
    )
    key = jax.random.key(args.seed)
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros(obs_dim))
    buffer = VectorReplayBuffer(total_size=300_000, buffer_num=args.num_envs)
    buf_state = buffer.init(Batch(
        obs=jnp.zeros(obs_dim), act=jnp.zeros(nu), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(obs_dim),
    ))
    tc = HostCollector(SubprocVectorEnv([make for _ in range(args.num_envs)]), algo, buffer)
    ec = HostCollector(SubprocVectorEnv([make for _ in range(10)]), algo, None)
    params = OffPolicyTrainerParams(
        max_epochs=args.epochs, epoch_num_steps=10_000, test_step_num_episodes=10,
        batch_size=256, collection_step_num_env_steps=10, update_per_step=0.2,
        start_steps=10_000, stop_fn=lambda r: r >= 300,
        verbose=True, seed=args.seed,
    )
    res = HostOffPolicyTrainer(algo, tc, ec, buffer, params).run(ts, buf_state, key)
    print(f"best_reward={res.best_reward:.1f} env_steps={res.env_step}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--num-envs", type=int, default=16)
    p.add_argument("--hardcore", action="store_true")
    main(p.parse_args())
