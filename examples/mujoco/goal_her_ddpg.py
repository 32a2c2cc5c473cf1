"""DDPG + Hindsight Experience Replay on a sparse goal-reaching task —
TPU rebuild of the reference ``examples/mujoco/fetch_her_ddpg.py``.

The reference drives gymnasium-robotics FetchReach (reward -1 until the
goal is hit; HER row -17.6 vs -49.9 without HER,
/root/reference/examples/mujoco/README.md:410). That dependency is not in
this image, so the example runs the device ``GoalReach`` env — the same
sparse goal-conditioned structure ({observation, achieved_goal,
desired_goal} obs, -1/0 reward) as a vmapped pure-function env, with the
HER relabelling running inside the jitted sample path
(data/buffer/her.py: relabel-on-sample, no host round-trip).

    python examples/mujoco/goal_her_ddpg.py            # with HER
    python examples/mujoco/goal_her_ddpg.py --no-her   # ablation
"""

import sys as _sys
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import argparse
import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class GoalActor(nn.Module):
    hidden: tuple = (256, 256)

    @nn.compact
    def __call__(self, obs):
        x = jnp.concatenate([obs.observation, obs.desired_goal], axis=-1)
        from tianshou_tpu.models.mlp import MLP

        return nn.tanh(MLP(self.hidden, 2)(x))


class GoalCritic(nn.Module):
    hidden: tuple = (256, 256)

    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs.observation, obs.desired_goal, act], axis=-1)
        from tianshou_tpu.models.mlp import MLP

        return MLP(self.hidden, 1)(x)[:, 0]


def train(seed: int = 0, epochs: int = 10, epoch_num_steps: int = 4000,
          num_envs: int = 8, batch_size: int = 128, use_her: bool = True,
          verbose: bool = True):
    from tianshou_tpu.algorithm.modelfree.ddpg import DDPG
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
    from tianshou_tpu.data.batch import Batch
    from tianshou_tpu.data.buffer.base import VectorReplayBuffer
    from tianshou_tpu.data.buffer.her import HERVectorReplayBuffer
    from tianshou_tpu.data.collector import DeviceCollector
    from tianshou_tpu.env.classic.goal_reach import GoalReach
    from tianshou_tpu.env.core import VectorDeviceEnv
    from tianshou_tpu.exploration.noise import GaussianNoise
    from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams

    env = GoalReach(size=1.0, step_size=0.05, eps=0.05, max_episode_steps=60)
    algo = DDPG(
        actor=GoalActor(), critic=GoalCritic(),
        action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=1e-3),
        critic_optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.98, tau=0.005,
        exploration_noise=GaussianNoise(sigma=0.3),
        action_scaling=False,
    )
    key = jax.random.key(seed)
    key, k1 = jax.random.split(key)
    example = Batch(
        obs=Batch(observation=jnp.zeros(2), achieved_goal=jnp.zeros(2), desired_goal=jnp.zeros(2)),
        act=jnp.zeros(2), rew=jnp.float32(-1.0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False),
        obs_next=Batch(observation=jnp.zeros(2), achieved_goal=jnp.zeros(2), desired_goal=jnp.zeros(2)),
    )
    ts = algo.init(k1, example.obs)
    if use_her:
        buffer = HERVectorReplayBuffer(
            total_size=50_000, buffer_num=num_envs,
            compute_reward_fn=env.compute_reward, horizon=60, future_k=8.0,
        )
    else:
        buffer = VectorReplayBuffer(total_size=50_000, buffer_num=num_envs)
    buf_state = buffer.init(example)
    tc = DeviceCollector(VectorDeviceEnv(env, num_envs), algo, buffer)
    ec = DeviceCollector(VectorDeviceEnv(env, 20), algo, None)
    params = OffPolicyTrainerParams(
        max_epochs=epochs, epoch_num_steps=epoch_num_steps,
        test_step_num_episodes=20, batch_size=batch_size,
        collection_step_num_env_steps=num_envs, update_per_step=0.25,
        start_steps=2000, start_random=False, verbose=verbose, seed=seed,
    )
    t0 = time.time()
    result = OffPolicyTrainer(algo, tc, ec, buffer, params).run(ts, buf_state, key)
    if verbose:
        print(f"her={use_her} best_reward={result.best_reward:.1f} "
              f"({result.env_step / max(time.time() - t0, 1e-9):,.0f} steps/s)")
    return result


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--no-her", action="store_true")
    args = p.parse_args()
    train(seed=args.seed, epochs=args.epochs, use_her=not args.no_her)
