"""DDPG + HER on the sparse GoalReach env (analogue of reference
examples/mujoco/fetch_her_ddpg.py). Without HER this task is unlearnable;
with HER it solves in a few epochs."""

import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))  # run without install


import flax.linen as nn
import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.modelfree.ddpg import DDPG
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.her import HERVectorReplayBuffer
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.env.classic.goal_reach import GoalReach
from tianshou_tpu.env.core import VectorDeviceEnv
from tianshou_tpu.exploration.noise import GaussianNoise
from tianshou_tpu.models.mlp import MLP


class GoalActor(nn.Module):
    @nn.compact
    def __call__(self, obs):
        x = jnp.concatenate([obs.observation, obs.desired_goal], axis=-1)
        return nn.tanh(MLP((128, 128), 2)(x))


class GoalCritic(nn.Module):
    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs.observation, obs.desired_goal, act], axis=-1)
        return MLP((128, 128), 1)(x)[:, 0]


if __name__ == "__main__":
    from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams

    env = GoalReach(size=1.0, step_size=0.05, eps=0.05, max_episode_steps=60)
    algo = DDPG(
        actor=GoalActor(), critic=GoalCritic(), action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=1e-3), critic_optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.98, tau=0.005, exploration_noise=GaussianNoise(sigma=0.3), action_scaling=False,
    )
    key = jax.random.key(0)
    key, k = jax.random.split(key)
    obs0 = Batch(observation=jnp.zeros(2), achieved_goal=jnp.zeros(2), desired_goal=jnp.zeros(2))
    ts = algo.init(k, obs0)
    buffer = HERVectorReplayBuffer(
        total_size=50000, buffer_num=8, compute_reward_fn=env.compute_reward,
        horizon=60, future_k=8.0,
    )
    buf_state = buffer.init(Batch(obs=obs0, act=jnp.zeros(2), rew=jnp.float32(-1),
                                  terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=obs0))
    tc = DeviceCollector(VectorDeviceEnv(env, 8), algo, buffer)
    ec = DeviceCollector(VectorDeviceEnv(env, 10), algo, None)
    res = OffPolicyTrainer(algo, tc, ec, buffer, OffPolicyTrainerParams(
        max_epochs=8, epoch_num_steps=4000, batch_size=128, test_step_num_episodes=20,
        collection_step_num_env_steps=8, update_per_step=0.25,
        start_steps=2000, start_random=False,
    )).run(ts, buf_state, key)
    print(f"best_reward={res.best_reward:.1f} (random ~ -55, solved ~ -9)")
