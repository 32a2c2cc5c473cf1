"""C51 on ViZDoom — rebuild of the reference's examples/vizdoom/vizdoom_c51.py
(51 atoms on [-10, 10], n-step 3, target sync 500, eps 1 -> 0.05). With the
vizdoom package present this trains on the real scenario through the host
path; otherwise on the synthetic device stand-in with the same pixel
contract (see env.py).

Run: python examples/vizdoom/vizdoom_c51.py --task D1_basic
"""

from env import RES, STACK, make_vizdoom_env

import argparse

import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.modelfree.c51 import C51
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.models.atari import C51Net


def train(task: str = "D1_basic", seed: int = 0, epochs: int = 20,
          epoch_num_steps: int = 20_000, num_envs: int = 16,
          buffer_size: int = 100_000, batch_size: int = 64,
          lr: float = 1e-4, logger=None):
    env, train_envs, test_envs = make_vizdoom_env(task, num_training_envs=num_envs)
    algo = C51(
        model=C51Net(action_dim=env.action_space.n, num_atoms=51),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=lr),
        num_atoms=51, v_min=-10.0, v_max=10.0,
        gamma=0.99, n_step_return_horizon=3, target_update_freq=500,
        eps_training=1.0, eps_inference=0.005,
    )
    key = jax.random.key(seed)
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros((STACK, *RES), jnp.uint8))
    buffer = VectorReplayBuffer(
        total_size=buffer_size, buffer_num=num_envs,
        stack_num=STACK, save_only_last_obs=True,
    )
    buf_state = buffer.init(Batch(
        obs=jnp.zeros(RES, jnp.uint8), act=jnp.int32(0), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False),
        obs_next=jnp.zeros(RES, jnp.uint8),
    ))
    from tianshou_tpu.data.collector import DeviceCollector
    from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams

    tc = DeviceCollector(train_envs, algo, buffer)
    ec = DeviceCollector(test_envs, algo, None)
    params = OffPolicyTrainerParams(
        max_epochs=epochs, epoch_num_steps=epoch_num_steps,
        test_step_num_episodes=8, batch_size=batch_size,
        collection_step_num_env_steps=10, update_per_step=0.1,
        start_steps=2_000,
        train_fn=lambda ep, step: {"eps_training": max(0.05, 1.0 - step / 100_000)},
        verbose=True, seed=seed, logger=logger,
    )
    res = OffPolicyTrainer(algo, tc, ec, buffer, params).run(ts, buf_state, key)
    print(f"vizdoom C51 {task}: best_reward={res.best_reward:.2f} env_steps={res.env_step}")
    return res


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="D1_basic",
                   choices=["D1_basic", "D2_navigation", "D3_battle", "D4_battle2"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--epoch-num-steps", type=int, default=20_000)
    p.add_argument("--lr", type=float, default=1e-4)
    args = p.parse_args()
    train(task=args.task, seed=args.seed, epochs=args.epochs,
          epoch_num_steps=args.epoch_num_steps, lr=args.lr)
