"""PPO on ViZDoom pixels — rebuild of the reference's
examples/vizdoom/vizdoom_ppo.py (shared NatureCNN torso, actor/critic heads,
clip 0.2, GAE 0.95). Real scenario via the host path when vizdoom is
installed; synthetic device stand-in otherwise (env.py).

Run: python examples/vizdoom/vizdoom_ppo.py --task D1_basic
"""

from env import RES, STACK, make_vizdoom_env

import argparse

import flax.linen as nn
import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.modelfree.ppo import PPO
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.models.atari import NatureCNN


class PixelActor(nn.Module):
    action_dim: int

    @nn.compact
    def __call__(self, obs):
        return nn.Dense(self.action_dim)(NatureCNN(512)(obs))


class PixelCritic(nn.Module):
    @nn.compact
    def __call__(self, obs):
        return NatureCNN(512)(obs) @ self.param(
            "w", nn.initializers.lecun_normal(), (512, 1)
        )


def train(task: str = "D1_basic", seed: int = 0, epochs: int = 20,
          epoch_num_steps: int = 20_000, num_envs: int = 16,
          batch_size: int = 256, lr: float = 2.5e-4, logger=None):
    env, train_envs, test_envs = make_vizdoom_env(task, num_training_envs=num_envs)
    algo = PPO(
        actor=PixelActor(action_dim=env.action_space.n),
        critic=PixelCritic(),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=lr, max_grad_norm=0.5),
        gamma=0.99, gae_lambda=0.95, eps_clip=0.2, vf_coef=0.5, ent_coef=0.01,
    )
    key = jax.random.key(seed)
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros((STACK, *RES), jnp.uint8))
    from tianshou_tpu.data.collector import DeviceCollector
    from tianshou_tpu.trainer.trainer import OnPolicyTrainer, OnPolicyTrainerParams

    tc = DeviceCollector(train_envs, algo, None)
    ec = DeviceCollector(test_envs, algo, None)
    params = OnPolicyTrainerParams(
        max_epochs=epochs, epoch_num_steps=epoch_num_steps,
        test_step_num_episodes=8, batch_size=batch_size,
        collection_step_num_env_steps=128, update_step_num_repetitions=4,
        verbose=True, seed=seed, logger=logger,
    )
    res = OnPolicyTrainer(algo, tc, ec, params).run(ts, key)
    print(f"vizdoom PPO {task}: best_reward={res.best_reward:.2f} env_steps={res.env_step}")
    return res


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="D1_basic",
                   choices=["D1_basic", "D2_navigation", "D3_battle", "D4_battle2"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--epoch-num-steps", type=int, default=20_000)
    p.add_argument("--lr", type=float, default=2.5e-4)
    args = p.parse_args()
    train(task=args.task, seed=args.seed, epochs=args.epochs,
          epoch_num_steps=args.epoch_num_steps, lr=args.lr)
