"""DQN on Atari through the host path (reference examples/atari/atari_dqn.py:
NatureCNN, 84x84x4 uint8 frames, eps 1->0.05 over 1M, target sync 500,
n-step 3). Requires ale-py; without it, falls back to the synthetic pixel
env so the full CNN pipeline still runs (the device-side synthetic pixel
benchmark lives in bench.py).

    python examples/atari/atari_dqn.py --task PongNoFrameskip-v4
"""

import sys as _sys
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.algorithm.modelfree.dqn import DQN
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.data.host_collector import HostCollector
from tianshou_tpu.env.core import Discrete
from tianshou_tpu.env.venvs import DummyVectorEnv
from tianshou_tpu.models.atari import DQNet
from tianshou_tpu.trainer.trainer import HostOffPolicyTrainer, OffPolicyTrainerParams


def make_env_factory(task: str):
    try:
        from tianshou_tpu.env.atari import make_atari_env

        probe = make_atari_env(task)
        n_act = probe.action_space.n
        probe.close() if hasattr(probe, "close") else None
        return (lambda: make_atari_env(task)), n_act, True
    except ImportError as e:
        print(f"[atari_dqn] {e}\n[atari_dqn] falling back to the synthetic device pixel env")
        return None, 4, False


def main(args):
    factory, n_act, real = make_env_factory(args.task)
    if not real:
        import runpy

        print("[atari_dqn] running bench.py atari_cnn (synthetic pixels) instead")
        runpy.run_path(str(_P(__file__).resolve().parents[2] / "bench.py"), run_name="__main__")
        return
    algo = DQN(
        model=DQNet(action_dim=n_act),
        action_space=Discrete(n_act),
        optim=AdamOptimizerFactory(lr=args.lr),
        gamma=0.99, n_step_return_horizon=3, target_update_freq=500,
        eps_training=1.0, eps_inference=0.005,
    )
    key = jax.random.key(args.seed)
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros((4, 84, 84), jnp.uint8))
    buffer = VectorReplayBuffer(
        total_size=args.buffer_size, buffer_num=args.num_envs,
        stack_num=4, save_only_last_obs=True, ignore_obs_next=True,
    )
    buf_state = buffer.init(Batch(
        obs=jnp.zeros((4, 84, 84), jnp.uint8), act=jnp.int32(0), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False),
        obs_next=jnp.zeros((4, 84, 84), jnp.uint8),
    ))
    tc = HostCollector(DummyVectorEnv([factory for _ in range(args.num_envs)]), algo, buffer)
    ec = HostCollector(DummyVectorEnv([factory for _ in range(10)]), algo, None)
    params = OffPolicyTrainerParams(
        max_epochs=args.epochs, epoch_num_steps=100_000, test_step_num_episodes=10,
        batch_size=32, collection_step_num_env_steps=10, update_per_step=0.1,
        start_steps=50_000,
        train_fn=lambda ep, step: {"eps_training": max(0.05, 1.0 - step / 1_000_000)},
        verbose=True, seed=args.seed,
    )
    res = HostOffPolicyTrainer(algo, tc, ec, buffer, params).run(ts, buf_state, key)
    print(f"best_reward={res.best_reward:.1f} env_steps={res.env_step}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="PongNoFrameskip-v4")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--num-envs", type=int, default=10)
    p.add_argument("--buffer-size", type=int, default=100_000)
    main(p.parse_args())
