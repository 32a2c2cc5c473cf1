"""Shared driver for the Atari example family (the analogues of the
reference's examples/atari/atari_*.py scripts).

With ``ale-py`` installed the scripts train on the real Atari games through
the host path (DeepMind wrapper stack in ``tianshou_tpu.env.atari``). In
this image ALE is absent, so the fallback is ``SyntheticAtari`` — an
84x84-pixel device env that is genuinely solvable from pixels — and the
FULL pixel pipeline (uint8 frames in HBM, save_only_last_obs + stack_num=4
re-stacking at sample time, fused collect+update scans) trains end-to-end
on the accelerator. Either way every script runs the real thing, just on a
different game.
"""

import sys as _sys
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import argparse
from typing import NamedTuple

import flax.linen as _nn
import jax
import jax.numpy as jnp

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.env.core import Box, Discrete, Env, EnvStep, VectorDeviceEnv
from tianshou_tpu.env.wrappers import FrameStack

FRAME = (84, 84, 1)
STACK = 4


class _SynthState(NamedTuple):
    pos: jnp.ndarray   # paddle column [0, 20]
    ball: jnp.ndarray  # ball column [0, 20]
    drop: jnp.ndarray  # steps since this ball appeared (renders its row)
    t: jnp.ndarray     # episode step counter (drives truncation)


class SyntheticAtari(Env):
    """Catch-style game rendered at 84x84 uint8: move the paddle (3 actions:
    stay/left/right) under the falling ball's column; +1 when aligned at the
    catch step. Solvable from pixels, episode length 200."""

    cols = 21
    max_episode_steps = 200

    def __init__(self) -> None:
        self.observation_space = Box(low=0, high=255, shape=FRAME, dtype=jnp.uint8)
        self.action_space = Discrete(3)

    def _obs(self, s: _SynthState) -> jnp.ndarray:
        cell = 84 // self.cols  # 4 px per column
        col_idx = jax.lax.broadcasted_iota(jnp.int32, (84, 84), 1) // cell
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (84, 84), 0)
        ball_row = (s.drop * 80 // 40).astype(jnp.int32)  # falls over 40 steps
        ball = (col_idx == s.ball) & (row_idx // cell == ball_row // cell)
        paddle = (col_idx == s.pos) & (row_idx >= 80)
        return ((ball | paddle).astype(jnp.uint8) * 255)[..., None]

    def reset(self, key):
        kb, kp = jax.random.split(key)
        s = _SynthState(
            pos=jax.random.randint(kp, (), 0, self.cols),
            ball=jax.random.randint(kb, (), 0, self.cols),
            drop=jnp.int32(0),
            t=jnp.int32(0),
        )
        return s, self._obs(s)

    def step(self, state, action, key):
        move = jnp.where(action == 1, -1, jnp.where(action == 2, 1, 0))
        pos = jnp.clip(state.pos + move, 0, self.cols - 1)
        drop = state.drop + 1
        catch = drop >= 40  # ball lands every 40 steps, then re-drops
        aligned = pos == state.ball
        rew = jnp.where(catch, jnp.where(aligned, 1.0, -0.2), 0.0).astype(jnp.float32)
        new_ball = jnp.where(catch, jax.random.randint(key, (), 0, self.cols), state.ball)
        drop = jnp.where(catch, jnp.int32(0), drop)
        t = state.t + 1
        s = _SynthState(pos, new_ball, drop, t)
        return EnvStep(
            state=s, obs=self._obs(s), reward=rew,
            terminated=jnp.bool_(False),  # fixed horizon: truncation only
            truncated=t >= self.max_episode_steps,
            info=Batch(),
        )


def parse_args(**overrides):
    p = argparse.ArgumentParser()
    p.add_argument("--task", default=overrides.get("task", "PongNoFrameskip-v4"))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=overrides.get("lr", 1e-4))
    p.add_argument("--epochs", type=int, default=overrides.get("epochs", 20))
    p.add_argument("--epoch-num-steps", type=int, default=overrides.get("epoch_num_steps", 20_000))
    p.add_argument("--num-envs", type=int, default=overrides.get("num_envs", 16))
    p.add_argument("--buffer-size", type=int, default=overrides.get("buffer_size", 100_000))
    p.add_argument("--batch-size", type=int, default=overrides.get("batch_size", 32))
    p.add_argument("--start-steps", type=int, default=overrides.get("start_steps", 2_000))
    return p.parse_args()


def n_actions(args) -> int:
    """Action count for the task (real ALE) or the synthetic fallback."""
    try:
        from tianshou_tpu.env.atari import make_atari_env

        probe = make_atari_env(args.task)
        n = probe.action_space.n
        if hasattr(probe, "close"):
            probe.close()
        return int(n)
    except ImportError:
        return 3


def run_offpolicy(args, algo, stop_reward: float = 4.0):
    """Train an off-policy pixel algorithm; host path on real ALE, device
    path on the synthetic game (mirrors reference atari_dqn.py wiring:
    n-step 3, eps decay 1 -> 0.05, frames stored once, stacked on sample)."""
    try:
        from tianshou_tpu.env.atari import make_atari_env  # noqa: F401 — probe

        make_atari_env(args.task)
        return _run_offpolicy_host(args, algo)
    except ImportError:
        return _run_offpolicy_device(args, algo, stop_reward)


def _run_offpolicy_device(args, algo, stop_reward: float):
    from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams

    env = FrameStack(SyntheticAtari(), STACK)
    key = jax.random.key(args.seed)
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros((STACK, *FRAME), jnp.uint8))
    buffer = VectorReplayBuffer(
        total_size=args.buffer_size, buffer_num=args.num_envs,
        stack_num=STACK, save_only_last_obs=True,
    )
    buf_state = buffer.init(Batch(
        obs=jnp.zeros(FRAME, jnp.uint8), act=jnp.int32(0), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False),
        obs_next=jnp.zeros(FRAME, jnp.uint8),
    ))
    tc = DeviceCollector(VectorDeviceEnv(env, args.num_envs), algo, buffer)
    ec = DeviceCollector(VectorDeviceEnv(env, 8), algo, None)
    params = OffPolicyTrainerParams(
        max_epochs=args.epochs, epoch_num_steps=args.epoch_num_steps,
        test_step_num_episodes=8, batch_size=args.batch_size,
        collection_step_num_env_steps=10, update_per_step=0.1,
        start_steps=args.start_steps,
        stop_fn=lambda r: r >= stop_reward,
        train_fn=lambda ep, step: {"eps_training": max(0.05, 1.0 - step / 100_000)},
        verbose=True, seed=args.seed,
    )
    res = OffPolicyTrainer(algo, tc, ec, buffer, params).run(ts, buf_state, key)
    print(f"best_reward={res.best_reward:.2f} env_steps={res.env_step}")
    return res


def _run_offpolicy_host(args, algo):
    from tianshou_tpu.data.host_collector import HostCollector
    from tianshou_tpu.env.atari import make_atari_env
    from tianshou_tpu.env.venvs import DummyVectorEnv
    from tianshou_tpu.trainer.trainer import HostOffPolicyTrainer, OffPolicyTrainerParams

    factory = lambda: make_atari_env(args.task)  # noqa: E731
    key = jax.random.key(args.seed)
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros((STACK, 84, 84), jnp.uint8))
    buffer = VectorReplayBuffer(
        total_size=args.buffer_size, buffer_num=args.num_envs,
        stack_num=STACK, save_only_last_obs=True, ignore_obs_next=True,
    )
    buf_state = buffer.init(Batch(
        obs=jnp.zeros((STACK, 84, 84), jnp.uint8), act=jnp.int32(0), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False),
        obs_next=jnp.zeros((STACK, 84, 84), jnp.uint8),
    ))
    tc = HostCollector(DummyVectorEnv([factory for _ in range(args.num_envs)]), algo, buffer)
    ec = HostCollector(DummyVectorEnv([factory for _ in range(10)]), algo, None)
    params = OffPolicyTrainerParams(
        max_epochs=args.epochs, epoch_num_steps=100_000, test_step_num_episodes=10,
        batch_size=args.batch_size, collection_step_num_env_steps=10, update_per_step=0.1,
        start_steps=max(args.start_steps, 50_000),
        train_fn=lambda ep, step: {"eps_training": max(0.05, 1.0 - step / 1_000_000)},
        verbose=True, seed=args.seed,
    )
    res = HostOffPolicyTrainer(algo, tc, ec, buffer, params).run(ts, buf_state, key)
    print(f"best_reward={res.best_reward:.1f} env_steps={res.env_step}")
    return res


def run_onpolicy(args, algo, stop_reward: float = 4.0):
    """Train an on-policy pixel algorithm on the device path (reference
    atari_ppo.py). Host-ALE variant omitted until ALE is present."""
    from tianshou_tpu.trainer.trainer import OnPolicyTrainer, OnPolicyTrainerParams

    env = FrameStack(SyntheticAtari(), STACK)
    key = jax.random.key(args.seed)
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros((STACK, *FRAME), jnp.uint8))
    tc = DeviceCollector(VectorDeviceEnv(env, args.num_envs), algo, None)
    ec = DeviceCollector(VectorDeviceEnv(env, 8), algo, None)
    params = OnPolicyTrainerParams(
        max_epochs=args.epochs, epoch_num_steps=args.epoch_num_steps,
        test_step_num_episodes=8, batch_size=args.batch_size,
        collection_step_num_env_steps=128, update_step_num_repetitions=4,
        stop_fn=lambda r: r >= stop_reward,
        verbose=True, seed=args.seed,
    )
    res = OnPolicyTrainer(algo, tc, ec, params).run(ts, key)
    print(f"best_reward={res.best_reward:.2f} env_steps={res.env_step}")
    return res


class PixelCritic(_nn.Module):
    """NatureCNN -> scalar value [B] (actor-critic pixel head)."""

    features: int = 512

    @_nn.compact
    def __call__(self, x):
        from tianshou_tpu.models.atari import NatureCNN

        return _nn.Dense(1)(NatureCNN(self.features)(x))[:, 0]
