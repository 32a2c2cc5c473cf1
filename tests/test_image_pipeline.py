"""Atari-class pipeline without ALE: a synthetic image env drives the
NatureCNN DQN through uint8 frame storage, frame-stacked replay sampling and
the full training loop — the device analogue of the reference's Atari DQN
wiring (examples/atari/atari_dqn.py) with the heavy parts exercised end to
end."""

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import make_collectors
from tianshou_tpu.algorithm.modelfree.dqn import DQN
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.env.core import Box, Discrete, Env, EnvStep
from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams


class PixelState(NamedTuple):
    pos: jnp.ndarray
    t: jnp.ndarray


class PixelLine(Env):
    """MoveToRight rendered as a 16x16 uint8 image: the bright column is the
    position. Solvable from pixels; frames stored as uint8 (1 byte/pixel)."""

    size = 8
    max_episode_steps = 60

    def __init__(self) -> None:
        self.observation_space = Box(low=0, high=255, shape=(16, 16, 1))
        self.action_space = Discrete(2)

    def _obs(self, s: PixelState) -> jnp.ndarray:
        col = jnp.clip(s.pos * 2, 0, 15)
        img = (jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1) == col).astype(jnp.uint8) * 255
        return img[..., None]

    def reset(self, key):
        s = PixelState(jnp.int32(0), jnp.int32(0))
        return s, self._obs(s)

    def step(self, state, action, key):
        pos = jnp.clip(state.pos + jnp.where(action > 0, 1, -1), 0, self.size)
        t = state.t + 1
        terminated = pos >= self.size
        s = PixelState(pos, t)
        return EnvStep(
            state=s, obs=self._obs(s),
            reward=jnp.where(terminated, 1.0, 0.0).astype(jnp.float32),
            terminated=terminated,
            truncated=(t >= self.max_episode_steps) & ~terminated,
            info=Batch(),
        )


class SmallCNN(nn.Module):
    """Nature-style trunk scaled to 16x16 inputs; bf16 convs, uint8 in."""

    action_dim: int

    @nn.compact
    def __call__(self, x):
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.bfloat16) / 255.0
        else:
            x = x.astype(jnp.bfloat16)
        if x.ndim == 5:  # frame-stacked [B, L, H, W, C] -> channels
            x = jnp.moveaxis(x, 1, -1).reshape(x.shape[0], x.shape[2], x.shape[3], -1)
        x = nn.relu(nn.Conv(16, (4, 4), strides=(2, 2), dtype=jnp.bfloat16)(x))
        x = nn.relu(nn.Conv(32, (3, 3), strides=(2, 2), dtype=jnp.bfloat16)(x))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(128, dtype=jnp.bfloat16)(x))
        return nn.Dense(self.action_dim, dtype=jnp.float32)(x).astype(jnp.float32)


def test_pixel_dqn_with_frame_stacking():
    from tianshou_tpu.env.wrappers import FrameStack

    env = FrameStack(PixelLine(), 4)  # acting sees [4, 16, 16, 1] stacks
    algo = DQN(
        model=SmallCNN(action_dim=2),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.95, n_step_return_horizon=3, target_update_freq=200, eps_training=0.3,
    )
    key = jax.random.key(0)
    key, k1 = jax.random.split(key)
    # init with a stacked example [L, H, W, C]
    ts = algo.init(k1, jnp.zeros((4, 16, 16, 1), jnp.uint8))
    # frames stored ONCE (save_only_last_obs) and re-stacked at sample time
    buffer = VectorReplayBuffer(total_size=8000, buffer_num=8, stack_num=4, save_only_last_obs=True)
    example = Batch(
        obs=jnp.zeros((16, 16, 1), jnp.uint8), act=jnp.int32(0), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False),
        obs_next=jnp.zeros((16, 16, 1), jnp.uint8),
    )
    buf_state = buffer.init(example)
    assert buf_state.data.obs.dtype == jnp.uint8  # frames stay 1 byte in HBM
    tc, ec = make_collectors(env, algo, buffer, n_train=8, n_test=8)
    params = OffPolicyTrainerParams(
        max_epochs=6, epoch_num_steps=3000, test_step_num_episodes=8,
        batch_size=32, collection_step_num_env_steps=10, update_per_step=0.1,
        start_steps=500,
        stop_fn=lambda r: r >= 0.9,  # reliably reaches the right edge
        train_fn=lambda ep, step: {"eps_training": max(0.1, 0.3 * (1 - step / 10000))},
        verbose=False,
    )
    res = OffPolicyTrainer(algo, tc, ec, buffer, params).run(ts, buf_state, key)
    assert res.best_reward >= 0.9, f"best_reward {res.best_reward}"
