"""Shared test scaffolding for end-to-end algorithm tests (the analogue of
the reference's test/discrete & test/continuous setup blocks)."""

import jax
import jax.numpy as jnp

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.env.core import Box, Discrete, VectorDeviceEnv


def transition_example(env):
    obs_dim = env.observation_space.shape
    if isinstance(env.action_space, Discrete):
        act = jnp.int32(0)
    else:
        act = jnp.zeros(env.action_space.shape)
    return Batch(
        obs=jnp.zeros(obs_dim),
        act=act,
        rew=jnp.float32(0),
        terminated=jnp.bool_(False),
        truncated=jnp.bool_(False),
        obs_next=jnp.zeros(obs_dim),
    )


def make_collectors(env, algo, buffer, n_train=10, n_test=10):
    train_envs = VectorDeviceEnv(env, n_train)
    test_envs = VectorDeviceEnv(env, n_test)
    return DeviceCollector(train_envs, algo, buffer), DeviceCollector(test_envs, algo, None)
