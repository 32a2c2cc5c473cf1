"""Offline CQL on Pendulum: gather a dataset with SAC, then learn from the
fixed buffer only (analogue of reference examples/offline/d4rl_cql.py with
the data-gathering step of test/offline/gather_pendulum_data.py)."""

import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))  # run without install


import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.imitation.cql import CQL
from tianshou_tpu.algorithm.modelfree.sac import SAC
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.env.classic.pendulum import Pendulum
from tianshou_tpu.env.core import VectorDeviceEnv
from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, ContinuousCritic
from tianshou_tpu.trainer.trainer import (
    OfflineTrainer, OfflineTrainerParams, OffPolicyTrainer, OffPolicyTrainerParams,
)

if __name__ == "__main__":
    env = Pendulum()
    example = Batch(obs=jnp.zeros(3), act=jnp.zeros(1), rew=jnp.float32(0),
                    terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(3))

    # 1. train a behavior policy online and gather a dataset
    sac = SAC(
        actor=ContinuousActorProbabilistic(hidden_sizes=(128, 128), action_dim=1, conditioned_sigma=True),
        critic=ContinuousCritic(hidden_sizes=(128, 128)), action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=3e-4), critic_optim=AdamOptimizerFactory(lr=3e-4),
    )
    key = jax.random.key(0)
    key, k = jax.random.split(key)
    ts = sac.init(k, jnp.zeros(3))
    rb = VectorReplayBuffer(total_size=50000, buffer_num=8)
    rb_state = rb.init(example)
    tc = DeviceCollector(VectorDeviceEnv(env, 8), sac, rb)
    ec = DeviceCollector(VectorDeviceEnv(env, 10), sac, None)
    res = OffPolicyTrainer(sac, tc, ec, rb, OffPolicyTrainerParams(
        max_epochs=10, epoch_num_steps=4000, batch_size=128, collection_step_num_env_steps=8,
        update_per_step=0.5, start_steps=2000, start_random=False, stop_fn=lambda r: r >= -250,
    )).run(ts, rb_state, key)
    print(f"behavior policy: {res.best_reward:.1f}")

    data = VectorReplayBuffer(total_size=20000, buffer_num=8)
    dstate = data.init(example)
    dc = DeviceCollector(VectorDeviceEnv(env, 8), sac, data)
    key, kc, kr = jax.random.split(key, 3)
    dc_state = dc.reset(kr)
    dc_state, dstate, _ = dc.collect(res.train_state, dc_state, dstate, kc, 2500)

    # 2. offline CQL from the fixed dataset
    cql = CQL(
        actor=ContinuousActorProbabilistic(hidden_sizes=(128, 128), action_dim=1, conditioned_sigma=True),
        critic=ContinuousCritic(hidden_sizes=(128, 128)), action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=3e-4), critic_optim=AdamOptimizerFactory(lr=3e-4),
        cql_weight=1.0, with_lagrange=True,
    )
    key, k2 = jax.random.split(key)
    cts = cql.init(k2, jnp.zeros(3))
    cec = DeviceCollector(VectorDeviceEnv(env, 10), cql, None)
    out = OfflineTrainer(cql, data, cec, OfflineTrainerParams(
        max_epochs=10, update_step_num_gradient_steps_per_epoch=500, batch_size=128,
    )).run(cts, dstate, key)
    print(f"offline CQL: {out.best_reward:.1f}")
