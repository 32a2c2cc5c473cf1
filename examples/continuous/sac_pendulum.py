"""SAC on device Pendulum (analogue of reference examples/mujoco/mujoco_sac.py,
using the built-in pure-JAX env; swap in any Env implementation)."""

import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))  # run without install


import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.modelfree.sac import SAC
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.env.classic.pendulum import Pendulum
from tianshou_tpu.env.core import VectorDeviceEnv
from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, ContinuousCritic
from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams

if __name__ == "__main__":
    env = Pendulum()
    algo = SAC(
        actor=ContinuousActorProbabilistic(hidden_sizes=(128, 128), action_dim=1, conditioned_sigma=True),
        critic=ContinuousCritic(hidden_sizes=(128, 128)),
        action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=3e-4),
        critic_optim=AdamOptimizerFactory(lr=3e-4),
        gamma=0.99, tau=0.005, alpha="auto",
    )
    key = jax.random.key(0)
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros(3))
    buffer = VectorReplayBuffer(total_size=50000, buffer_num=8)
    buf_state = buffer.init(Batch(
        obs=jnp.zeros(3), act=jnp.zeros(1), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(3),
    ))
    tc = DeviceCollector(VectorDeviceEnv(env, 8), algo, buffer)
    ec = DeviceCollector(VectorDeviceEnv(env, 10), algo, None)
    res = OffPolicyTrainer(algo, tc, ec, buffer, OffPolicyTrainerParams(
        max_epochs=10, epoch_num_steps=4000, batch_size=128,
        collection_step_num_env_steps=8, update_per_step=0.5,
        start_steps=2000, start_random=False, stop_fn=lambda r: r >= -250,
    )).run(ts, buf_state, key)
    print(f"best_reward={res.best_reward:.1f} alpha={float(jnp.exp(res.train_state.params['log_alpha'])):.3f}")
