"""Offline TD3+BC on Pendulum — analogue of the reference's
examples/offline/d4rl_td3_bc.py with a gathered dataset instead of d4rl."""

from _gather import gather_pendulum

import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.imitation.td3_bc import TD3BC
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.env.core import VectorDeviceEnv
from tianshou_tpu.models.continuous import ContinuousActorDeterministic, ContinuousCritic
from tianshou_tpu.trainer.trainer import OfflineTrainer, OfflineTrainerParams

if __name__ == "__main__":
    key = jax.random.key(0)
    env, data, dstate, _, _ = gather_pendulum(key)
    algo = TD3BC(
        actor=ContinuousActorDeterministic(hidden_sizes=(128, 128), action_dim=1),
        critic=ContinuousCritic(hidden_sizes=(128, 128)),
        action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=3e-4),
        critic_optim=AdamOptimizerFactory(lr=3e-4),
        gamma=0.99, tau=0.005, alpha=2.5,
    )
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros(3))
    ec = DeviceCollector(VectorDeviceEnv(env, 10), algo, None)
    res = OfflineTrainer(algo, data, ec, OfflineTrainerParams(
        max_epochs=10, update_step_num_gradient_steps_per_epoch=500, batch_size=128,
    )).run(ts, dstate, key)
    print(f"offline TD3+BC: best_reward={res.best_reward:.1f}")
