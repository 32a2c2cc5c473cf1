"""Offline behavior cloning on Pendulum — analogue of the reference's
examples/offline/d4rl_il.py."""

from _gather import gather_pendulum

import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.imitation.bc import ImitationLearning
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.env.core import VectorDeviceEnv
from tianshou_tpu.models.continuous import ContinuousActorDeterministic
from tianshou_tpu.trainer.trainer import OfflineTrainer, OfflineTrainerParams

if __name__ == "__main__":
    key = jax.random.key(0)
    env, data, dstate, _, _ = gather_pendulum(key)
    algo = ImitationLearning(
        model=ContinuousActorDeterministic(hidden_sizes=(64, 64), action_dim=1, max_action=2.0),
        action_space=env.action_space, optim=AdamOptimizerFactory(lr=1e-3),
        action_bound_method=None,
    )
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros(3))
    ec = DeviceCollector(VectorDeviceEnv(env, 10), algo, None)
    res = OfflineTrainer(algo, data, ec, OfflineTrainerParams(
        max_epochs=8, update_step_num_gradient_steps_per_epoch=500, batch_size=128,
    )).run(ts, dstate, key)
    print(f"offline BC: best_reward={res.best_reward:.1f}")
