"""Offline discrete CRR on CartPole — analogue of the reference's
examples/offline/atari_crr.py on the gathered-CartPole dataset (ALE absent)."""

from _gather import gather_cartpole

import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.imitation.discrete_crr import DiscreteCRR
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.env.core import VectorDeviceEnv
from tianshou_tpu.models.discrete import DiscreteActor, DiscreteCritic
from tianshou_tpu.trainer.trainer import OfflineTrainer, OfflineTrainerParams

if __name__ == "__main__":
    key = jax.random.key(0)
    env, data, dstate, _, _ = gather_cartpole(key)
    algo = DiscreteCRR(
        actor=DiscreteActor(hidden_sizes=(64, 64), action_dim=2),
        critic=DiscreteCritic(hidden_sizes=(64, 64), last_size=2),
        action_space=env.action_space, optim=AdamOptimizerFactory(lr=3e-4),
        gamma=0.97, target_update_freq=320,
    )
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros(4))
    ec = DeviceCollector(VectorDeviceEnv(env, 10), algo, None)
    res = OfflineTrainer(algo, data, ec, OfflineTrainerParams(
        max_epochs=8, update_step_num_gradient_steps_per_epoch=500, batch_size=64,
    )).run(ts, dstate, key)
    print(f"offline discrete CRR: best_reward={res.best_reward:.1f}")
