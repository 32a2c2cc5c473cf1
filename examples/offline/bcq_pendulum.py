"""Offline BCQ on Pendulum — analogue of the reference's
examples/offline/d4rl_bcq.py (VAE behavior model + perturbation actor)."""

from _gather import gather_pendulum

import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.imitation.bcq import BCQ
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.env.core import VectorDeviceEnv
from tianshou_tpu.models.continuous import ContinuousCritic, Perturbation, VAE
from tianshou_tpu.trainer.trainer import OfflineTrainer, OfflineTrainerParams

if __name__ == "__main__":
    key = jax.random.key(0)
    env, data, dstate, _, _ = gather_pendulum(key)
    algo = BCQ(
        actor_perturbation=Perturbation(hidden_sizes=(64, 64), action_dim=1, max_action=1.0, phi=0.05),
        critic=ContinuousCritic(hidden_sizes=(64, 64)),
        vae=VAE(encoder_hidden=(64,), decoder_hidden=(64,), action_dim=1, latent_dim=2, max_action=1.0),
        action_space=env.action_space,
        actor_optim=AdamOptimizerFactory(lr=1e-3),
        critic_optim=AdamOptimizerFactory(lr=1e-3),
        vae_optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.99, tau=0.005, forward_sampled_times=20, num_sampled_action=10,
    )
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros(3))
    ec = DeviceCollector(VectorDeviceEnv(env, 10), algo, None)
    res = OfflineTrainer(algo, data, ec, OfflineTrainerParams(
        max_epochs=10, update_step_num_gradient_steps_per_epoch=500, batch_size=128,
    )).run(ts, dstate, key)
    print(f"offline BCQ: best_reward={res.best_reward:.1f}")
