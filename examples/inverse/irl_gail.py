"""GAIL inverse RL on Pendulum — analogue of the reference's
examples/inverse/irl_gail.py: gather expert transitions with SAC, then train
PPO against a learned discriminator reward only."""

import sys as _sys
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))
_sys.path.insert(0, str(_P(__file__).resolve().parents[1] / "offline"))

import jax
import jax.numpy as jnp
import numpy as np

from _gather import gather_pendulum

from tianshou_tpu.algorithm.imitation.gail import GAIL
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.env.core import VectorDeviceEnv
from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, ContinuousCritic
from tianshou_tpu.models.discrete import DiscreteCritic
from tianshou_tpu.trainer.trainer import OnPolicyTrainer, OnPolicyTrainerParams

if __name__ == "__main__":
    key = jax.random.key(0)
    env, data, dstate, _, _ = gather_pendulum(key)
    n = int(np.sum(np.asarray(dstate.size)))
    flat = jax.tree.map(lambda x: x.reshape(-1, *x.shape[2:]), dstate.data)
    expert_obs, expert_act = flat.obs[:n], flat.act[:n]

    algo = GAIL(
        actor=ContinuousActorProbabilistic(hidden_sizes=(64, 64), action_dim=1),
        critic=DiscreteCritic(hidden_sizes=(64, 64)),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=3e-4, max_grad_norm=0.5),
        disc_net=ContinuousCritic(hidden_sizes=(64, 64)),
        expert_obs=expert_obs, expert_act=expert_act,
        disc_optim=AdamOptimizerFactory(lr=1e-3), disc_update_num=2,
        gamma=0.95, gae_lambda=0.95, eps_clip=0.2, deterministic_eval=True,
    )
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros(3))
    tc = DeviceCollector(VectorDeviceEnv(env, 16), algo, None)
    ec = DeviceCollector(VectorDeviceEnv(env, 10), algo, None)
    res = OnPolicyTrainer(algo, tc, ec, OnPolicyTrainerParams(
        max_epochs=15, epoch_num_steps=10000, test_step_num_episodes=10,
        batch_size=128, collection_step_num_env_steps=64,
        update_step_num_repetitions=2, stop_fn=lambda r: r >= -300,
    )).run(ts, key)
    print(f"GAIL: best_reward={res.best_reward:.1f}")
