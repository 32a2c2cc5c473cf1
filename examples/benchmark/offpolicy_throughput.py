"""Off-policy throughput: DQN collect+update env-steps/sec, fused megastep
(one jitted program per chunk) vs separate collect/update dispatches."""

import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))  # run without install

import time

import jax
import jax.numpy as jnp

from tianshou_tpu import Batch, VectorReplayBuffer
from tianshou_tpu.algorithm.modelfree.dqn import DQN
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.env.classic.cartpole import CartPole
from tianshou_tpu.env.core import VectorDeviceEnv
from tianshou_tpu.models.mlp import Net
from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams

if __name__ == "__main__":
    E, T = 1024, 32
    env = CartPole()
    algo = DQN(
        model=Net(hidden_sizes=(128, 128), output_dim=2),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.97, n_step_return_horizon=3, target_update_freq=500, eps_training=0.1,
    )
    key = jax.random.key(0)
    key, k1 = jax.random.split(key)
    buffer = VectorReplayBuffer(total_size=E * 256, buffer_num=E)
    example = Batch(obs=jnp.zeros(4), act=jnp.int32(0), rew=jnp.float32(0),
                    terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(4))

    for fused in (False, True):
        ts = algo.init(k1, jnp.zeros(4))
        buf_state = buffer.init(example)
        coll = DeviceCollector(VectorDeviceEnv(env, E), algo, buffer)

        trainer = OffPolicyTrainer(
            algo, coll, DeviceCollector(VectorDeviceEnv(env, 8), algo, None), buffer,
            OffPolicyTrainerParams(
                max_epochs=1, epoch_num_steps=T * E * 40, test_step_num_episodes=1,
                batch_size=1024, collection_step_num_env_steps=T, update_per_step=0.01,
                fused_megastep=fused, verbose=False,
            ),
        )
        # warm-up run compiles everything (jitted programs are cached on the
        # trainer/collector), then a second run measures steady state
        trainer.params.epoch_num_steps = T * E * 2
        res = trainer.run(ts, buf_state, key)
        ts, buf_state = res.train_state, res.buf_state
        trainer.params.epoch_num_steps = T * E * 40
        trainer.start_epoch = 0
        t0 = time.perf_counter()
        res = trainer.run(ts, buf_state, key)
        dt = time.perf_counter() - t0
        print(f"fused={fused}: {res.env_step/dt/1e6:7.2f}M env-steps/s steady-state "
              f"({res.gradient_step} grad steps, batch 1024)")
