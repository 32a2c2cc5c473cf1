"""Throughput sweep: PPO collect+update env-steps/sec vs number of
vectorized envs (the bench.py metric at multiple scales)."""

import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))  # run without install


import time

import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.modelfree.ppo import PPO
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.env.classic.cartpole import CartPole
from tianshou_tpu.env.core import VectorDeviceEnv
from tianshou_tpu.models.discrete import DiscreteActor, DiscreteCritic

if __name__ == "__main__":
    T, REPEAT, BATCH = 128, 4, 16384
    for E in (64, 256, 1024, 4096):
        env = CartPole()
        algo = PPO(
            actor=DiscreteActor(hidden_sizes=(64, 64), action_dim=2),
            critic=DiscreteCritic(hidden_sizes=(64, 64)),
            action_space=env.action_space,
            optim=AdamOptimizerFactory(lr=3e-4, max_grad_norm=0.5),
        )
        coll = DeviceCollector(VectorDeviceEnv(env, E), algo, None)
        key = jax.random.key(0)
        key, k1, k2 = jax.random.split(key, 3)
        ts = algo.init(k1, jnp.zeros(4))
        cstate = coll.reset(k2)

        @jax.jit
        def megastep(ts, cstate, key):
            k1, k2 = jax.random.split(key)
            keys = jax.random.split(k1, T)

            def body(carry, k):
                return coll._step_fn(ts, carry, k, training=True, store=False, keep_rollout=True)

            (cstate, _), out = jax.lax.scan(body, (cstate, None), keys)
            ts, _ = algo.update_rollout(ts, out.rollout, k2, repeat=REPEAT, batch_size=min(BATCH, T * E))
            return ts, cstate

        for _ in range(2):
            key, k = jax.random.split(key)
            ts, cstate = megastep(ts, cstate, k)
        jax.block_until_ready(ts.step)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            key, k = jax.random.split(key)
            ts, cstate = megastep(ts, cstate, k)
        jax.block_until_ready(ts.step)
        sps = iters * T * E / (time.perf_counter() - t0)
        print(f"E={E:5d}: {sps/1e6:8.2f}M env-steps/s")
