"""Flagship benchmark: PPO collect+update throughput on vectorized device envs.

Measures steady-state env-steps/sec for the fused collect->update megastep
(4096 CartPole envs x 128 steps, then 4 PPO epochs over the rollout) on the
available accelerator. Baseline: the reference's published collection
throughput of ~3,000 env-step/s (CNN policy + collector + buffer,
examples/atari/README.md:22-23; see BASELINE.md) — its Python collector +
subprocess envs are the bottleneck the scan collector removes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_SEC = 3000.0


def main() -> None:
    from tianshou_tpu.algorithm.modelfree.ppo import PPO
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
    from tianshou_tpu.data.collector import DeviceCollector
    from tianshou_tpu.env.classic.cartpole import CartPole
    from tianshou_tpu.env.core import VectorDeviceEnv
    from tianshou_tpu.models.discrete import DiscreteActor, DiscreteCritic

    E, T, REPEAT, BATCH = 4096, 128, 4, 16384

    env = CartPole()
    algo = PPO(
        actor=DiscreteActor(hidden_sizes=(64, 64), action_dim=2),
        critic=DiscreteCritic(hidden_sizes=(64, 64)),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=3e-4, max_grad_norm=0.5),
        deterministic_eval=True,
    )
    venv = VectorDeviceEnv(env, E)
    collector = DeviceCollector(venv, algo, None)

    key = jax.random.key(0)
    key, k1, k2 = jax.random.split(key, 3)
    ts = algo.init(k1, jnp.zeros(4))
    cstate = collector.reset(k2)

    @jax.jit
    def megastep(ts, cstate, key):
        k1, k2 = jax.random.split(key)
        keys = jax.random.split(k1, T)

        def body(carry, k):
            return collector._step_fn(ts, carry, k, training=True, store=False, keep_rollout=True)

        (cstate, _), out = jax.lax.scan(body, (cstate, None), keys)
        ts, stats = algo.update_rollout(ts, out.rollout, k2, repeat=REPEAT, batch_size=BATCH)
        return ts, cstate, stats

    # warmup / compile
    for _ in range(2):
        key, k = jax.random.split(key)
        ts, cstate, _ = megastep(ts, cstate, k)
    jax.block_until_ready(ts.step)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        key, k = jax.random.split(key)
        ts, cstate, _ = megastep(ts, cstate, k)
    jax.block_until_ready(ts.step)
    dt = time.perf_counter() - t0

    steps_per_sec = iters * T * E / dt
    print(
        json.dumps(
            {
                "metric": "ppo_collect_update_env_steps_per_sec",
                "value": round(steps_per_sec, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
