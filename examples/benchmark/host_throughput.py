"""Host-path collection throughput: sequential vs pipelined collector.

The gym/Atari path keeps envs on the host (the reference's only path;
its headline is ~3,000 env-step/s with CNN+Atari, examples/atari/README.md:22).
This script measures env-steps/s of HostCollector vs PipelinedHostCollector
over SubprocVectorEnv on a configurable-cost env, showing where the
half-pool pipeline (device forward overlapped with subprocess stepping)
wins. Run: python examples/benchmark/host_throughput.py [--env-ms 2.0]
"""

import argparse
import time

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.algorithm.modelfree.dqn import DQN
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.data.host_collector import HostCollector
from tianshou_tpu.data.pipelined_collector import PipelinedHostCollector
from tianshou_tpu.env.core import Discrete
from tianshou_tpu.env.venvs import SubprocVectorEnv
from tianshou_tpu.models.mlp import Net


class SleepyCartPole(gym.Wrapper):
    """CartPole with an artificial per-step cost, standing in for a heavy
    simulator (Atari frame decode, physics, ...)."""

    def __init__(self, ms: float):
        super().__init__(gym.make("CartPole-v1"))
        self.ms = ms

    def step(self, action):
        if self.ms > 0:
            time.sleep(self.ms / 1e3)
        return super().step(action)


def run(collector_cls, venv, algo, ts, n_step: int) -> float:
    buffer = VectorReplayBuffer(total_size=n_step * 2, buffer_num=len(venv))
    col = collector_cls(venv, algo, buffer)
    col.reset(seed=0)
    col.reset_buffer(Batch(
        obs=jnp.zeros(4), act=jnp.int32(0), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(4),
    ))
    col.collect(ts, jax.random.key(1), n_step=len(venv) * 4)  # warmup/compile
    t0 = time.perf_counter()
    stats = col.collect(ts, jax.random.key(2), n_step=n_step)
    dt = time.perf_counter() - t0
    return stats.n_collected_steps / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-ms", type=float, default=2.0, help="artificial env.step cost")
    ap.add_argument("--n-envs", type=int, default=8)
    ap.add_argument("--n-step", type=int, default=4000)
    args = ap.parse_args()

    algo = DQN(
        model=Net(hidden_sizes=(128, 128), output_dim=2),
        action_space=Discrete(2),
        optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.99, eps_training=0.1,
    )
    ts = algo.init(jax.random.key(0), jnp.zeros(4))

    results = {}
    for name, cls in [("sequential", HostCollector), ("pipelined", PipelinedHostCollector)]:
        venv = SubprocVectorEnv([lambda: SleepyCartPole(args.env_ms) for _ in range(args.n_envs)])
        results[name] = run(cls, venv, algo, ts, args.n_step)
        venv.close()
        print(f"{name:>10}: {results[name]:,.0f} env-step/s "
              f"({args.n_envs} subproc envs, {args.env_ms}ms/step)")
    print(f"  speedup: {results['pipelined'] / results['sequential']:.2f}x")


if __name__ == "__main__":
    main()
