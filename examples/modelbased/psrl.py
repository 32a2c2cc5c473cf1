"""PSRL (posterior sampling RL) on tabular device envs — TPU rebuild of
the reference examples/modelbased/psrl.py (Dirichlet transition posterior +
Gaussian reward posterior, value-iteration policy per posterior sample).

The device NChain env plays the role of the reference's NChain-v0; the
whole collect loop is a jitted scan, and the per-epoch posterior sample +
value iteration run as one XLA program.

    python examples/modelbased/psrl.py --task NChain --epochs 10
"""

import sys as _sys
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import argparse
import time

import jax
import jax.numpy as jnp


def train(
    task: str = "NChain",
    seed: int = 0,
    epochs: int = 10,
    epoch_num_steps: int = 2_000,
    num_envs: int = 8,
    rollout_len: int = 100,
    rew_mean_prior: float = 0.0,
    rew_std_prior: float = 1.0,
    add_done_loop: bool = False,
    value_iterations: int = 200,
    gamma: float = 0.95,
    test_episodes: int = 8,
    verbose: bool = True,
    logger=None,
):
    from tianshou_tpu.algorithm.modelbased.psrl import PSRL
    from tianshou_tpu.data.collector import DeviceCollector
    from tianshou_tpu.env.classic.nchain import NChain
    from tianshou_tpu.env.core import VectorDeviceEnv
    from tianshou_tpu.trainer.trainer import OnPolicyTrainer, OnPolicyTrainerParams

    if task != "NChain":
        raise SystemExit(
            f"task {task!r}: the device example ships NChain (the reference's "
            "NChain-v0 analogue); FrozenLake/Taxi need gym's toy_text envs"
        )
    env = NChain(n=5, slip=0.2)
    algo = PSRL(
        n_state=5, n_action=2, action_space=env.action_space,
        gamma=gamma, add_done_loop=add_done_loop,
        value_iterations=value_iterations,
        rew_mean_prior=rew_mean_prior, rew_std_prior=rew_std_prior,
    )
    key = jax.random.key(seed)
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros(1))
    tc = DeviceCollector(VectorDeviceEnv(env, num_envs), algo, None)
    ec = DeviceCollector(VectorDeviceEnv(env, max(test_episodes, 8)), algo, None)
    params = OnPolicyTrainerParams(
        max_epochs=epochs, epoch_num_steps=epoch_num_steps,
        test_step_num_episodes=test_episodes, batch_size=1024,
        collection_step_num_env_steps=rollout_len,
        update_step_num_repetitions=1, logger=logger, verbose=verbose,
    )
    t0 = time.time()
    result = OnPolicyTrainer(algo, tc, ec, params).run(ts, key)
    if verbose:
        print(f"best_reward={result.best_reward:.1f} env_steps={result.env_step} "
              f"({result.env_step / max(time.time() - t0, 1e-9):,.0f} steps/s)")
    return result


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="NChain")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--epoch-num-steps", type=int, default=2_000)
    p.add_argument("--rew-mean-prior", type=float, default=0.0)
    p.add_argument("--rew-std-prior", type=float, default=1.0)
    p.add_argument("--add-done-loop", action="store_true")
    args = p.parse_args()
    train(**{k.replace("-", "_"): v for k, v in vars(args).items()})
