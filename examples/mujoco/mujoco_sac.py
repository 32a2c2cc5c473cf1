"""SAC on the device MuJoCo-class envs — TPU rebuild of the reference
examples/mujoco/mujoco_sac.py (256x256 nets, lr 1e-3, tau 0.005,
alpha 0.2 fixed by default, 10k random prefill, 1 gradient step per env
step). Collection + the gradient-step burst run as fused device scans.

    python examples/mujoco/mujoco_sac.py --task HalfCheetah --epochs 50
"""

import sys as _sys
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import argparse
import time

import jax
import jax.numpy as jnp


def train(
    task: str = "HalfCheetah",
    seed: int = 0,
    epochs: int = 50,
    epoch_num_steps: int = 20_000,
    num_envs: int = 32,
    chunk_len: int = 4,
    update_per_step: float = 1.0,
    batch_size: int = 256,
    buffer_size: int = 1_000_000,
    actor_lr: float = 1e-3,
    critic_lr: float = 1e-3,
    alpha: float | str = 0.2,
    tau: float = 0.005,
    gamma: float = 0.99,
    n_step: int = 1,
    start_steps: int = 10_000,
    hidden: tuple = (256, 256),
    test_episodes: int = 10,
    logger=None,
    verbose: bool = True,
    fused: bool = True,
):
    from tianshou_tpu.algorithm.modelfree.sac import SAC
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
    from tianshou_tpu.data.batch import Batch
    from tianshou_tpu.data.buffer.base import VectorReplayBuffer
    from tianshou_tpu.data.collector import DeviceCollector
    from tianshou_tpu.env.core import VectorDeviceEnv
    from tianshou_tpu.env.mujoco import make
    from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, ContinuousCritic
    from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams

    env = make(task)
    nu = env.action_space.shape[0]
    obs_dim = env.observation_space.shape[0]
    algo = SAC(
        actor=ContinuousActorProbabilistic(hidden_sizes=hidden, action_dim=nu, conditioned_sigma=True),
        critic=ContinuousCritic(hidden_sizes=hidden),
        action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=actor_lr),
        critic_optim=AdamOptimizerFactory(lr=critic_lr),
        alpha=alpha,
        tau=tau,
        gamma=gamma,
        n_step_return_horizon=n_step,
    )
    key = jax.random.key(seed)
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros(obs_dim))
    buffer = VectorReplayBuffer(total_size=buffer_size, buffer_num=num_envs)
    buf_state = buffer.init(
        Batch(obs=jnp.zeros(obs_dim), act=jnp.zeros(nu), rew=jnp.float32(0),
              terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(obs_dim))
    )
    train_c = DeviceCollector(VectorDeviceEnv(env, num_envs), algo, buffer)
    test_c = DeviceCollector(VectorDeviceEnv(env, max(test_episodes, 10)), algo, None)
    params = OffPolicyTrainerParams(
        max_epochs=epochs,
        epoch_num_steps=epoch_num_steps,
        test_step_num_episodes=test_episodes,
        batch_size=batch_size,
        collection_step_num_env_steps=chunk_len,
        update_per_step=update_per_step,
        start_steps=start_steps,
        start_random=True,
        fused_megastep=fused,
        logger=logger,
        verbose=verbose,
    )
    trainer = OffPolicyTrainer(algo, train_c, test_c, buffer, params)
    t0 = time.time()
    result = trainer.run(ts, buf_state, key)
    if verbose:
        print(f"best_reward={result.best_reward:.1f} env_steps={result.env_step} "
              f"({result.env_step / max(time.time() - t0, 1e-9):,.0f} steps/s)")
    return result


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--backend", choices=["device", "host"], default="device",
                   help="device = TPU physics core; host = REAL Gymnasium MuJoCo envs")
    p.add_argument("--cpu", action="store_true",
                   help="pin JAX to the CPU backend (host runs that must not contend for the chip)")
    p.add_argument("--task", default="HalfCheetah")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--epoch-num-steps", type=int, default=20_000)
    p.add_argument("--num-envs", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--alpha", default=0.2)
    p.add_argument("--start-steps", type=int, default=10_000)
    args = p.parse_args()
    kw = {k.replace("-", "_"): v for k, v in vars(args).items()}
    if kw.pop("cpu"):
        from _runner import force_cpu

        force_cpu()
    if kw["alpha"] != "auto":
        kw["alpha"] = float(kw["alpha"])
    backend = kw.pop("backend")
    if backend == "host":
        from _runner import run_offpolicy_host
        from tianshou_tpu.algorithm.modelfree.sac import SAC
        from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
        from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, ContinuousCritic

        alpha = kw.pop("alpha")

        def make_algo(env):
            nu = env.action_space.shape[0]
            return SAC(
                actor=ContinuousActorProbabilistic(hidden_sizes=(256, 256), action_dim=nu, conditioned_sigma=True),
                critic=ContinuousCritic(hidden_sizes=(256, 256)),
                action_space=env.action_space,
                policy_optim=AdamOptimizerFactory(lr=1e-3),
                critic_optim=AdamOptimizerFactory(lr=1e-3),
                alpha=alpha, tau=0.005, gamma=0.99, n_step_return_horizon=1,
            )

        run_offpolicy_host(make_algo, **kw)
    else:
        train(**kw)
