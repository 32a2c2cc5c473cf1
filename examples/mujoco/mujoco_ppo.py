"""PPO on the device MuJoCo-class envs — TPU rebuild of the reference
benchmark script (examples/mujoco/mujoco_ppo.py).

The reference runs 8 subprocess envs at ~hundreds of steps/s; here the envs
are vmapped pure functions inside the collector's lax.scan, so the same
algorithm sweeps thousands of envs per device dispatch. Hyperparameters
follow the reference where they transfer (net sizes, lr + linear decay,
gamma/gae, clip/value-clip, obs normalization); the env/rollout geometry is
TPU-scale (many envs x shorter rollouts, same total batch per update).

    python examples/mujoco/mujoco_ppo.py --task HalfCheetah --epochs 30
"""

import sys as _sys
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def train(
    task: str = "HalfCheetah",
    seed: int = 0,
    epochs: int = 30,
    epoch_num_steps: int = 100_000,
    num_envs: int = 16,
    rollout_len: int = 128,   # 2048 steps per collect (reference protocol)
    repeat: int = 10,
    batch_size: int = 64,
    lr: float = 3e-4,
    lr_decay: bool = True,
    gamma: float = 0.99,
    gae_lambda: float = 0.95,
    target_kl: float | None = 0.015,
    ent_coef: float = 0.0,
    sde: bool = False,
    sde_sigma_init: float = -2.0,
    hidden: tuple = (64, 64),
    test_episodes: int = 10,
    logger=None,
    verbose: bool = True,
):
    from tianshou_tpu.algorithm.modelfree.ppo import PPO
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory, linear_lr_schedule
    from tianshou_tpu.data.collector import DeviceCollector
    from tianshou_tpu.env.core import VectorDeviceEnv
    from tianshou_tpu.env.mujoco import make
    from tianshou_tpu.env.wrappers import NormObs
    from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, ContinuousCritic
    from tianshou_tpu.trainer.trainer import OnPolicyTrainer, OnPolicyTrainerParams

    env = NormObs(make(task))
    nu = env.action_space.shape[0]
    obs_dim = env.observation_space.shape[0]
    # schedule horizon = MINIBATCH gradient steps (optax steps the schedule
    # per optimizer update): rollouts x repeat x minibatches-per-pass
    n_rollouts = max(1, epochs * epoch_num_steps // (num_envs * rollout_len))
    n_minibatches = max(1, (num_envs * rollout_len) // batch_size)
    total_updates = n_rollouts * repeat * n_minibatches
    sched = linear_lr_schedule(lr, total_updates) if lr_decay else lr
    algo = PPO(
        # reference init recipe (mujoco_ppo.py:109-120): tanh nets,
        # orthogonal kernels, 0.01-scaled final mu layer, sigma exp(-0.5).
        # sde=True switches exploration to gSDE (arXiv:2005.05719):
        # temporally-correlated state-dependent noise, resampled per rollout
        # and on episode end; sigma_init=-2 gives a comparable initial
        # marginal std once summed over the 64 feature channels.
        actor=ContinuousActorProbabilistic(
            hidden_sizes=hidden, action_dim=nu, ppo_init=True,
            sde=sde, sigma_init=(sde_sigma_init if sde else -0.5),
        ),
        critic=ContinuousCritic(hidden_sizes=hidden, use_action=False, ppo_init=True),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=sched, max_grad_norm=0.5),
        gamma=gamma,
        gae_lambda=gae_lambda,
        eps_clip=0.2,
        value_clip=True,
        advantage_normalization=False,
        return_standardization=True,
        recompute_advantage=True,
        vf_coef=0.25,
        ent_coef=ent_coef,
        action_bound_method="clip",
        deterministic_eval=True,
        target_kl=target_kl,
    )
    key = jax.random.key(seed)
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros(obs_dim))
    train_c = DeviceCollector(VectorDeviceEnv(env, num_envs), algo, None)
    # frozen obs-norm stats on test (reference update_obs_rms=False)
    test_env = NormObs(env.env, update_stats=False)
    test_c = DeviceCollector(VectorDeviceEnv(test_env, max(test_episodes, 10)), algo, None)
    params = OnPolicyTrainerParams(
        max_epochs=epochs,
        epoch_num_steps=epoch_num_steps,
        test_step_num_episodes=test_episodes,
        batch_size=batch_size,
        collection_step_num_env_steps=rollout_len,
        update_step_num_repetitions=repeat,
        logger=logger,
        verbose=verbose,
    )
    trainer = OnPolicyTrainer(algo, train_c, test_c, params)
    t0 = time.time()
    result = trainer.run(ts, key)
    steps_per_s = result.env_step / max(time.time() - t0, 1e-9)
    if verbose:
        print(f"best_reward={result.best_reward:.1f} env_steps={result.env_step} ({steps_per_s:,.0f} steps/s)")
    return result


def train_host(task="HalfCheetah", seed=0, epochs=30, epoch_num_steps=100_000,
               num_envs=16, rollout_len=128, repeat=10, batch_size=64,
               lr=3e-4, lr_decay=True, hidden=(64, 64), test_episodes=10,
               verbose=True, logger=None, **_ignored):
    """PPO on the REAL Gymnasium MuJoCo envs (reference protocol)."""
    from _runner import run_onpolicy_host

    from tianshou_tpu.algorithm.modelfree.ppo import PPO
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory, linear_lr_schedule
    from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, ContinuousCritic

    n_rollouts = max(1, epochs * epoch_num_steps // (num_envs * rollout_len))
    n_minibatches = max(1, (num_envs * rollout_len) // batch_size)
    total_updates = n_rollouts * repeat * n_minibatches
    sched = linear_lr_schedule(lr, total_updates) if lr_decay else lr

    def make_algo(env):
        nu = env.action_space.shape[0]
        return PPO(
            actor=ContinuousActorProbabilistic(hidden_sizes=hidden, action_dim=nu, ppo_init=True),
            critic=ContinuousCritic(hidden_sizes=hidden, use_action=False, ppo_init=True),
            action_space=env.action_space,
            optim=AdamOptimizerFactory(lr=sched, max_grad_norm=0.5),
            gamma=0.99, gae_lambda=0.95, eps_clip=0.2, value_clip=True,
            advantage_normalization=False, return_standardization=True,
            recompute_advantage=True, vf_coef=0.25, ent_coef=0.0,
            action_bound_method="clip", deterministic_eval=True,
        )

    return run_onpolicy_host(
        make_algo, task=task, seed=seed, epochs=epochs,
        epoch_num_steps=epoch_num_steps, num_envs=num_envs,
        batch_size=batch_size, rollout_len=rollout_len, repeat=repeat,
        test_episodes=test_episodes, verbose=verbose, logger=logger,
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--backend", choices=["device", "host"], default="device",
                   help="device = TPU physics core; host = REAL Gymnasium MuJoCo envs")
    p.add_argument("--cpu", action="store_true",
                   help="pin JAX to the CPU backend (host runs that must not contend for the chip)")
    p.add_argument("--task", default="HalfCheetah")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--epoch-num-steps", type=int, default=100_000)
    p.add_argument("--num-envs", type=int, default=16)
    p.add_argument("--rollout-len", type=int, default=128)
    p.add_argument("--repeat", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--sde", action="store_true",
                   help="gSDE state-dependent exploration (device backend)")
    args = p.parse_args()
    kw = {k.replace("-", "_"): v for k, v in vars(args).items()}
    if kw.pop("cpu"):
        from _runner import force_cpu

        force_cpu()
    backend = kw.pop("backend")
    (train_host if backend == "host" else train)(**kw)
