"""Shared scaffolding for the MuJoCo-class example scripts: env/model
construction, trainer wiring, and the argparse surface mirrored from the
reference examples/mujoco scripts."""

import sys as _sys
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import argparse
import time

import jax
import jax.numpy as jnp


def force_cpu() -> None:
    """Pin JAX to the host CPU backend. The machine's sitecustomize
    force-registers the tunneled TPU (``axon``) and ignores the
    ``JAX_PLATFORMS`` env var, so ``--backend host`` runs that should not
    contend for the single chip must call this before the first jax op."""
    jax.config.update("jax_platforms", "cpu")


def build_env(task: str, norm_obs: bool = False):
    from tianshou_tpu.env.mujoco import make
    from tianshou_tpu.env.wrappers import NormObs

    env = make(task)
    return NormObs(env) if norm_obs else env


def run_offpolicy(make_algo, task, seed, epochs, epoch_num_steps, num_envs,
                  batch_size, start_steps, buffer_size=1_000_000, chunk_len=4,
                  update_per_step=1.0, test_episodes=10, verbose=True, logger=None):
    """make_algo(env) -> off-policy Algorithm; trains with the reference's
    off-policy protocol (prefill, 1 grad step per env step by default)."""
    from tianshou_tpu.data.batch import Batch
    from tianshou_tpu.data.buffer.base import VectorReplayBuffer
    from tianshou_tpu.data.collector import DeviceCollector
    from tianshou_tpu.env.core import VectorDeviceEnv
    from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams

    env = build_env(task)
    nu = env.action_space.shape[0]
    obs_dim = env.observation_space.shape[0]
    algo = make_algo(env)
    key = jax.random.key(seed)
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros(obs_dim))
    buffer = VectorReplayBuffer(total_size=buffer_size, buffer_num=num_envs)
    buf_state = buffer.init(Batch(
        obs=jnp.zeros(obs_dim), act=jnp.zeros(nu), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(obs_dim),
    ))
    train_c = DeviceCollector(VectorDeviceEnv(env, num_envs), algo, buffer)
    test_c = DeviceCollector(VectorDeviceEnv(env, max(test_episodes, 10)), algo, None)
    params = OffPolicyTrainerParams(
        max_epochs=epochs, epoch_num_steps=epoch_num_steps,
        test_step_num_episodes=test_episodes, batch_size=batch_size,
        collection_step_num_env_steps=chunk_len, update_per_step=update_per_step,
        start_steps=start_steps, start_random=True, fused_megastep=True,
        logger=logger, verbose=verbose,
    )
    t0 = time.time()
    result = OffPolicyTrainer(algo, train_c, test_c, buffer, params).run(ts, buf_state, key)
    if verbose:
        print(f"best_reward={result.best_reward:.1f} env_steps={result.env_step} "
              f"({result.env_step / max(time.time() - t0, 1e-9):,.0f} steps/s)")
    return result


def run_onpolicy(make_algo, task, seed, epochs, epoch_num_steps, num_envs,
                 rollout_len, repeat, batch_size, norm_obs=True,
                 test_episodes=10, verbose=True, logger=None):
    """make_algo(env) -> on-policy Algorithm; reference on-policy protocol."""
    from tianshou_tpu.data.collector import DeviceCollector
    from tianshou_tpu.env.core import VectorDeviceEnv
    from tianshou_tpu.trainer.trainer import OnPolicyTrainer, OnPolicyTrainerParams

    env = build_env(task, norm_obs=norm_obs)
    # test envs evaluate under FROZEN train obs-norm statistics (reference
    # VectorEnvNormObs(update_obs_rms=False) sharing the train rms)
    test_env = env
    if norm_obs:
        from tianshou_tpu.env.wrappers import NormObs

        test_env = NormObs(env.env, update_stats=False)
    obs_dim = env.observation_space.shape[0]
    algo = make_algo(env)
    key = jax.random.key(seed)
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros(obs_dim))
    train_c = DeviceCollector(VectorDeviceEnv(env, num_envs), algo, None)
    test_c = DeviceCollector(VectorDeviceEnv(test_env, max(test_episodes, 10)), algo, None)
    params = OnPolicyTrainerParams(
        max_epochs=epochs, epoch_num_steps=epoch_num_steps,
        test_step_num_episodes=test_episodes, batch_size=batch_size,
        collection_step_num_env_steps=rollout_len,
        update_step_num_repetitions=repeat, logger=logger, verbose=verbose,
    )
    t0 = time.time()
    result = OnPolicyTrainer(algo, train_c, test_c, params).run(ts, key)
    if verbose:
        print(f"best_reward={result.best_reward:.1f} env_steps={result.env_step} "
              f"({result.env_step / max(time.time() - t0, 1e-9):,.0f} steps/s)")
    return result


def offpolicy_argparser(**defaults) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--task", default=defaults.get("task", "HalfCheetah"))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--epochs", type=int, default=defaults.get("epochs", 50))
    p.add_argument("--epoch-num-steps", type=int, default=defaults.get("epoch_num_steps", 20_000))
    p.add_argument("--num-envs", type=int, default=defaults.get("num_envs", 32))
    p.add_argument("--batch-size", type=int, default=defaults.get("batch_size", 256))
    p.add_argument("--start-steps", type=int, default=defaults.get("start_steps", 10_000))
    return p


def make_train(make_algo, **script_defaults):
    """Build a ``train(seed=..., **overrides)`` entry point for an on-policy
    example script, so the seed-queue runner (examples/benchmark/seed_queue.py)
    can drive it the same way it drives the off-policy scripts."""
    def train(seed=0, logger=None, **kwargs):
        # logger is an explicit parameter (not **kwargs) so the seed-queue's
        # signature inspection passes a CurveLogger and the JSONL rows carry
        # learning curves for the rliable plots
        cfg = dict(task="HalfCheetah", epochs=30, epoch_num_steps=100_000,
                   num_envs=256, rollout_len=64, repeat=1, batch_size=4096)
        cfg.update(script_defaults)
        cfg.update(kwargs)
        return run_onpolicy(make_algo, seed=seed, logger=logger, **cfg)
    return train


def onpolicy_argparser(**defaults) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--task", default=defaults.get("task", "HalfCheetah"))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--epochs", type=int, default=defaults.get("epochs", 30))
    p.add_argument("--epoch-num-steps", type=int, default=defaults.get("epoch_num_steps", 100_000))
    p.add_argument("--num-envs", type=int, default=defaults.get("num_envs", 256))
    p.add_argument("--rollout-len", type=int, default=defaults.get("rollout_len", 64))
    p.add_argument("--repeat", type=int, default=defaults.get("repeat", 1))
    p.add_argument("--batch-size", type=int, default=defaults.get("batch_size", 4096))
    return p


def run_offpolicy_host(make_algo, task, seed, epochs, epoch_num_steps, num_envs,
                       batch_size, start_steps, buffer_size=1_000_000,
                       chunk_len=8, update_per_step=1.0, test_episodes=10,
                       verbose=True, logger=None, pipelined=False, overlap=False):
    """Same protocol as :func:`run_offpolicy` but on the REAL Gymnasium
    MuJoCo envs (requires the ``mujoco`` package) through the host
    collector — the exact benchmark environment of the reference tables.

    ``pipelined=True`` uses subprocess env workers with the two-phase
    :class:`PipelinedHostCollector`, overlapping device policy compute
    with host env stepping."""
    import gymnasium as gym

    from tianshou_tpu.data.batch import Batch
    from tianshou_tpu.data.buffer.base import VectorReplayBuffer
    from tianshou_tpu.data.host_collector import HostCollector
    from tianshou_tpu.data.pipelined_collector import PipelinedHostCollector
    from tianshou_tpu.env.core import Box
    from tianshou_tpu.env.venvs import DummyVectorEnv, SubprocVectorEnv
    from tianshou_tpu.trainer.trainer import HostOffPolicyTrainer, OffPolicyTrainerParams

    gym_id = f"{task}-v4"
    make = lambda: gym.make(gym_id)
    probe = make()
    obs_dim = probe.observation_space.shape[0]
    nu = probe.action_space.shape[0]
    probe.close()

    class _EnvSpec:  # minimal spec with our Space types for the algorithm
        observation_space = Box(low=[-float("inf")] * obs_dim, high=[float("inf")] * obs_dim)
        action_space = Box(low=[-1.0] * nu, high=[1.0] * nu)

    algo = make_algo(_EnvSpec())
    key = jax.random.key(seed)
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros(obs_dim))
    buffer = VectorReplayBuffer(total_size=buffer_size, buffer_num=num_envs)
    buf_state = buffer.init(Batch(
        obs=jnp.zeros(obs_dim), act=jnp.zeros(nu), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(obs_dim),
    ))
    if pipelined:
        tc = PipelinedHostCollector(
            SubprocVectorEnv([make for _ in range(num_envs)]), algo, buffer
        )
    else:
        tc = HostCollector(DummyVectorEnv([make for _ in range(num_envs)]), algo, buffer)
    ec = HostCollector(DummyVectorEnv([make for _ in range(test_episodes)]), algo, None)
    params = OffPolicyTrainerParams(
        max_epochs=epochs, epoch_num_steps=epoch_num_steps,
        test_step_num_episodes=test_episodes, batch_size=batch_size,
        collection_step_num_env_steps=chunk_len, update_per_step=update_per_step,
        start_steps=start_steps, start_random=True, logger=logger,
        verbose=verbose, seed=seed, overlap_updates=overlap,
    )
    t0 = time.time()
    result = HostOffPolicyTrainer(algo, tc, ec, buffer, params).run(ts, buf_state, key)
    if verbose:
        print(f"best_reward={result.best_reward:.1f} env_steps={result.env_step} "
              f"({result.env_step / max(time.time() - t0, 1e-9):,.0f} steps/s) [real MuJoCo {gym_id}]")
    return result


def run_onpolicy_host(make_algo, task, seed, epochs, epoch_num_steps, num_envs,
                      batch_size, rollout_len=256, repeat=10, test_episodes=10,
                      verbose=True, logger=None):
    """On-policy (PPO-family) training on the REAL Gymnasium MuJoCo envs
    (reference mujoco_ppo.py protocol: shared VectorEnvNormObs obs_rms
    updated on train and frozen on test, 2048-step collects)."""
    import gymnasium as gym

    from tianshou_tpu.data.host_collector import HostCollector
    from tianshou_tpu.env.core import Box
    from tianshou_tpu.env.venvs import DummyVectorEnv, VectorEnvNormObs
    from tianshou_tpu.trainer.trainer import HostOnPolicyTrainer, OnPolicyTrainerParams

    gym_id = f"{task}-v4"
    make = lambda: gym.make(gym_id)
    probe = make()
    obs_dim = probe.observation_space.shape[0]
    nu = probe.action_space.shape[0]
    probe.close()

    class _EnvSpec:
        observation_space = Box(low=[-float("inf")] * obs_dim, high=[float("inf")] * obs_dim)
        action_space = Box(low=[-1.0] * nu, high=[1.0] * nu)

    algo = make_algo(_EnvSpec())
    key = jax.random.key(seed)
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros(obs_dim))
    train_venv = VectorEnvNormObs(DummyVectorEnv([make for _ in range(num_envs)]))
    test_venv = VectorEnvNormObs(
        DummyVectorEnv([make for _ in range(test_episodes)]), update_obs_rms=False
    )
    test_venv.set_obs_rms(train_venv.get_obs_rms())  # shared, frozen on test
    tc = HostCollector(train_venv, algo)
    ec = HostCollector(test_venv, algo, None)
    params = OnPolicyTrainerParams(
        max_epochs=epochs, epoch_num_steps=epoch_num_steps,
        test_step_num_episodes=test_episodes, batch_size=batch_size,
        collection_step_num_env_steps=rollout_len,
        update_step_num_repetitions=repeat,
        logger=logger, verbose=verbose, seed=seed,
    )
    t0 = time.time()
    result = HostOnPolicyTrainer(algo, tc, ec, params).run(ts, key)
    if verbose:
        print(f"best_reward={result.best_reward:.1f} env_steps={result.env_step} "
              f"({result.env_step / max(time.time() - t0, 1e-9):,.0f} steps/s) [real MuJoCo {gym_id}]")
    return result
