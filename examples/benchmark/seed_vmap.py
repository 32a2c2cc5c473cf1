"""Seed-vmapped multi-seed benchmark runner (off-policy device rows).

The reference's table protocol needs >=3 independent trials per row
(max test return per trial, aggregated). Running trials sequentially
wastes the chip: a single 256-wide MLP update nowhere near saturates the
MXU, and the device-physics envs are latency- not compute-bound. Here the
ENTIRE training program — collect chunk + gradient burst + test rollouts —
is ``jax.vmap``-ed over a leading seed axis, so S independent agents train
simultaneously inside one XLA program: the batched matmuls get S times
larger (better MXU utilization), the dispatch count stays constant, and
wall-clock for 3 seeds measures ~1.2-1.5x a single seed instead of 3x.

This runner mirrors the hyperparameters of examples/mujoco/mujoco_{sac,
td3,ddpg,redq}.py (reference protocol: 1M steps, 256x256 nets, 10-episode
tests per 20k-step epoch, random prefill). Used by seed_queue.py jobs with
``"vmap_seeds": true``.
"""

import sys as _sys
import time
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# algorithm factories (hyperparameters of the sibling example scripts)
# ---------------------------------------------------------------------------
def _make_sac(env, alpha=0.2):
    from tianshou_tpu.algorithm.modelfree.sac import SAC
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
    from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, ContinuousCritic

    nu = env.action_space.shape[0]
    return SAC(
        actor=ContinuousActorProbabilistic(hidden_sizes=(256, 256), action_dim=nu, conditioned_sigma=True),
        critic=ContinuousCritic(hidden_sizes=(256, 256)),
        action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=1e-3),
        critic_optim=AdamOptimizerFactory(lr=1e-3),
        alpha=alpha, tau=0.005, gamma=0.99, n_step_return_horizon=1,
    )


def _make_td3(env, exploration_sigma=0.1, policy_noise=0.2):
    from tianshou_tpu.algorithm.modelfree.td3 import TD3
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
    from tianshou_tpu.exploration.noise import GaussianNoise
    from tianshou_tpu.models.continuous import ContinuousActorDeterministic, ContinuousCritic

    nu = env.action_space.shape[0]
    return TD3(
        actor=ContinuousActorDeterministic(hidden_sizes=(256, 256), action_dim=nu),
        critic=ContinuousCritic(hidden_sizes=(256, 256)),
        action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=3e-4),
        critic_optim=AdamOptimizerFactory(lr=3e-4),
        exploration_noise=GaussianNoise(sigma=exploration_sigma),
        policy_noise=policy_noise, noise_clip=0.5, update_actor_freq=2,
        tau=0.005, gamma=0.99, n_step_return_horizon=1,
    )


def _make_ddpg(env):
    from tianshou_tpu.algorithm.modelfree.ddpg import DDPG
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
    from tianshou_tpu.exploration.noise import GaussianNoise
    from tianshou_tpu.models.continuous import ContinuousActorDeterministic, ContinuousCritic

    nu = env.action_space.shape[0]
    return DDPG(
        actor=ContinuousActorDeterministic(hidden_sizes=(256, 256), action_dim=nu),
        critic=ContinuousCritic(hidden_sizes=(256, 256)),
        action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=1e-3),
        critic_optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.99, tau=0.005, exploration_noise=GaussianNoise(sigma=0.1),
    )


def _make_redq(env):
    from tianshou_tpu.algorithm.modelfree.redq import REDQ
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
    from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, EnsembleCritic

    nu = env.action_space.shape[0]
    return REDQ(
        actor=ContinuousActorProbabilistic(hidden_sizes=(256, 256), action_dim=nu, conditioned_sigma=True),
        critic=EnsembleCritic(hidden_sizes=(256, 256), ensemble_size=10),
        action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=1e-3),
        critic_optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.99, tau=0.005,
        ensemble_size=10, subset_size=2, alpha="auto", actor_delay=20,
    )


ALGOS = {"sac": _make_sac, "td3": _make_td3, "ddpg": _make_ddpg, "redq": _make_redq}
START_STEPS = {"sac": 10_000, "td3": 25_000, "ddpg": 25_000, "redq": 10_000}


# ---------------------------------------------------------------------------
def run_multiseed(
    algo_name: str,
    task: str,
    seeds: list[int],
    epochs: int = 50,
    epoch_num_steps: int = 20_000,
    num_envs: int = 32,
    chunk_len: int = 4,
    update_per_step: float = 1.0,
    batch_size: int = 256,
    buffer_size: int = 1_000_000,
    start_steps: int | None = None,
    test_episodes: int = 10,
    verbose: bool = True,
    env_overrides: dict | None = None,
    algo_kwargs: dict | None = None,
    save_params: str | None = None,
) -> list[dict]:
    """Train ``len(seeds)`` agents simultaneously; returns one result dict
    per seed: {seed, best_reward, curve: [(env_step, reward), ...]}."""
    from tianshou_tpu.data.batch import Batch
    from tianshou_tpu.data.buffer.base import VectorReplayBuffer
    from tianshou_tpu.data.collector import DeviceCollector
    from tianshou_tpu.env.core import VectorDeviceEnv
    from tianshou_tpu.env.mujoco import make

    env = make(task)
    for k, v in (env_overrides or {}).items():  # e.g. {"substeps": 2} fidelity A/B
        setattr(env, k, v)
        if k == "contact_iterations":  # baked into the model at env init
            env.model.contact_iterations = int(v)
    algo = ALGOS[algo_name](env, **(algo_kwargs or {}))  # e.g. {"alpha": "auto"} sweeps
    if start_steps is None:
        start_steps = START_STEPS[algo_name]
    S = len(seeds)
    nu = env.action_space.shape[0]
    obs_dim = env.observation_space.shape[0]
    horizon = env.max_episode_steps

    buffer = VectorReplayBuffer(total_size=buffer_size, buffer_num=num_envs)
    example = Batch(
        obs=jnp.zeros(obs_dim), act=jnp.zeros(nu), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(obs_dim),
    )
    train_c = DeviceCollector(VectorDeviceEnv(env, num_envs), algo, buffer)
    test_c = DeviceCollector(VectorDeviceEnv(env, test_episodes), algo, None)

    # ---- per-seed init, stacked over the seed axis
    def init_seed(key):
        k1, k2 = jax.random.split(key)
        ts = algo.init(k1, jnp.zeros(obs_dim))
        cstate = train_c.reset(k2)
        bstate = buffer.init(example)
        return ts, cstate, bstate

    seed_keys = jax.vmap(jax.random.key)(jnp.asarray(seeds, jnp.uint32))
    tss, cstates, bstates = jax.vmap(init_seed)(seed_keys)

    # ---- single-seed programs (vmapped below)
    T = chunk_len
    n_updates = max(1, round(update_per_step * T * num_envs))

    def megastep1(ts, cstate, bstate, key):
        k_c, k_u = jax.random.split(key)
        keys = jax.random.split(k_c, T)

        def c_body(carry, k):
            return train_c._step_fn(ts, carry, k, training=True, store=True, keep_rollout=False)

        (cstate, bstate), _ = jax.lax.scan(c_body, (cstate, bstate), keys)

        def u_body(carry, k):
            ts, bstate = carry
            ts, bstate, stats = algo.update(ts, buffer, bstate, k, batch_size)
            return (ts, bstate), stats

        (ts, bstate), _ = jax.lax.scan(u_body, (ts, bstate), jax.random.split(k_u, n_updates))
        return ts, cstate, bstate

    def prefill1(ts, cstate, bstate, key):
        keys = jax.random.split(key, T)

        def c_body(carry, k):
            return train_c._step_fn(ts, carry, k, training=True, store=True,
                                    keep_rollout=False, random=True)

        (cstate, bstate), _ = jax.lax.scan(c_body, (cstate, bstate), keys)
        return cstate, bstate

    def test1(ts, key):
        k_r, k_s = jax.random.split(key)
        tstate = test_c.reset(k_r)

        def t_body(carry, k):
            (cs, _), emit = test_c._step_fn(ts, (carry, None), k, training=False,
                                            store=False, keep_rollout=False)
            return cs, emit

        _, out = jax.lax.scan(t_body, tstate, jax.random.split(k_s, horizon))
        n_done = jnp.maximum(out.done.sum(), 1)
        return (out.ep_ret * out.done).sum() / n_done

    megastep = jax.jit(jax.vmap(megastep1), donate_argnums=(0, 1, 2))
    prefill = jax.jit(jax.vmap(prefill1), donate_argnums=(1, 2))
    test = jax.jit(jax.vmap(test1))

    def split_all(key, n=2):
        ks = jax.vmap(lambda k: jax.random.split(k, n))(key)
        return [ks[:, i] for i in range(n)]

    # ---- drive
    t0 = time.time()
    keys = jax.vmap(jax.random.fold_in)(seed_keys, jnp.full(S, 7, jnp.uint32))
    n_prefill = int(np.ceil(start_steps / (T * num_envs)))
    for _ in range(n_prefill):
        keys, k = split_all(keys)
        cstates, bstates = prefill(tss, cstates, bstates, k)
    steps_per_mega = T * num_envs
    megas_per_epoch = int(np.ceil(epoch_num_steps / steps_per_mega))
    best = np.full(S, -np.inf)
    curves: list[list] = [[] for _ in range(S)]
    env_step = n_prefill * steps_per_mega
    for epoch in range(1, epochs + 1):
        for _ in range(megas_per_epoch):
            keys, k = split_all(keys)
            tss, cstates, bstates = megastep(tss, cstates, bstates, k)
        env_step += megas_per_epoch * steps_per_mega
        keys, k = split_all(keys)
        rews = np.asarray(test(tss, k))
        best = np.maximum(best, rews)
        for i in range(S):
            curves[i].append((env_step, float(rews[i])))
        if verbose:
            per_s = env_step * S / max(time.time() - t0, 1e-9)
            print(f"[seed_vmap {algo_name} {task}] epoch {epoch}: "
                  f"rewards {np.round(rews, 1).tolist()} best {np.round(best, 1).tolist()} "
                  f"({per_s:,.0f} agent-steps/s)", flush=True)
    wall = time.time() - t0
    if save_params:
        import pickle

        with open(save_params, "wb") as f:
            pickle.dump({"algo": algo_name, "task": task, "seeds": list(seeds),
                         "tss": jax.device_get(tss)}, f)
        if verbose:
            print(f"[seed_vmap] saved final TrainStates -> {save_params}", flush=True)
    return [
        {"seed": int(s), "best_reward": float(best[i]), "env_step": int(env_step),
         "curve": curves[i], "wall_s": round(wall, 1),
         "agent_steps_per_s": round(env_step * S / wall, 1)}
        for i, s in enumerate(seeds)
    ]


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--algo", choices=sorted(ALGOS), default="sac")
    p.add_argument("--task", default="HalfCheetah")
    p.add_argument("--seeds", default="0,1,2")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--epoch-num-steps", type=int, default=20_000)
    args = p.parse_args()
    out = run_multiseed(
        args.algo, args.task, [int(s) for s in args.seeds.split(",")],
        epochs=args.epochs, epoch_num_steps=args.epoch_num_steps,
    )
    for r in out:
        print(f"seed {r['seed']}: best {r['best_reward']:.1f}")
