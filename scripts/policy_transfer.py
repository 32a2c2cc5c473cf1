"""Policy-transfer fidelity harness: evaluate trained policies ACROSS
engines (device physics <-> real Gymnasium MuJoCo).

The per-step parity probe (physics_parity.py) measures error along
random-action trajectories; this measures what actually matters for the
benchmark tables — whether a policy trained in one engine performs in the
other at its full gait speed. A device-trained policy that scores X on the
device env and ~X on real MuJoCo means the residual table gap is NOT
dynamics infidelity.

Input: the ``save_params`` pickle written by examples/benchmark/seed_vmap.py
(queue jobs with ``{"vmap": {..., "save_params": "..."}}``).

Usage::

    python scripts/policy_transfer.py --params /tmp/sac_hc_params.pkl
"""

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples" / "benchmark"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def eval_device(algo, env, ts, episodes=5, seed=0):
    key = jax.random.key(seed)
    step = jax.jit(lambda s, a, k: env.step(s, a, k))
    fwd = jax.jit(lambda ts, o, k: algo.forward(ts, o[None], k, deterministic=True).act[0])
    rets = []
    for ep in range(episodes):
        key, kr = jax.random.split(key)
        s, obs = env.reset(kr)
        total, t = 0.0, 0
        while t < env.max_episode_steps:
            key, ka, ks = jax.random.split(key, 3)
            act = fwd(ts, obs, ka)
            out = step(s, act, ks)
            s, obs = out.state, out.obs
            total += float(out.reward)
            t += 1
            if bool(out.terminated) or bool(out.truncated):
                break
        rets.append(total)
    return np.asarray(rets)


def eval_real(algo, task, ts, episodes=5, seed=0):
    import gymnasium as gym

    env = gym.make(f"{task}-v4")
    fwd = jax.jit(lambda ts, o, k: algo.forward(ts, o[None], k, deterministic=True).act[0])
    key = jax.random.key(seed)
    rets = []
    for ep in range(episodes):
        obs, _ = env.reset(seed=seed * 100 + ep)
        total, done = 0.0, False
        while not done:
            key, ka = jax.random.split(key)
            act = np.asarray(fwd(ts, jnp.asarray(obs, jnp.float32), ka))
            obs, r, term, trunc, _ = env.step(act)
            total += float(r)
            done = term or trunc
        rets.append(total)
    return np.asarray(rets)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--params", required=True)
    p.add_argument("--episodes", type=int, default=5)
    p.add_argument("--skip-real", action="store_true")
    args = p.parse_args()

    blob = pickle.load(open(args.params, "rb"))
    algo_name, task = blob["algo"], blob["task"]
    if "tss" in blob:  # seed_vmap stacked states
        seeds, tss = blob["seeds"], blob["tss"]
    else:  # single TrainState (host-path pickle)
        seeds = [blob.get("seed", 0)]
        tss = jax.tree.map(lambda a: np.asarray(a)[None], blob["ts"])

    from seed_vmap import ALGOS

    from tianshou_tpu.env import mujoco as dm

    env = getattr(dm, task)()
    algo = ALGOS[algo_name](env)

    for i, s in enumerate(seeds):
        ts = jax.tree.map(lambda a: a[i], tss)
        dev = eval_device(algo, env, ts, episodes=args.episodes, seed=s)
        line = f"seed {s}: device {dev.mean():8.1f} ± {dev.std():6.1f}"
        if not args.skip_real:
            real = eval_real(algo, task, ts, episodes=args.episodes, seed=s)
            line += f"   real-MuJoCo {real.mean():8.1f} ± {real.std():6.1f}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
