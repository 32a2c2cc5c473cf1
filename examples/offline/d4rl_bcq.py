"""Offline BCQ from an EXTERNAL d4rl-format dataset file — the analogue of
the reference's examples/offline/d4rl_bcq.py, which trains from
``d4rl.qlearning_dataset`` downloads (reference examples/offline/utils.py:10).

The d4rl package (and its mujoco downloads) are not available in this image,
so the dataset FILE is synthesized once by the behavior-policy gatherer and
written in the exact d4rl HDF5 layout (observations / actions / rewards /
terminals / timeouts / next_observations); training then consumes ONLY the
file through :func:`tianshou_tpu.utils.persistence.load_d4rl_hdf5` — the
same ingestion path a real d4rl download would take.

Run: python examples/offline/d4rl_bcq.py [--dataset PATH]
"""

import sys as _sys
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

import numpy as np


def export_d4rl_hdf5(path: str, buf, state) -> None:
    """Flatten a device buffer into the d4rl qlearning_dataset HDF5 layout."""
    import h5py
    import jax

    data = jax.device_get(state.data)
    sizes = np.asarray(state.size)
    fields: dict[str, list] = {k: [] for k in
                               ("observations", "actions", "rewards", "terminals",
                                "timeouts", "next_observations")}
    for e in range(sizes.shape[0]):
        n = int(sizes[e])
        order = np.asarray(buf.chronological_indices(state, e))[:n] % buf.capacity
        fields["observations"].append(np.asarray(data.obs[e])[order])
        fields["actions"].append(np.asarray(data.act[e])[order])
        fields["rewards"].append(np.asarray(data.rew[e])[order])
        fields["terminals"].append(np.asarray(data.terminated[e])[order])
        fields["timeouts"].append(np.asarray(data.truncated[e])[order])
        fields["next_observations"].append(np.asarray(data.obs_next[e])[order])
    with h5py.File(path, "w") as f:
        for k, v in fields.items():
            f.create_dataset(k, data=np.concatenate(v))


def make_dataset(path: str) -> None:
    import jax
    from _gather import gather_pendulum

    _, data, dstate, _, _ = gather_pendulum(jax.random.key(0))
    export_d4rl_hdf5(path, data, dstate)
    print(f"[d4rl_bcq] synthesized d4rl-format dataset -> {path}")


def train(dataset_path: str, seed: int = 0, epochs: int = 10):
    import jax
    import jax.numpy as jnp

    from tianshou_tpu.algorithm.imitation.bcq import BCQ
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
    from tianshou_tpu.data.collector import DeviceCollector
    from tianshou_tpu.env.classic.pendulum import Pendulum
    from tianshou_tpu.env.core import VectorDeviceEnv
    from tianshou_tpu.models.continuous import ContinuousCritic, Perturbation, VAE
    from tianshou_tpu.trainer.trainer import OfflineTrainer, OfflineTrainerParams
    from tianshou_tpu.utils.persistence import load_d4rl_hdf5

    data, dstate = load_d4rl_hdf5(dataset_path)
    env = Pendulum()
    algo = BCQ(
        actor_perturbation=Perturbation(hidden_sizes=(64, 64), action_dim=1, max_action=1.0, phi=0.05),
        critic=ContinuousCritic(hidden_sizes=(64, 64)),
        vae=VAE(encoder_hidden=(64,), decoder_hidden=(64,), action_dim=1, latent_dim=2, max_action=1.0),
        action_space=env.action_space,
        actor_optim=AdamOptimizerFactory(lr=1e-3),
        critic_optim=AdamOptimizerFactory(lr=1e-3),
        vae_optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.99, tau=0.005, forward_sampled_times=20, num_sampled_action=10,
    )
    key = jax.random.key(seed)
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros(3))
    ec = DeviceCollector(VectorDeviceEnv(env, 10), algo, None)
    res = OfflineTrainer(algo, data, ec, OfflineTrainerParams(
        max_epochs=epochs, update_step_num_gradient_steps_per_epoch=500, batch_size=128,
    )).run(ts, dstate, key)
    print(f"offline BCQ from {dataset_path}: best_reward={res.best_reward:.1f}")
    return res


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="/tmp/pendulum_d4rl.hdf5")
    p.add_argument("--epochs", type=int, default=10)
    args = p.parse_args()
    if not _P(args.dataset).exists():
        make_dataset(args.dataset)
    train(args.dataset, epochs=args.epochs)
