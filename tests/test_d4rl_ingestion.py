"""External d4rl-format dataset ingestion (reference
examples/offline/utils.py:10-33 load_buffer_d4rl / load_buffer): a synthetic
HDF5 file in the exact d4rl qlearning_dataset layout is loaded into a device
buffer, episode boundaries must be respected by the index chain, and an
offline algorithm must train from it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from tianshou_tpu.utils.persistence import buffer_from_d4rl, load_d4rl_hdf5


def _write_dataset(path, n=200, obs_dim=3, act_dim=1, seed=0):
    rng = np.random.default_rng(seed)
    terminals = np.zeros(n, bool)
    terminals[49::50] = True  # 50-step episodes
    timeouts = np.zeros(n, bool)
    timeouts[75] = True  # a mid-episode timeout
    timeouts[99] = True  # and one coinciding with a terminal (terminals win)
    data = {
        "observations": rng.standard_normal((n, obs_dim)).astype(np.float32),
        "actions": rng.uniform(-1, 1, (n, act_dim)).astype(np.float32),
        "rewards": rng.standard_normal(n).astype(np.float32),
        "terminals": terminals,
        "timeouts": timeouts,
        "next_observations": rng.standard_normal((n, obs_dim)).astype(np.float32),
    }
    with h5py.File(path, "w") as f:
        for k, v in data.items():
            f.create_dataset(k, data=v)
    return data


def test_load_d4rl_hdf5_roundtrip(tmp_path):
    path = tmp_path / "toy_d4rl.hdf5"
    data = _write_dataset(path)
    buf, state = load_d4rl_hdf5(str(path))

    assert int(buf.num_stored(state)) == 200
    np.testing.assert_allclose(np.asarray(state.data.obs[0]), data["observations"])
    np.testing.assert_allclose(np.asarray(state.data.act[0]), data["actions"])
    np.testing.assert_allclose(np.asarray(state.data.rew[0]), data["rewards"])
    np.testing.assert_array_equal(np.asarray(state.data.terminated[0]), data["terminals"])
    # timeouts at a terminal step must not double-mark truncation
    assert not bool(state.data.truncated[0][49])
    assert not bool(state.data.truncated[0][99])
    assert bool(state.data.truncated[0][75])

    # episode boundaries: next() must not cross a terminal
    nxt = buf.next(state, jnp.asarray([48, 49, 50]))
    np.testing.assert_array_equal(np.asarray(nxt), [49, 49, 51])

    batch, idx = buf.sample(state, jax.random.key(0), 64)
    assert batch.obs.shape == (64, 3) and batch.obs_next.shape == (64, 3)
    np.testing.assert_allclose(
        np.asarray(batch.obs), data["observations"][np.asarray(idx)]
    )


def test_buffer_from_d4rl_dict_without_timeouts():
    rng = np.random.default_rng(1)
    n = 50
    d = {
        "observations": rng.standard_normal((n, 2)).astype(np.float32),
        "actions": rng.standard_normal((n, 1)).astype(np.float32),
        "rewards": np.ones(n, np.float32),
        "terminals": (rng.random(n) < 0.1),
        "next_observations": rng.standard_normal((n, 2)).astype(np.float32),
    }
    buf, state = buffer_from_d4rl(d)
    assert int(buf.num_stored(state)) == n
    assert not bool(np.asarray(state.data.truncated).any())


def test_offline_cql_trains_from_d4rl_file(tmp_path):
    """A few CQL gradient steps straight off the ingested file."""
    from tianshou_tpu.algorithm.imitation.cql import CQL
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
    from tianshou_tpu.env.core import Box
    from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, ContinuousCritic

    path = tmp_path / "toy_d4rl.hdf5"
    _write_dataset(path)
    buf, state = load_d4rl_hdf5(str(path))
    algo = CQL(
        actor=ContinuousActorProbabilistic(hidden_sizes=(32, 32), action_dim=1, conditioned_sigma=True),
        critic=ContinuousCritic(hidden_sizes=(32, 32)),
        action_space=Box(low=-1, high=1, shape=(1,)),
        policy_optim=AdamOptimizerFactory(lr=3e-4),
        critic_optim=AdamOptimizerFactory(lr=3e-4),
    )
    key = jax.random.key(0)
    ts = algo.init(key, jnp.zeros(3))
    step = jax.jit(lambda ts, bs, k: algo.update(ts, buf, bs, k, 32))
    for i in range(3):
        key, k = jax.random.split(key)
        ts, state, stats = step(ts, state, k)
    assert np.isfinite(float(jax.tree.leaves(stats)[0]))
