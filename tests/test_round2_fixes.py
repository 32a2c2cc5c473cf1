"""Regression tests for the round-2 correctness fixes (ADVICE.md items +
VERDICT weak points): raw-action storage for random collection, frame-stacked
obs_next under ignore_obs_next, eps_inference at evaluation, per-env seed
spreading, empty-buffer sample clamping, PER-state HDF5 round-trip,
update/info logging wiring, ENABLE_VALIDATION NaN screening, exact-n
unbiased device episode collection."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import make_collectors, transition_example
from tianshou_tpu import config
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import ReplayBuffer, VectorReplayBuffer
from tianshou_tpu.data.buffer.prio import PrioritizedVectorReplayBuffer
from tianshou_tpu.utils.logger.base import BaseLogger


# ---------------------------------------------------------------------------
# buffer: ignore_obs_next + stack_num (ADVICE item 2)
# ---------------------------------------------------------------------------
def test_ignore_obs_next_framestack_shapes_match():
    buf = ReplayBuffer(size=20, num_envs=1, stack_num=4, ignore_obs_next=True)
    ex = Batch(
        obs=jnp.zeros(2), act=jnp.int32(0), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(2),
    )
    state = buf.init(ex)
    assert "obs_next" not in state.data
    # one long episode: obs[t] = [t, t]
    for t in range(10):
        tr = Batch(
            obs=jnp.full((1, 2), float(t)), act=jnp.zeros(1, jnp.int32),
            rew=jnp.ones(1), terminated=jnp.zeros(1, bool), truncated=jnp.zeros(1, bool),
        )
        state, _ = buf.add(state, tr)
    batch = buf.get(state, jnp.array([5]))
    # both obs and obs_next must be frame-stacked [B, stack, ...]
    assert batch.obs.shape == (1, 4, 2)
    assert batch.obs_next.shape == (1, 4, 2)
    np.testing.assert_array_equal(np.asarray(batch.obs[0, :, 0]), [2, 3, 4, 5])
    # obs_next = stack at next(index) = frames 3..6
    np.testing.assert_array_equal(np.asarray(batch.obs_next[0, :, 0]), [3, 4, 5, 6])


def test_ignore_obs_next_framestack_at_episode_end():
    buf = ReplayBuffer(size=20, num_envs=1, stack_num=3, ignore_obs_next=True)
    ex = Batch(
        obs=jnp.zeros(1), act=jnp.int32(0), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(1),
    )
    state = buf.init(ex)
    for t in range(5):
        tr = Batch(
            obs=jnp.full((1, 1), float(t)), act=jnp.zeros(1, jnp.int32),
            rew=jnp.ones(1), terminated=jnp.asarray([t == 4]), truncated=jnp.zeros(1, bool),
        )
        state, _ = buf.add(state, tr)
    batch = buf.get(state, jnp.array([4]))
    # at episode end next() clamps -> obs_next == obs stack (reference semantics)
    np.testing.assert_array_equal(np.asarray(batch.obs[0, :, 0]), [2, 3, 4])
    np.testing.assert_array_equal(np.asarray(batch.obs_next[0, :, 0]), [2, 3, 4])


# ---------------------------------------------------------------------------
# buffer: empty-buffer sampling is clamped in range (ADVICE item 5)
# ---------------------------------------------------------------------------
def test_empty_buffer_sample_indices_in_range():
    buf = VectorReplayBuffer(total_size=40, buffer_num=4)
    ex = Batch(
        obs=jnp.zeros(2), act=jnp.int32(0), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(2),
    )
    state = buf.init(ex)
    idx = buf.sample_indices(state, jax.random.key(0), 16)
    assert int(idx.max()) < buf.total_size and int(idx.min()) >= 0


# ---------------------------------------------------------------------------
# eps_inference applied at evaluation time (ADVICE item 3)
# ---------------------------------------------------------------------------
def test_eps_inference_applied_in_eval():
    from tianshou_tpu.algorithm.modelfree.dqn import DQN
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
    from tianshou_tpu.env.classic.cartpole import CartPole
    from tianshou_tpu.models.mlp import Net

    env = CartPole()
    algo = DQN(
        model=Net(hidden_sizes=(16,), output_dim=2),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=1e-3),
        eps_training=0.0,
        eps_inference=1.0,  # fully random at inference
    )
    ts = algo.init(jax.random.key(0), jnp.zeros(4))
    obs = jnp.zeros((256, 4))
    greedy = algo.forward(ts, obs, jax.random.key(1), deterministic=True).act
    noisy = algo.exploration_noise(ts, greedy, obs, jax.random.key(2), training=False)
    # eps_inference=1.0 -> ~half the actions flip away from the greedy one
    frac_changed = float((noisy != greedy).mean())
    assert 0.3 < frac_changed < 0.7
    # and training=True keeps eps_training=0.0 -> fully greedy
    same = algo.exploration_noise(ts, greedy, obs, jax.random.key(2), training=True)
    assert bool((same == greedy).all())


# ---------------------------------------------------------------------------
# host venv: scalar seed is spread per env (ADVICE item 4)
# ---------------------------------------------------------------------------
def test_host_venv_seed_spread():
    gym = pytest.importorskip("gymnasium")
    from tianshou_tpu.env.venvs import DummyVectorEnv

    venv = DummyVectorEnv([lambda: gym.make("CartPole-v1") for _ in range(4)])
    obs, _ = venv.reset(seed=7)
    # identical seeds would give identical initial observations
    assert not all(np.allclose(obs[0], obs[i]) for i in range(1, 4))
    venv.close()


# ---------------------------------------------------------------------------
# host collector: random=True stores raw-scale actions (ADVICE item 1)
# ---------------------------------------------------------------------------
def test_host_random_collect_stores_raw_actions():
    gym = pytest.importorskip("gymnasium")
    from tianshou_tpu.algorithm.modelfree.ddpg import DDPG
    from tianshou_tpu.data.host_collector import HostCollector
    from tianshou_tpu.env.venvs import DummyVectorEnv
    from tianshou_tpu.models.continuous import ContinuousActorDeterministic, ContinuousCritic

    env = gym.make("Pendulum-v1")  # action space [-2, 2]
    venv = DummyVectorEnv([lambda: gym.make("Pendulum-v1") for _ in range(2)])
    from tianshou_tpu.env.core import Box

    space = Box(low=env.action_space.low, high=env.action_space.high)
    algo = DDPG(
        actor=ContinuousActorDeterministic(hidden_sizes=(16,), action_dim=1),
        critic=ContinuousCritic(hidden_sizes=(16,)),
        action_space=space,
    )
    ts = algo.init(jax.random.key(0), jnp.zeros(3))
    buf = VectorReplayBuffer(total_size=64, buffer_num=2)
    coll = HostCollector(venv, algo, buf)
    coll.reset(seed=3)
    coll.buf_state = buf.init(
        Batch(obs=jnp.zeros(3), act=jnp.zeros(1), rew=jnp.float32(0),
              terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(3))
    )
    coll.collect(ts, jax.random.key(1), n_step=20, random=True)
    acts = np.asarray(coll.buf_state.data.act)
    stored = acts[np.asarray(coll.buf_state.data.rew) != 0]
    # env scale is [-2, 2]; raw scale is [-1, 1] — stored must be raw
    assert np.abs(stored).max() <= 1.0 + 1e-6
    venv.close()


# ---------------------------------------------------------------------------
# PER state HDF5 round-trip (VERDICT weak #7)
# ---------------------------------------------------------------------------
def test_prio_state_hdf5_roundtrip(tmp_path):
    from tianshou_tpu.utils.persistence import load_buffer_hdf5, save_buffer_hdf5

    buf = PrioritizedVectorReplayBuffer(total_size=32, buffer_num=2, alpha=0.5, beta=0.4)
    ex = Batch(
        obs=jnp.zeros(2), act=jnp.int32(0), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(2),
    )
    state = buf.init(ex)
    for t in range(5):
        tr = Batch(
            obs=jnp.full((2, 2), float(t)), act=jnp.zeros(2, jnp.int32),
            rew=jnp.ones(2) * t, terminated=jnp.zeros(2, bool), truncated=jnp.zeros(2, bool),
            obs_next=jnp.full((2, 2), float(t + 1)),
        )
        state, info = buf.add(state, tr)
    state = buf.update_weight(state, jnp.array([0, 1]), jnp.array([2.0, 0.5]))
    path = os.path.join(tmp_path, "prio.h5")
    save_buffer_hdf5(path, state)
    loaded = load_buffer_hdf5(path)
    assert type(loaded).__name__ == "PrioState"
    np.testing.assert_allclose(np.asarray(loaded.tree), np.asarray(state.tree))
    np.testing.assert_allclose(float(loaded.max_prio), float(state.max_prio))
    np.testing.assert_allclose(float(loaded.min_prio), float(state.min_prio))
    np.testing.assert_allclose(np.asarray(loaded.base.data.rew), np.asarray(state.base.data.rew))


# ---------------------------------------------------------------------------
# trainers: update + info scopes are live (VERDICT weak #2)
# ---------------------------------------------------------------------------
class RecordingLogger(BaseLogger):
    def __init__(self):
        super().__init__(train_interval=1, test_interval=1, update_interval=1, info_interval=1)
        self.writes: dict[str, list] = {}

    def write(self, step_type, step, data):
        self.writes.setdefault(step_type, []).append((step, data))


def test_update_and_info_logging_wired():
    from tianshou_tpu.algorithm.modelfree.dqn import DQN
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
    from tianshou_tpu.env.classic.cartpole import CartPole
    from tianshou_tpu.models.mlp import Net
    from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams

    env = CartPole()
    algo = DQN(
        model=Net(hidden_sizes=(16,), output_dim=2), action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=1e-3), eps_training=0.3,
    )
    key = jax.random.key(0)
    ts = algo.init(key, jnp.zeros(4))
    buffer = VectorReplayBuffer(total_size=2000, buffer_num=4)
    buf_state = buffer.init(transition_example(env))
    train_c, test_c = make_collectors(env, algo, buffer, n_train=4, n_test=4)
    logger = RecordingLogger()
    params = OffPolicyTrainerParams(
        max_epochs=1, epoch_num_steps=200, test_step_num_episodes=2,
        batch_size=32, collection_step_num_env_steps=10, update_per_step=0.05,
        start_steps=100, logger=logger, verbose=False,
    )
    trainer = OffPolicyTrainer(algo, train_c, test_c, buffer, params)
    trainer.run(ts, buf_state, jax.random.key(1))
    assert "update/gradient_step" in logger.writes, logger.writes.keys()
    upd = logger.writes["update/gradient_step"][0][1]
    assert any(k.startswith("update/loss") for k in upd), upd.keys()
    assert "info/epoch" in logger.writes
    info = logger.writes["info/epoch"][0][1]
    assert "timing/collect_time" in info and "info/gradient_step" in info


def test_onpolicy_update_logging_and_test_in_train():
    from tianshou_tpu.algorithm.modelfree.ppo import PPO
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
    from tianshou_tpu.env.classic.cartpole import CartPole
    from tianshou_tpu.models.discrete import DiscreteActor, DiscreteCritic
    from tianshou_tpu.trainer.trainer import OnPolicyTrainer, OnPolicyTrainerParams

    env = CartPole()
    algo = PPO(
        actor=DiscreteActor(hidden_sizes=(16,), action_dim=2),
        critic=DiscreteCritic(hidden_sizes=(16,)),
        action_space=env.action_space, optim=AdamOptimizerFactory(lr=3e-4),
    )
    ts = algo.init(jax.random.key(0), jnp.zeros(4))
    train_c, test_c = make_collectors(env, algo, None, n_train=4, n_test=4)
    logger = RecordingLogger()
    params = OnPolicyTrainerParams(
        max_epochs=1, epoch_num_steps=256, test_step_num_episodes=2,
        batch_size=64, collection_step_num_env_steps=32,
        update_step_num_repetitions=1, logger=logger, verbose=False,
        test_in_train=True, stop_fn=lambda r: r >= 10_000,  # never fires
    )
    trainer = OnPolicyTrainer(algo, train_c, test_c, params)
    result = trainer.run(ts, jax.random.key(1))
    assert "update/gradient_step" in logger.writes
    assert "info/epoch" in logger.writes
    assert result.timing["collect"] > 0 and result.timing["update"] > 0


# ---------------------------------------------------------------------------
# ENABLE_VALIDATION NaN screen (VERDICT weak #3)
# ---------------------------------------------------------------------------
def test_enable_validation_nan_screen():
    from tianshou_tpu.trainer.trainer import OffPolicyTrainerParams, _TrainerBase

    class Dummy(_TrainerBase):
        pass

    tr = Dummy(None, OffPolicyTrainerParams(verbose=False))
    bad = Batch(rew=jnp.array([1.0, jnp.nan]), done=jnp.array([False, True]))
    old = config.ENABLE_VALIDATION
    try:
        config.ENABLE_VALIDATION = False
        tr._validate_collect(bad)  # no-op when disabled
        config.ENABLE_VALIDATION = True
        with pytest.raises(ValueError, match="NaN"):
            tr._validate_collect(bad)
    finally:
        config.ENABLE_VALIDATION = old


# ---------------------------------------------------------------------------
# device collect_episodes: exact n with surplus-env masking (VERDICT weak #5)
# ---------------------------------------------------------------------------
def test_collect_episodes_exact_with_surplus_envs():
    from tests.test_collector import AlwaysRight
    from tianshou_tpu.data.collector import DeviceCollector
    from tianshou_tpu.env.core import VectorDeviceEnv
    from tianshou_tpu.env.testing import MoveToRightEnv

    env = MoveToRightEnv(size=5)
    algo = AlwaysRight(env.action_space)
    ts = algo.init(jax.random.key(0), jnp.zeros(1))
    # E=8 envs but only 3 episodes wanted: surplus envs must not contribute
    coll = DeviceCollector(VectorDeviceEnv(env, 8), algo, None)
    stats = coll.collect_episodes(ts, jax.random.key(1), n_episodes=3, chunk_steps=16)
    assert stats.n_collected_episodes == 3
    np.testing.assert_array_equal(stats.lens, 5)
    np.testing.assert_allclose(stats.returns, 1.0)


def test_collect_episodes_partial_warns():
    from tests.test_collector import AlwaysRight
    from tianshou_tpu.data.collector import DeviceCollector
    from tianshou_tpu.env.core import VectorDeviceEnv
    from tianshou_tpu.env.testing import MoveToRightEnv

    env = MoveToRightEnv(size=50)  # episodes need 50 steps
    algo = AlwaysRight(env.action_space)
    ts = algo.init(jax.random.key(0), jnp.zeros(1))
    coll = DeviceCollector(VectorDeviceEnv(env, 2), algo, None)
    with pytest.warns(UserWarning, match="max_chunks"):
        stats = coll.collect_episodes(
            ts, jax.random.key(1), n_episodes=2, chunk_steps=4, max_chunks=3
        )
    assert stats.n_collected_episodes < 2
