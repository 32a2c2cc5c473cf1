"""Host-collector index-exactness battery.

Port of the reference's core collector battery
(/root/reference/test/base/test_collector.py:94-390,944-1032) to the host
path: deterministic MoveToRight envs of VARIABLE sizes make every stored
obs/obs_next/rew/done value exactly predictable, across Dummy and Subproc
vector envs, n_step and n_episode modes, surplus-env masking, repeated
collect cycles, async partial-wait collection, and the error corner cases.

Layout note: the reference asserts flat buffer indices of its
ReplayBufferManager (one contiguous array, sub-buffer offsets); here the
equivalent storage is the ``[E, C, ...]`` per-env rings of
``VectorReplayBuffer``, so the assertions index ``state.data.<key>[env]``.
"""

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tianshou_tpu.algorithm.base import ActOut, Algorithm, TrainState
from tianshou_tpu.data.async_collector import AsyncHostCollector
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.data.host_collector import HostCollector
from tianshou_tpu.env.core import Discrete
from tianshou_tpu.env.venvs import DummyVectorEnv, SubprocVectorEnv


class MoveToRightGymEnv(gym.Env):
    """Host twin of the reference's MoveToRightEnv (test/base/env.py:12):
    obs == position, action 1 moves right, reward 1 exactly at the terminal
    step, episode length == size."""

    def __init__(self, size: int, sleep: float = 0.0, random_sleep: bool = False):
        self.size = size
        self.sleep = sleep
        self.random_sleep = random_sleep
        self.observation_space = gym.spaces.Box(low=0.0, high=float(size), shape=(1,))
        self.action_space = gym.spaces.Discrete(2)
        self.pos = 0

    def reset(self, seed=None, options=None):
        super().reset(seed=seed)
        self.pos = 0
        return np.array([0.0], np.float32), {"key": 1}

    def step(self, action):
        if self.sleep > 0:
            import time

            t = self.sleep * (np.random.rand() if self.random_sleep else 1.0)
            time.sleep(t)
        self.pos = min(self.pos + int(action), self.size)
        done = self.pos == self.size
        return (
            np.array([float(self.pos)], np.float32),
            1.0 if done else 0.0,
            done,
            False,
            {"key": 1},
        )


class MaxActionAlgo(Algorithm):
    """Deterministic action-1 policy (reference MaxActionPolicy)."""

    def __init__(self):
        super().__init__(action_space=Discrete(2))

    def init(self, key, obs_example):
        return TrainState(
            params={}, target_params={}, opt_state={}, hparams=Batch(),
            extra=Batch(), step=jnp.int32(0),
        )

    def forward(self, ts, obs, key, state=None, deterministic=False):
        return ActOut(act=jnp.ones(obs.shape[0], jnp.int32), state=state, info=Batch())

    def update_step(self, ts, batch, key):
        return ts, Batch()


def _example():
    return Batch(
        obs=jnp.zeros(1), act=jnp.int32(0), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False),
        obs_next=jnp.zeros(1),
    )


def _collector(venv, total_size=100):
    algo = MaxActionAlgo()
    ts = algo.init(jax.random.key(0), jnp.zeros(1))
    buf = VectorReplayBuffer(total_size=total_size, buffer_num=len(venv))
    coll = HostCollector(venv, algo, buf)
    coll.reset(seed=0)
    coll.reset_buffer(_example())
    return coll, ts


def _ring(coll, key, env):
    """Valid entries of env's ring, oldest-first (rings never wrap here)."""
    n = int(coll.buf_state.size[env])
    a = np.asarray(getattr(coll.buf_state.data, key)[env])[:n]
    return a[..., 0] if a.ndim == 2 else a


# ---------------------------------------------------------------------------
# single env: exact ring contents across n_step then n_episode collects
# (reference test_collector.py:100-150)
# ---------------------------------------------------------------------------
def test_single_env_exact_ring_contents():
    venv = DummyVectorEnv([lambda: MoveToRightGymEnv(size=2)])
    coll, ts = _collector(venv)
    stats = coll.collect(ts, jax.random.key(1), n_step=3)
    assert stats.n_collected_steps == 3
    # 0 -> 1, 1 -> 2 (done, reset), 0 -> 1
    np.testing.assert_allclose(_ring(coll, "obs", 0), [0, 1, 0])
    np.testing.assert_allclose(_ring(coll, "obs_next", 0), [1, 2, 1])
    np.testing.assert_allclose(_ring(coll, "rew", 0), [0, 1, 0])
    np.testing.assert_array_equal(_ring(coll, "done", 0), [False, True, False])
    assert stats.n_collected_episodes == 1
    np.testing.assert_allclose(stats.returns, [1.0])
    np.testing.assert_array_equal(stats.lens, [2])

    # continue WITHOUT reset: 3 more episodes from mid-episode state obs=1
    stats2 = coll.collect(ts, jax.random.key(2), n_episode=3)
    assert stats2.n_collected_episodes == 3
    np.testing.assert_allclose(stats2.returns, 1.0)
    # first episode completes the carried one (len 2), then two fresh len-2s
    np.testing.assert_array_equal(stats2.lens, [2, 2, 2])
    np.testing.assert_allclose(_ring(coll, "obs", 0), [0, 1, 0, 1, 0, 1, 0, 1])
    np.testing.assert_allclose(_ring(coll, "obs_next", 0), [1, 2, 1, 2, 1, 2, 1, 2])
    np.testing.assert_allclose(_ring(coll, "rew", 0), [0, 1, 0, 1, 0, 1, 0, 1])


# ---------------------------------------------------------------------------
# four variable-size envs, Dummy AND Subproc: n_step exact sharding, then
# n_episode with surplus-env deactivation (reference :157-230)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("venv_cls", [DummyVectorEnv, SubprocVectorEnv])
def test_four_envs_variable_sizes(venv_cls):
    sizes = [2, 3, 4, 5]
    venv = venv_cls([lambda s=s: MoveToRightGymEnv(size=s) for s in sizes])
    coll, ts = _collector(venv)
    try:
        stats = coll.collect(ts, jax.random.key(1), n_step=8)
        assert stats.n_collected_steps == 8
        # 2 lockstep vector steps: every env stored obs [0, 1]
        for e in range(4):
            np.testing.assert_allclose(_ring(coll, "obs", e), [0, 1])
        # only env 0 (size 2) finished an episode and was auto-reset
        assert stats.n_collected_episodes == 1
        np.testing.assert_allclose(_ring(coll, "rew", 0), [0, 1])
        np.testing.assert_allclose(_ring(coll, "rew", 1), [0, 0])

        # collect exactly 4 episodes: env i finishes after sizes[i]-2 more
        # steps (env 0 restarted); finished envs get DEACTIVATED once enough
        # episodes are in flight (surplus masking, reference collector.py:1049)
        stats2 = coll.collect(ts, jax.random.key(2), n_episode=4)
        assert stats2.n_collected_episodes == 4
        np.testing.assert_allclose(stats2.returns, 1.0)
        assert sorted(stats2.lens.tolist()) == [2, 3, 4, 5]
        # active-step accounting: 4 + 3 + 1 (envs deactivate as eps finish)
        assert stats2.n_collected_steps == 8
        # per-env rings hold pure 0..len-1 sequences back to back
        np.testing.assert_allclose(_ring(coll, "obs", 0), [0, 1, 0, 1])
        np.testing.assert_allclose(_ring(coll, "obs", 1), [0, 1, 2])
        np.testing.assert_allclose(_ring(coll, "obs", 2), [0, 1, 2, 3])
        np.testing.assert_allclose(_ring(coll, "obs", 3), [0, 1, 2, 3, 4])
        for e, size in enumerate(sizes):
            np.testing.assert_allclose(
                _ring(coll, "obs_next", e)[-size:], np.arange(1, size + 1)
            )
            rew = _ring(coll, "rew", e)
            assert rew[-1] == 1.0 and rew[:-1].sum() == (1.0 if e == 0 else 0.0)
    finally:
        venv.close()


def test_n_episode_exceeding_env_count():
    """7 episodes over 4 equal-size envs: lockstep finishes come in waves of
    4 then 3 (one env deactivated); step count is exactly 3*4 + 3*3."""
    venv = DummyVectorEnv([lambda: MoveToRightGymEnv(size=3) for _ in range(4)])
    coll, ts = _collector(venv)
    stats = coll.collect(ts, jax.random.key(1), n_episode=7)
    assert stats.n_collected_episodes == 7
    np.testing.assert_allclose(stats.returns, 1.0)
    np.testing.assert_array_equal(stats.lens, 3)
    assert stats.n_collected_steps == 21
    venv.close()


def test_n_episode_fewer_than_env_count_masks_surplus():
    """n_episode=2 over 4 envs: only 2 envs are active from the start
    (reference surplus-env removal) — the other rings stay empty."""
    venv = DummyVectorEnv([lambda: MoveToRightGymEnv(size=3) for _ in range(4)])
    coll, ts = _collector(venv)
    stats = coll.collect(ts, jax.random.key(1), n_episode=2)
    assert stats.n_collected_episodes == 2
    assert stats.n_collected_steps == 6
    assert int(coll.buf_state.size[0]) == 3
    assert int(coll.buf_state.size[1]) == 3
    assert int(coll.buf_state.size[2]) == 0
    assert int(coll.buf_state.size[3]) == 0
    venv.close()


def test_repeated_collect_cycles_keep_rings_pure():
    """Iterated n_episode then n_step cycles (reference :314-390): after
    every cycle each env ring holds only back-to-back 0..len-1 sequences."""
    sizes = [2, 3, 4, 5]
    venv = DummyVectorEnv([lambda s=s: MoveToRightGymEnv(size=s) for s in sizes])
    coll, ts = _collector(venv, total_size=400)
    key = jax.random.key(0)
    for n_episode in range(1, 8):
        key, k = jax.random.split(key)
        stats = coll.collect(ts, k, n_episode=n_episode)
        assert stats.n_collected_episodes == n_episode
    for n_step in range(1, 12):
        key, k = jax.random.split(key)
        stats = coll.collect(ts, k, n_step=n_step)
        assert stats.n_collected_steps >= n_step
    for e, size in enumerate(sizes):
        obs = _ring(coll, "obs", e)
        obs_next = _ring(coll, "obs_next", e)
        done = _ring(coll, "done", e)
        np.testing.assert_allclose(obs_next, obs + 1)
        # positions only ever advance by one or wrap to 0 at a done flag
        steps = np.diff(obs)
        wraps = np.where(steps != 1)[0]
        np.testing.assert_allclose(obs[wraps + 1], 0)
        np.testing.assert_array_equal(np.asarray(done[:-1])[steps != 1], True)
        # every done row is at position size-1 with reward 1
        np.testing.assert_allclose(obs[np.asarray(done)], size - 1)
        np.testing.assert_allclose(_ring(coll, "rew", e)[np.asarray(done)], 1.0)
    venv.close()


# ---------------------------------------------------------------------------
# corner cases (reference :237-243)
# ---------------------------------------------------------------------------
def test_collector_corner_cases():
    venv = DummyVectorEnv([lambda: MoveToRightGymEnv(size=3) for _ in range(4)])
    algo = MaxActionAlgo()
    ts = algo.init(jax.random.key(0), jnp.zeros(1))
    # buffer env-count mismatch is rejected at construction
    with pytest.raises(ValueError):
        HostCollector(venv, algo, VectorReplayBuffer(total_size=100, buffer_num=1))
    coll, ts = _collector(venv)
    with pytest.raises(AssertionError):
        coll.collect(ts, jax.random.key(1))  # neither n_step nor n_episode
    with pytest.raises(AssertionError):
        coll.collect(ts, jax.random.key(1), n_step=3, n_episode=2)  # both
    venv.close()


def test_reset_before_collect_restarts_episodes():
    venv = DummyVectorEnv([lambda: MoveToRightGymEnv(size=4) for _ in range(2)])
    coll, ts = _collector(venv)
    coll.collect(ts, jax.random.key(1), n_step=3)  # leave envs mid-episode
    stats = coll.collect(ts, jax.random.key(2), n_episode=2, reset_before_collect=True)
    # fresh reset: both episodes are full length, not carried remnants
    np.testing.assert_array_equal(stats.lens, 4)
    venv.close()


def test_collect_random_uses_action_space():
    venv = DummyVectorEnv([lambda: MoveToRightGymEnv(size=3) for _ in range(2)])
    coll, ts = _collector(venv)
    stats = coll.collect(ts, jax.random.key(1), n_step=10, random=True)
    assert stats.n_collected_steps >= 10
    acts = np.concatenate([_ring(coll, "act", e) for e in range(2)])
    assert set(np.unique(acts)).issubset({0, 1})
    venv.close()


# ---------------------------------------------------------------------------
# dict observations through the host path (reference :391-529)
# ---------------------------------------------------------------------------
class DictObsEnv(gym.Env):
    def __init__(self, size=3):
        self.size = size
        self.observation_space = gym.spaces.Dict(
            {"index": gym.spaces.Box(0.0, float(size), shape=(1,)),
             "rank": gym.spaces.Box(0.0, 10.0, shape=(2,))}
        )
        self.action_space = gym.spaces.Discrete(2)
        self.pos = 0

    def _obs(self):
        return {"index": np.array([float(self.pos)], np.float32),
                "rank": np.full(2, float(self.pos), np.float32)}

    def reset(self, seed=None, options=None):
        self.pos = 0
        return self._obs(), {}

    def step(self, action):
        self.pos = min(self.pos + int(action), self.size)
        done = self.pos == self.size
        return self._obs(), float(done), done, False, {}


def test_collector_with_dict_state_host():
    venv = DummyVectorEnv([lambda: DictObsEnv(size=3) for _ in range(2)])
    algo = MaxActionAlgo()
    ts = algo.init(jax.random.key(0), jnp.zeros(1))

    # dict-obs policies act on obs["index"]
    class DictAlgo(MaxActionAlgo):
        def forward(self, ts, obs, key, state=None, deterministic=False):
            return ActOut(
                act=jnp.ones(obs["index"].shape[0], jnp.int32), state=state, info=Batch()
            )

    algo = DictAlgo()
    buf = VectorReplayBuffer(total_size=100, buffer_num=2)
    coll = HostCollector(venv, algo, buf)
    coll.reset(seed=0)
    coll.reset_buffer(
        Batch(
            obs=Batch(index=jnp.zeros(1), rank=jnp.zeros(2)),
            act=jnp.int32(0), rew=jnp.float32(0),
            terminated=jnp.bool_(False), truncated=jnp.bool_(False),
            obs_next=Batch(index=jnp.zeros(1), rank=jnp.zeros(2)),
        )
    )
    stats = coll.collect(ts, jax.random.key(1), n_episode=3)
    assert stats.n_collected_episodes == 3
    np.testing.assert_array_equal(stats.lens, 3)
    obs_idx = np.asarray(coll.buf_state.data.obs.index[0, :3, 0])
    np.testing.assert_allclose(obs_idx, [0, 1, 2])
    rank = np.asarray(coll.buf_state.data.obs.rank[0, :3])
    np.testing.assert_allclose(rank[:, 0], obs_idx)
    venv.close()


# ---------------------------------------------------------------------------
# async collector: iterated n_step AND n_episode cycles keep per-env rings
# pure under partial-wait scheduling (reference TestAsyncCollector :276-390)
# ---------------------------------------------------------------------------
def _async_collector(sizes, wait_num):
    venv = SubprocVectorEnv(
        [lambda s=s: MoveToRightGymEnv(size=s, sleep=0.002, random_sleep=True)
         for s in sizes],
        wait_num=wait_num,
    )
    algo = MaxActionAlgo()
    ts = algo.init(jax.random.key(0), jnp.zeros(1))
    buf = VectorReplayBuffer(total_size=60 * len(sizes), buffer_num=len(sizes))
    coll = AsyncHostCollector(venv, algo, buf)
    coll.reset(seed=0)
    coll.reset_buffer(_example())
    return venv, coll, ts


def _check_async_rings(coll, sizes):
    """Ring purity: every env ring holds exactly the 0..len-1 walk, with
    reward 1 and done at the terminal rows only (the layout-equivalent of the
    reference's buf.obs[indices] == seq assertions)."""
    for e, size in enumerate(sizes):
        n = int(coll.buf_state.size[e])
        if n == 0:
            continue
        obs = np.asarray(coll.buf_state.data.obs[e, :n, 0])
        obs_next = np.asarray(coll.buf_state.data.obs_next[e, :n, 0])
        done = np.asarray(coll.buf_state.data.done[e, :n])
        rew = np.asarray(coll.buf_state.data.rew[e, :n])
        np.testing.assert_allclose(obs, np.arange(n) % size)
        np.testing.assert_allclose(obs_next, obs + 1)
        np.testing.assert_array_equal(done, obs == size - 1)
        np.testing.assert_allclose(rew, (obs == size - 1).astype(float))


def test_async_collector_n_step_cycles():
    sizes = [2, 3, 4, 5]
    venv, coll, ts = _async_collector(sizes, wait_num=3)
    try:
        key = jax.random.key(7)
        total = 0
        for n_step in range(1, 10):
            key, k = jax.random.split(key)
            stats = coll.collect(ts, k, n_step=n_step)
            assert stats.n_collected_steps >= n_step
            total += stats.n_collected_steps
            _check_async_rings(coll, sizes)
        assert int(coll.buf_state.size.sum()) == total
    finally:
        venv.close()


def test_async_collector_n_episode_cycles():
    sizes = [2, 3, 4, 5]
    venv, coll, ts = _async_collector(sizes, wait_num=3)
    try:
        key = jax.random.key(11)
        for n_episode in range(1, 6):
            key, k = jax.random.split(key)
            stats = coll.collect(ts, k, n_episode=n_episode)
            assert stats.n_collected_episodes >= n_episode
            # episode stats must be consistent with the deterministic envs
            assert set(stats.lens.tolist()).issubset(set(sizes))
            np.testing.assert_allclose(stats.returns, 1.0)
            _check_async_rings(coll, sizes)
    finally:
        venv.close()


def test_async_collector_without_argument_gives_error():
    sizes = [2, 3]
    venv, coll, ts = _async_collector(sizes, wait_num=1)
    try:
        with pytest.raises(AssertionError):
            coll.collect(ts, jax.random.key(1))
    finally:
        venv.close()
