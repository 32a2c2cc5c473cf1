"""CachedReplayBuffer battery, mirroring reference test/base/test_buffer.py
``test_cachedbuffer`` (:973): per-env episode caches feed one main buffer,
whole episodes move on termination, unfinished episodes never leak into
sampling, and the main ring wraps correctly under episode-granularity
writes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.cached import CachedReplayBuffer


def example():
    return Batch(
        obs=jnp.float32(0),
        act=jnp.int32(0),
        rew=jnp.float32(0),
        terminated=jnp.bool_(False),
        truncated=jnp.bool_(False),
        obs_next=jnp.float32(0),
    )


def tr(obs_per_env, done_per_env):
    obs = jnp.asarray(obs_per_env, jnp.float32)
    E = obs.shape[0]
    return Batch(
        obs=obs,
        act=jnp.zeros(E, jnp.int32),
        rew=obs * 0.1,
        terminated=jnp.asarray(done_per_env, bool),
        truncated=jnp.zeros(E, bool),
        obs_next=obs + 1,
    )


def test_exact_max_length_episode_is_not_lost():
    """An episode of exactly max_episode_len fills its cache ring completely,
    so the cache cursor wraps back to 0 on the final add — the move must use
    the cache *size*, not the wrapped cursor, as the episode length."""
    buf = CachedReplayBuffer(main_size=16, num_envs=1, max_episode_len=4)
    state = buf.init(example())
    add = jax.jit(buf.add)
    for i, done in [(0, False), (1, False), (2, False), (3, True)]:
        state, info = add(state, tr([float(i)], [done]))
    assert int(state.main.size[0]) == 4
    np.testing.assert_allclose(np.asarray(state.main.data.obs[0, :4]), [0, 1, 2, 3])
    assert int(state.cache.cursor[0]) == 0 and int(state.cache.size[0]) == 0


def test_unfinished_episodes_never_sampled():
    buf = CachedReplayBuffer(main_size=16, num_envs=2, max_episode_len=8)
    state = buf.init(example())
    add = jax.jit(buf.add)
    # env0 finishes a 2-step episode (obs 0,1); env1 stays mid-episode (100..)
    for i, done in [(0, False), (1, True)]:
        state, _ = add(state, tr([float(i), 100.0 + i], [done, False]))
    idx = buf.sample_indices(state, jax.random.key(0), 256)
    batch, _ = buf.sample(state, jax.random.key(1), 256)
    assert set(np.unique(np.asarray(batch.obs))) <= {0.0, 1.0}
    assert np.asarray(idx).max() < 2  # only the two moved slots exist


def test_simultaneous_finish_packs_both_episodes():
    buf = CachedReplayBuffer(main_size=16, num_envs=2, max_episode_len=8)
    state = buf.init(example())
    add = jax.jit(buf.add)
    # both envs run 3 steps and finish on the same add call
    for i, done in [(0, False), (1, False), (2, True)]:
        state, _ = add(state, tr([float(i), 10.0 + i], [done, done]))
    assert int(state.main.size[0]) == 6
    got = np.asarray(state.main.data.obs[0, :6])
    # episodes are contiguous, one after the other (env order within the call)
    assert list(got[:3]) == [0, 1, 2] and list(got[3:]) == [10, 11, 12]


def test_main_ring_wraps_at_episode_granularity():
    buf = CachedReplayBuffer(main_size=4, num_envs=1, max_episode_len=4)
    state = buf.init(example())
    add = jax.jit(buf.add)
    # three 2-step episodes into a 4-slot main: third overwrites the first
    for base in (0.0, 10.0, 20.0):
        for j, done in [(0, False), (1, True)]:
            state, _ = add(state, tr([base + j], [done]))
    assert int(state.main.size[0]) == 4
    np.testing.assert_allclose(np.asarray(state.main.data.obs[0]), [20, 21, 10, 11])


def test_cache_isolation_across_envs():
    buf = CachedReplayBuffer(main_size=16, num_envs=3, max_episode_len=8)
    state = buf.init(example())
    add = jax.jit(buf.add)
    # only env1 finishes; env0/env2 keep caching
    state, _ = add(state, tr([1.0, 2.0, 3.0], [False, True, False]))
    assert int(state.main.size[0]) == 1
    assert float(state.main.data.obs[0, 0]) == 2.0
    np.testing.assert_array_equal(np.asarray(state.cache.cursor), [1, 0, 1])


def test_done_flag_reported_on_done():
    """AddInfo.done marks the finishing env (ep_returns/ep_lens are filled
    by the collector, not by raw buffer adds — base.py:148)."""
    buf = CachedReplayBuffer(main_size=16, num_envs=1, max_episode_len=8)
    state = buf.init(example())
    add = jax.jit(buf.add)
    infos = []
    for i, done in [(0, False), (1, False), (2, True)]:
        state, info = add(state, tr([float(i)], [done]))
        infos.append(info)
    assert not bool(infos[0].done[0]) and not bool(infos[1].done[0])
    assert bool(infos[2].done[0])


def test_rewards_and_done_flags_move_with_episode():
    buf = CachedReplayBuffer(main_size=8, num_envs=1, max_episode_len=4)
    state = buf.init(example())
    add = jax.jit(buf.add)
    for i, done in [(5, False), (6, True)]:
        state, _ = add(state, tr([float(i)], [done]))
    np.testing.assert_allclose(np.asarray(state.main.data.rew[0, :2]), [0.5, 0.6])
    np.testing.assert_array_equal(np.asarray(state.main.data.terminated[0, :2]), [False, True])
    np.testing.assert_allclose(np.asarray(state.main.data.obs_next[0, :2]), [6, 7])


def test_stack_through_cached_main_respects_episode_boundaries():
    """Frame-stacked get() through the cached buffer (reference
    test_multibuf_stack, test/base/test_buffer.py:1137): episodes from
    different envs pack back-to-back in the main ring, and stacks must
    clamp at each episode head instead of leaking into the neighbor."""
    buf = CachedReplayBuffer(main_size=8, num_envs=2, max_episode_len=4, stack_num=2)
    state = buf.init(example())
    add = jax.jit(buf.add)
    # env0 runs a 3-step episode, env1 a 2-step episode finishing first
    state, _ = add(state, tr([0.0, 50.0], [False, False]))
    state, _ = add(state, tr([1.0, 51.0], [False, True]))   # env1 episode -> main
    state, _ = add(state, tr([2.0, 60.0], [True, False]))   # env0 episode -> main
    np.testing.assert_array_equal(
        np.asarray(state.main.data.obs[0, :5]), [50, 51, 0, 1, 2]
    )
    got = buf.get(state, jnp.arange(5))
    assert got.obs.shape == (5, 2)
    np.testing.assert_array_equal(
        np.asarray(got.obs),
        [[50, 50],   # head of env1 episode clamps
         [50, 51],
         [0, 0],     # head of env0 episode clamps (no [51, 0] leak)
         [0, 1],
         [1, 2]],
    )


def test_cached_sampled_stack_never_crosses_episodes():
    """Sampling with stack_num>1 from the cached main ring only ever
    returns stacks whose frames share one episode."""
    buf = CachedReplayBuffer(main_size=16, num_envs=2, max_episode_len=4, stack_num=3)
    state = buf.init(example())
    add = jax.jit(buf.add)
    base = 0.0
    for step in range(12):  # many short episodes with distinct obs ranges
        done0 = step % 3 == 2
        done1 = step % 4 == 3
        state, _ = add(state, tr([base + step, 100.0 + base + step], [done0, done1]))
    batch, _ = buf.sample(state, jax.random.key(0), 64)
    stacks = np.asarray(batch.obs)  # [64, 3] oldest->newest
    assert stacks.shape == (64, 3)
    # frames within one stack are same-episode: same 100s-block and
    # non-decreasing with step gaps of 0 or 1 (clamped heads repeat)
    blocks = stacks // 100
    assert (blocks == blocks[:, :1]).all()
    diffs = np.diff(stacks, axis=1)
    assert ((diffs == 0) | (diffs == 1)).all()
