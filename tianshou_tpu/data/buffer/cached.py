"""CachedReplayBuffer: per-env episode caches + one main buffer.

Rebuild of reference ``data/buffer/cached.py:7``: transitions accumulate in
per-env caches and whole episodes move into the main buffer when they
finish. On device the move is a masked bulk scatter: each cache is sized to
the episode-length bound, so a finished episode occupies a static-shape
prefix that is written into the main ring in one vectorized operation per
env (fori over the small env axis).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import AddInfo, BufferState, ReplayBuffer

__all__ = ["CachedReplayBuffer", "CachedState"]


class CachedState(NamedTuple):
    main: BufferState
    cache: BufferState


class CachedReplayBuffer:
    def __init__(self, main_size: int, num_envs: int, max_episode_len: int, **kwargs) -> None:
        self.main = ReplayBuffer(main_size, num_envs=1, **kwargs)
        self.cache = ReplayBuffer(max_episode_len * num_envs, num_envs=num_envs, **kwargs)
        self.num_envs = num_envs
        self.max_episode_len = self.cache.capacity

    def init(self, example: Batch) -> CachedState:
        return CachedState(self.main.init(example), self.cache.init(example))

    def add(self, state: CachedState, transitions: Batch, mask: jnp.ndarray | None = None) -> tuple[CachedState, AddInfo]:
        cache, info = self.cache.add(state.cache, transitions, mask)
        main = state.main
        L = self.max_episode_len
        C = self.main.capacity

        def move_env(e, main):
            done = info.done[e]
            # episode occupies slots [0, ep_len). An episode of exactly
            # max_episode_len fills the cache ring, wrapping the cursor back
            # to 0 on its final add — use the saturated size in that case or
            # the full episode would be dropped.
            cur = cache.cursor[e]
            ep_len = jnp.where((cur == 0) & (cache.size[e] > 0), cache.size[e], cur)
            mc = main.cursor[0]
            offsets = jnp.arange(L)
            valid = (offsets < ep_len) & done
            dst = jnp.where(valid, (mc + offsets) % C, C)  # C = drop

            def write(store, src):
                return store.at[0, dst].set(src[e, :L], mode="drop")

            data = jax.tree.map(write, main.data, cache.data)
            n = jnp.where(done, ep_len, 0)
            return BufferState(
                data=data,
                cursor=(main.cursor + n) % C,
                size=jnp.minimum(main.size + n, C),
                last_idx=jnp.where(done, (mc + jnp.maximum(ep_len, 1) - 1) % C, main.last_idx),
            )

        main = jax.lax.fori_loop(0, self.num_envs, move_env, main)
        # reset caches of finished episodes
        cache = cache._replace(
            cursor=jnp.where(info.done, 0, cache.cursor),
            size=jnp.where(info.done, 0, cache.size),
        )
        return CachedState(main, cache), info

    # sampling draws from the main buffer only (finished episodes)
    def sample(self, state: CachedState, key: jax.Array, batch_size: int, drop_keys: tuple[str, ...] = ()):
        return self.main.sample(state.main, key, batch_size, drop_keys=drop_keys)

    def sample_indices(self, state: CachedState, key: jax.Array, batch_size: int):
        return self.main.sample_indices(state.main, key, batch_size)

    def get(self, state: CachedState, idx, stack_num=None, keys=None, drop_keys=()):
        return self.main.get(state.main, idx, stack_num, keys=keys, drop_keys=drop_keys)

    def num_stored(self, state: CachedState) -> jnp.ndarray:
        return state.main.size.sum()
