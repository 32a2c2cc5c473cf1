"""NChain: classic exploration chain (Strens 2000), integer observations —
the PSRL test env (reference examples/modelbased/psrl uses NChain-v0)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.env.core import Box, Discrete, Env, EnvStep


class NChainState(NamedTuple):
    pos: jnp.ndarray
    t: jnp.ndarray


class NChain(Env):
    max_episode_steps = 100

    def __init__(self, n: int = 5, slip: float = 0.2, small: float = 2.0, large: float = 10.0,
                 max_episode_steps: int = 100) -> None:
        self.n = n
        self.slip = slip
        self.small = small
        self.large = large
        self.max_episode_steps = max_episode_steps
        self.observation_space = Box(low=[0.0], high=[float(n - 1)])
        self.action_space = Discrete(2)

    def _obs(self, s: NChainState) -> jnp.ndarray:
        return s.pos.astype(jnp.float32)[None]

    def reset(self, key: jax.Array):
        s = NChainState(jnp.int32(0), jnp.int32(0))
        return s, self._obs(s)

    def step(self, state: NChainState, action: jnp.ndarray, key: jax.Array) -> EnvStep:
        slipped = jax.random.uniform(key) < self.slip
        act = jnp.where(slipped, 1 - action, action)
        forward = act == 0
        at_end = state.pos == self.n - 1
        pos = jnp.where(forward, jnp.minimum(state.pos + 1, self.n - 1), 0)
        reward = jnp.where(
            forward, jnp.where(at_end, self.large, 0.0), self.small
        ).astype(jnp.float32)
        t = state.t + 1
        new = NChainState(pos.astype(jnp.int32), t)
        return EnvStep(
            state=new,
            obs=self._obs(new),
            reward=reward,
            terminated=jnp.bool_(False),
            truncated=t >= self.max_episode_steps,
            info=Batch(),
        )
