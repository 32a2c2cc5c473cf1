"""Device env wrappers (reference env/gym_wrappers.py + venv_wrappers.py).

- ``ContinuousToDiscrete``: per-dim action discretization (gym_wrappers.py:8)
- ``MultiDiscreteToDiscrete``: flatten a MultiDiscrete space (:37)
- ``TruncatedAsTerminated``: fold truncation into termination (:61)
- ``NormObs``: running mean/std obs normalization as carried env state
  (venv_wrappers.py:69 VectorEnvNormObs; Welford update in utils/statistics)
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.env.core import Box, Discrete, Env, EnvStep, MultiDiscrete

__all__ = [
    "ContinuousToDiscrete", "MultiDiscreteToDiscrete", "TruncatedAsTerminated",
    "FrameStack", "NormObs", "RMSState", "merge_rms", "extract_pooled_rms", "inject_rms",
]


class ContinuousToDiscrete(Env):
    """Discretize each Box action dim into ``action_per_dim`` bins."""

    def __init__(self, env: Env, action_per_dim: int) -> None:
        assert isinstance(env.action_space, Box)
        self.env = env
        self.observation_space = env.observation_space
        self.max_episode_steps = env.max_episode_steps
        k = int(np.prod(env.action_space.shape))
        self.action_per_dim = action_per_dim
        self.action_space = MultiDiscrete([action_per_dim] * k)
        low, high = env.action_space.low_arr.ravel(), env.action_space.high_arr.ravel()
        # bin centers per dim: [k, action_per_dim]
        self._mesh = jnp.stack([jnp.linspace(lo, hi, action_per_dim) for lo, hi in zip(low, high)])

    def reset(self, key):
        return self.env.reset(key)

    def step(self, state, action, key):
        cont = jnp.take_along_axis(self._mesh, action.reshape(-1, 1).astype(jnp.int32), axis=1)[:, 0]
        cont = cont.reshape(self.env.action_space.shape)
        return self.env.step(state, cont, key)


class MultiDiscreteToDiscrete(Env):
    """Flatten MultiDiscrete([n1..nk]) into Discrete(prod n) (gym_wrappers.py:37)."""

    def __init__(self, env: Env) -> None:
        assert isinstance(env.action_space, MultiDiscrete)
        self.env = env
        self.observation_space = env.observation_space
        self.max_episode_steps = env.max_episode_steps
        nvec = np.asarray(env.action_space.nvec)
        self.bases = jnp.asarray(np.concatenate([np.cumprod(nvec[::-1])[::-1][1:], [1]]))
        self.nvec = jnp.asarray(nvec)
        self.action_space = Discrete(int(np.prod(nvec)))

    def reset(self, key):
        return self.env.reset(key)

    def step(self, state, action, key):
        multi = (action // self.bases) % self.nvec
        return self.env.step(state, multi.astype(jnp.int32), key)


class TruncatedAsTerminated(Env):
    """Report truncation as termination (gym_wrappers.py:61)."""

    def __init__(self, env: Env) -> None:
        self.env = env
        self.observation_space = env.observation_space
        self.action_space = env.action_space
        self.max_episode_steps = env.max_episode_steps

    def reset(self, key):
        return self.env.reset(key)

    def step(self, state, action, key):
        s = self.env.step(state, action, key)
        return s._replace(terminated=s.terminated | s.truncated, truncated=jnp.bool_(False))


class FrameStackState(NamedTuple):
    inner: Any
    frames: jnp.ndarray  # [n_frames, ...obs]


class FrameStack(Env):
    """Stack the last ``n_frames`` observations along a new leading axis
    (device analogue of the Atari FrameStack wrapper, atari_wrapper.py:278).
    Pair with a buffer using ``save_only_last_obs=True`` + ``stack_num`` so
    frames are stored once and re-stacked at sample time."""

    def __init__(self, env: Env, n_frames: int = 4) -> None:
        self.env = env
        self.n_frames = n_frames
        self.action_space = env.action_space
        self.max_episode_steps = env.max_episode_steps
        inner = env.observation_space
        self.observation_space = Box(
            low=0.0, high=1.0, shape=(n_frames,) + tuple(inner.shape)
        )

    def reset(self, key):
        s, obs = self.env.reset(key)
        frames = jnp.repeat(obs[None], self.n_frames, axis=0)
        return FrameStackState(s, frames), frames

    def step(self, state: FrameStackState, action, key):
        s = self.env.step(state.inner, action, key)
        frames = jnp.concatenate([state.frames[1:], s.obs[None]], axis=0)
        return s._replace(state=FrameStackState(s.state, frames), obs=frames)


class RMSState(NamedTuple):
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray


class NormObsState(NamedTuple):
    inner: Any
    rms: RMSState


class NormObs(Env):
    """Observation normalization with a running mean/std carried in env state.

    The parallel Welford update matches reference ``RunningMeanStd``
    (utils/statistics.py:69); set ``update_stats=False`` for eval envs and
    feed them the train env's rms (venv_wrappers.py:99).
    """

    def __init__(self, env: Env, clip: float = 10.0, update_stats: bool = True) -> None:
        self.env = env
        self.observation_space = env.observation_space
        self.action_space = env.action_space
        self.max_episode_steps = env.max_episode_steps
        self.clip = clip
        self.update_stats = update_stats

    def _norm(self, rms: RMSState, obs: jnp.ndarray) -> jnp.ndarray:
        return jnp.clip((obs - rms.mean) / jnp.sqrt(rms.var + 1e-8), -self.clip, self.clip)

    def _update(self, rms: RMSState, obs: jnp.ndarray) -> RMSState:
        # single-sample Welford (batched across envs via vmap outside)
        delta = obs - rms.mean
        count = rms.count + 1.0
        new_mean = rms.mean + delta / count
        m_a = rms.var * rms.count
        new_var = (m_a + delta * (obs - new_mean)) / count
        return RMSState(new_mean, new_var, count)

    def reset(self, key):
        s, obs = self.env.reset(key)
        rms = RMSState(jnp.zeros_like(obs), jnp.ones_like(obs), jnp.float32(1e-4))
        if self.update_stats:
            rms = self._update(rms, obs)
        return NormObsState(s, rms), self._norm(rms, obs)

    def step(self, state: NormObsState, action, key):
        s = self.env.step(state.inner, action, key)
        rms = self._update(state.rms, s.obs) if self.update_stats else state.rms
        return s._replace(state=NormObsState(s.state, rms), obs=self._norm(rms, s.obs))

    def carry_through_reset(self, old_state: NormObsState, reset_state: NormObsState) -> NormObsState:
        # obs-norm statistics persist across episode boundaries
        return NormObsState(reset_state.inner, old_state.rms)


def merge_rms(rms: RMSState) -> RMSState:
    """Pool per-env running statistics (leading env axis) into one global
    RMSState via parallel Welford merging — the shared-obs_rms semantics of
    the reference (venv_wrappers.py:99 updates ONE RunningMeanStd from all
    envs' observations)."""
    counts = rms.count  # [E]
    total = counts.sum()
    w = counts / total
    mean = (w[:, None] * rms.mean.reshape(counts.shape[0], -1)).sum(0).reshape(rms.mean.shape[1:])
    # law of total variance: E[var] + Var[mean]
    var_within = (w[:, None] * rms.var.reshape(counts.shape[0], -1)).sum(0)
    d = rms.mean.reshape(counts.shape[0], -1) - mean.reshape(1, -1)
    var_between = (w[:, None] * d * d).sum(0)
    var = (var_within + var_between).reshape(rms.var.shape[1:])
    return RMSState(mean, var, total)


def extract_pooled_rms(env, env_state) -> "RMSState | None":
    """If ``env`` is (a wrapper chain containing) NormObs, pool the
    per-env rms out of a VECTORIZED env state; else None."""
    e, s_path = env, []
    while not isinstance(e, NormObs):
        if not hasattr(e, "env"):
            return None
        s_path.append(e)
        e = e.env
    # NormObsState sits at the level where NormObs produced it
    state = env_state
    for _ in s_path:
        state = state.inner if hasattr(state, "inner") else state[0]
    assert isinstance(state, NormObsState), type(state)
    return merge_rms(state.rms)


def inject_rms(env, env_state, rms: RMSState):
    """Broadcast a pooled rms into every env slot of a VECTORIZED env state
    (the reference's frozen shared obs_rms handed to test envs)."""
    e = env
    while not isinstance(e, NormObs):
        if not hasattr(e, "env"):
            return env_state
        e = e.env

    def _walk(state):
        if isinstance(state, NormObsState):
            E = state.rms.count.shape[0]
            batched = RMSState(
                jnp.broadcast_to(rms.mean, (E,) + rms.mean.shape),
                jnp.broadcast_to(rms.var, (E,) + rms.var.shape),
                jnp.broadcast_to(rms.count, (E,)),
            )
            return NormObsState(state.inner, batched)
        if hasattr(state, "inner"):
            return state._replace(inner=_walk(state.inner))
        return state

    return _walk(env_state)
