"""Pure-functional environment API — the device-native replacement for the
reference's process-based vector envs (``tianshou/env/venvs.py:25-473``).

An :class:`Env` is a static spec whose ``reset``/``step`` are pure functions
of explicit state and PRNG keys, so a batch of environments is just ``vmap``
and a rollout is ``lax.scan`` — no worker processes, no pipes. Auto-reset is
performed by the collector (so the true terminal ``obs_next`` stays visible,
matching the reference's buffer semantics, collector.py:857-1067).

Host Gymnasium envs are supported through the adapter in
``tianshou_tpu/env/venvs.py`` with the same step/reset 5-tuple contract.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Box", "Discrete", "MultiDiscrete", "Space", "EnvStep", "Env", "VectorDeviceEnv"]


# ---------------------------------------------------------------------------
# Space descriptors (replacing gymnasium.spaces on the device path;
# reference utils/space_info.py extracts the same fields from gym spaces)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Space:
    shape: tuple[int, ...]
    dtype: Any

    def sample(self, key: jax.Array) -> jnp.ndarray:
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Discrete(Space):
    n: int = 2

    def __init__(self, n: int) -> None:
        object.__setattr__(self, "n", int(n))
        object.__setattr__(self, "shape", ())
        object.__setattr__(self, "dtype", jnp.int32)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        return jax.random.randint(key, self.shape, 0, self.n, dtype=jnp.int32)


@dataclasses.dataclass(frozen=True)
class Box(Space):
    low: tuple = ()
    high: tuple = ()

    def __init__(self, low, high, shape: tuple[int, ...] | None = None, dtype=jnp.float32) -> None:
        low_arr = np.broadcast_to(np.asarray(low, np.float32), shape) if shape else np.asarray(low, np.float32)
        high_arr = np.broadcast_to(np.asarray(high, np.float32), shape) if shape else np.asarray(high, np.float32)
        object.__setattr__(self, "low", tuple(low_arr.ravel().tolist()))
        object.__setattr__(self, "high", tuple(high_arr.ravel().tolist()))
        object.__setattr__(self, "shape", tuple(low_arr.shape))
        object.__setattr__(self, "dtype", dtype)

    @property
    def low_arr(self) -> np.ndarray:
        return np.asarray(self.low, np.float32).reshape(self.shape)

    @property
    def high_arr(self) -> np.ndarray:
        return np.asarray(self.high, np.float32).reshape(self.shape)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        lo, hi = jnp.asarray(self.low_arr), jnp.asarray(self.high_arr)
        finite = jnp.isfinite(lo) & jnp.isfinite(hi)
        u = jax.random.uniform(key, self.shape)
        box = lo + u * (hi - lo)
        g = jax.random.normal(key, self.shape)
        return jnp.where(finite, box, g).astype(self.dtype)


@dataclasses.dataclass(frozen=True)
class MultiDiscrete(Space):
    nvec: tuple = ()

    def __init__(self, nvec) -> None:
        nv = tuple(int(x) for x in np.asarray(nvec).ravel())
        object.__setattr__(self, "nvec", nv)
        object.__setattr__(self, "shape", (len(nv),))
        object.__setattr__(self, "dtype", jnp.int32)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        u = jax.random.uniform(key, self.shape)
        return (u * jnp.asarray(self.nvec)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Env protocol
# ---------------------------------------------------------------------------


class EnvStep(NamedTuple):
    """Result of one env step: the gymnasium 5-tuple plus carried state."""

    state: Any
    obs: Any
    reward: jnp.ndarray
    terminated: jnp.ndarray
    truncated: jnp.ndarray
    info: Any  # Batch of fixed-shape arrays (device path)


class Env:
    """Base class for pure-function environments.

    Subclasses implement ``reset`` and ``step`` as pure functions; instances
    hold only static config and are safe to close over in jitted code.
    """

    observation_space: Space
    action_space: Space
    max_episode_steps: int | None = None  # wrapped via TimeLimit if set

    def reset(self, key: jax.Array) -> tuple[Any, Any]:
        raise NotImplementedError

    def step(self, state: Any, action: jnp.ndarray, key: jax.Array) -> EnvStep:
        raise NotImplementedError

    def carry_through_reset(self, old_state: Any, reset_state: Any) -> Any:
        """Merge persistent sub-state (e.g. obs-norm statistics) into a fresh
        reset state when the collector auto-resets a finished episode."""
        return reset_state

    # Optional per-env info schema (fixed shapes) so scan carries are static.
    def empty_info(self) -> Any:
        from tianshou_tpu.data.batch import Batch

        return Batch()

    @property
    def name(self) -> str:
        return type(self).__name__


class VectorDeviceEnv:
    """vmap-batched view over a pure Env: N identical envs on device.

    The analogue of the reference's ``DummyVectorEnv``/``SubprocVectorEnv``
    for on-device envs; stepping N envs is one fused XLA program instead of N
    processes (env/venvs.py:389-424, env/worker/subproc.py:77-140).
    """

    def __init__(self, env: Env, num_envs: int) -> None:
        self.env = env
        self.num_envs = num_envs
        self._reset = jax.vmap(env.reset)
        # an env may provide a natively-batched step (e.g. MujocoEnv's
        # fused Pallas physics, which needs the whole env batch in one
        # kernel rather than a vmapped per-env trace)
        batch_step = getattr(env, "batch_step", None)
        self._step = batch_step if batch_step is not None else jax.vmap(env.step)
        self.carry_through_reset = jax.vmap(env.carry_through_reset)

    @property
    def observation_space(self) -> Space:
        return self.env.observation_space

    @property
    def action_space(self) -> Space:
        return self.env.action_space

    def reset(self, key: jax.Array) -> tuple[Any, Any]:
        return self._reset(jax.random.split(key, self.num_envs))

    def step(self, states: Any, actions: jnp.ndarray, key: jax.Array) -> EnvStep:
        return self._step(states, actions, jax.random.split(key, self.num_envs))

    def __len__(self) -> int:
        return self.num_envs
