"""Exploration noise processes (reference tianshou/exploration/random.py):
``GaussianNoise`` (:20) and ``OUNoise`` (:35). Stateless sampling from
explicit keys; OU carries its state explicitly."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["GaussianNoise", "OUNoise"]


@dataclasses.dataclass(frozen=True)
class GaussianNoise:
    mu: float = 0.0
    sigma: float = 1.0

    def sample(self, key: jax.Array, shape: tuple[int, ...]) -> jnp.ndarray:
        return self.mu + self.sigma * jax.random.normal(key, shape)


@dataclasses.dataclass(frozen=True)
class OUNoise:
    """Ornstein-Uhlenbeck process; ``x`` is the carried state (zeros to start)."""

    mu: float = 0.0
    sigma: float = 0.3
    theta: float = 0.15
    dt: float = 1e-2
    x0: float = 0.0

    def init(self, shape: tuple[int, ...]) -> jnp.ndarray:
        return jnp.full(shape, self.x0)

    def step(self, x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        dw = jax.random.normal(key, x.shape) * jnp.sqrt(self.dt)
        return x + self.theta * (self.mu - x) * self.dt + self.sigma * dw

    def sample(self, key: jax.Array, shape: tuple[int, ...]) -> jnp.ndarray:
        # stateless fallback: one OU step from x0
        return self.step(jnp.full(shape, self.x0), key)
