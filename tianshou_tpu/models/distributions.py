"""Probability distributions as pytree structs.

The reference relies on ``torch.distributions`` objects stored inside Batches
(with bespoke slicing support, data/batch.py:265 ``get_sliced_dist``). Here
distributions are ``flax.struct`` dataclasses — plain pytrees — so they flow
through jit/scan/vmap and slice like any other Batch leaf for free.

TanhNormal reproduces the reference's squashed-Gaussian log-prob correction
(modelfree/sac.py:25-39) in a numerically stable softplus form.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ["Categorical", "MaskedCategorical", "Normal", "TanhNormal"]

# plain float: module-level jnp ops would initialize the XLA backend at
# import time, breaking jax.distributed.initialize (must run first)
_HALF_LOG_2PI = 0.5 * math.log(2 * math.pi)


@struct.dataclass
class Categorical:
    logits: jnp.ndarray  # [..., n]

    def sample(self, key: jax.Array) -> jnp.ndarray:
        return jax.random.categorical(key, self.logits, axis=-1)

    def log_prob(self, value: jnp.ndarray) -> jnp.ndarray:
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        return jnp.take_along_axis(logp, value[..., None].astype(jnp.int32), axis=-1)[..., 0]

    def entropy(self) -> jnp.ndarray:
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        return -(jnp.exp(logp) * logp).sum(-1)

    def mode(self) -> jnp.ndarray:
        return jnp.argmax(self.logits, axis=-1)

    @property
    def probs(self) -> jnp.ndarray:
        return jax.nn.softmax(self.logits, axis=-1)

    def kl_divergence(self, other: "Categorical") -> jnp.ndarray:
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        logq = jax.nn.log_softmax(other.logits, axis=-1)
        return (jnp.exp(logp) * (logp - logq)).sum(-1)


def MaskedCategorical(logits: jnp.ndarray, mask: jnp.ndarray) -> Categorical:
    """Categorical with invalid actions masked out (MARL action masking,
    reference dqn.py:145 ``compute_q_value`` mask path)."""
    neg = jnp.finfo(logits.dtype).min
    return Categorical(logits=jnp.where(mask, logits, neg))


@struct.dataclass
class Normal:
    """Diagonal Gaussian; log_prob/entropy sum over the trailing event axis."""

    loc: jnp.ndarray
    scale: jnp.ndarray

    def sample(self, key: jax.Array) -> jnp.ndarray:
        return self.loc + self.scale * jax.random.normal(key, self.loc.shape, self.loc.dtype)

    def log_prob(self, value: jnp.ndarray) -> jnp.ndarray:
        z = (value - self.loc) / self.scale
        elem = -0.5 * z**2 - jnp.log(self.scale) - _HALF_LOG_2PI
        return elem.sum(-1)

    def entropy(self) -> jnp.ndarray:
        return (0.5 + _HALF_LOG_2PI + jnp.log(self.scale)).sum(-1)

    def mode(self) -> jnp.ndarray:
        return self.loc

    def kl_divergence(self, other: "Normal") -> jnp.ndarray:
        var_ratio = (self.scale / other.scale) ** 2
        t1 = ((self.loc - other.loc) / other.scale) ** 2
        return (0.5 * (var_ratio + t1 - 1 - jnp.log(var_ratio))).sum(-1)


@struct.dataclass
class TanhNormal:
    """tanh-squashed Gaussian with change-of-variables log-prob correction.

    ``log pi(a|s) = log N(u) - sum log(1 - tanh(u)^2)`` computed stably as
    ``2 * (log 2 - u - softplus(-2u))`` (reference sac.py:25-39).
    """

    loc: jnp.ndarray
    scale: jnp.ndarray

    def sample_and_log_prob(self, key: jax.Array) -> tuple[jnp.ndarray, jnp.ndarray]:
        u = self.loc + self.scale * jax.random.normal(key, self.loc.shape, self.loc.dtype)
        a = jnp.tanh(u)
        base = Normal(self.loc, self.scale)
        z = (u - self.loc) / self.scale
        log_base = (-0.5 * z**2 - jnp.log(self.scale) - _HALF_LOG_2PI).sum(-1)
        correction = (2.0 * (jnp.log(2.0) - u - jax.nn.softplus(-2.0 * u))).sum(-1)
        del base
        return a, log_base - correction

    def sample(self, key: jax.Array) -> jnp.ndarray:
        return self.sample_and_log_prob(key)[0]

    def log_prob(self, action: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
        u = jnp.arctanh(jnp.clip(action, -1 + eps, 1 - eps))
        z = (u - self.loc) / self.scale
        log_base = (-0.5 * z**2 - jnp.log(self.scale) - _HALF_LOG_2PI).sum(-1)
        correction = (2.0 * (jnp.log(2.0) - u - jax.nn.softplus(-2.0 * u))).sum(-1)
        return log_base - correction

    def mode(self) -> jnp.ndarray:
        return jnp.tanh(self.loc)
