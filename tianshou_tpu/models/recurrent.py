"""Recurrent networks (reference utils/net/common.py:372 ``Recurrent``,
net/continuous.py:241 ``RecurrentActorProb``, :325 ``RecurrentCritic``).

Two call paths, matching the reference's dual use:
- training on frame-stacked samples: ``__call__(obs [B, L, O])`` scans the
  LSTM from a zero carry and returns the last-step output;
- acting: ``step(obs [B, O], carry)`` advances one step, the collector
  threads the carry and resets it on episode end (collector.py:1103-1116).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["RecurrentQNet", "RecurrentActorProb", "RecurrentCritic"]


class _LSTMCore(nn.Module):
    hidden_size: int

    def setup(self) -> None:
        self.cell = nn.OptimizedLSTMCell(self.hidden_size)

    def zero_carry(self, batch: int):
        return self.cell.initialize_carry(jax.random.key(0), (batch, self.hidden_size))

    def scan_seq(self, obs_seq: jnp.ndarray):
        """obs_seq [B, L, F] -> last output [B, H]."""
        carry = self.zero_carry(obs_seq.shape[0])

        def body(carry, x):
            carry, y = self.cell(carry, x)
            return carry, y

        # time-major scan
        carry, ys = nn.scan(
            lambda cell, c, x: cell(c, x),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )(self.cell, carry, obs_seq)
        return ys[:, -1]

    def one_step(self, obs: jnp.ndarray, carry):
        carry, y = self.cell(carry, obs)
        return y, carry


class RecurrentQNet(nn.Module):
    """LSTM Q-network: obs (stacked [B,L,O] for training / [B,O] + carry for
    acting) -> Q values [B, A] (reference Recurrent, net/common.py:372)."""

    hidden_size: int
    action_dim: int

    def setup(self) -> None:
        self.core = _LSTMCore(self.hidden_size)
        self.embed = nn.Dense(self.hidden_size)
        self.head = nn.Dense(self.action_dim)

    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        if obs.ndim == 2:
            obs = obs[:, None, :]
        feat = self.core.scan_seq(nn.relu(self.embed(obs)))
        return self.head(feat)

    def step(self, obs: jnp.ndarray, carry) -> tuple[jnp.ndarray, Any]:
        y, carry = self.core.one_step(nn.relu(self.embed(obs)), carry)
        return self.head(y), carry

    def zero_carry(self, batch: int):
        return self.core.zero_carry(batch)


class RecurrentActorProb(nn.Module):
    """LSTM Gaussian actor (reference net/continuous.py:241)."""

    hidden_size: int
    action_dim: int

    def setup(self) -> None:
        self.core = _LSTMCore(self.hidden_size)
        self.embed = nn.Dense(self.hidden_size)
        self.mu = nn.Dense(self.action_dim)
        self.sigma = nn.Dense(self.action_dim)

    def _heads(self, feat):
        return self.mu(feat), jnp.exp(jnp.clip(self.sigma(feat), -20.0, 2.0))

    def __call__(self, obs: jnp.ndarray):
        if obs.ndim == 2:
            obs = obs[:, None, :]
        feat = self.core.scan_seq(nn.relu(self.embed(obs)))
        return self._heads(feat)

    def step(self, obs: jnp.ndarray, carry):
        y, carry = self.core.one_step(nn.relu(self.embed(obs)), carry)
        return self._heads(y), carry

    def zero_carry(self, batch: int):
        return self.core.zero_carry(batch)


class RecurrentCritic(nn.Module):
    """LSTM critic (reference net/continuous.py:325)."""

    hidden_size: int

    def setup(self) -> None:
        self.core = _LSTMCore(self.hidden_size)
        self.embed = nn.Dense(self.hidden_size)
        self.head = nn.Dense(1)

    def __call__(self, obs: jnp.ndarray, act: jnp.ndarray | None = None) -> jnp.ndarray:
        if obs.ndim == 2:
            obs = obs[:, None, :]
        feat = self.core.scan_seq(nn.relu(self.embed(obs)))
        if act is not None:
            feat = jnp.concatenate([feat, act.reshape(act.shape[0], -1)], axis=-1)
        return self.head(feat)[:, 0]
