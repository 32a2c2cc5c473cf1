"""Atari network family (reference env/atari/atari_network.py: ``DQNet:60``
NatureCNN, ``C51Net:125``, ``RainbowNet:154`` noisy dueling, ``QRDQNet:211``).

TPU notes: NHWC layout (TPU-native), bf16 conv compute with fp32 outputs,
observations uint8 scaled inside the net so frames stay 1 byte in the replay
buffer and HBM traffic is minimized.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tianshou_tpu.models.discrete import NoisyLinear

__all__ = [
    "NatureCNN", "DQNet", "C51Net", "QRDQNet", "RainbowAtariNet",
    "ImplicitQuantileAtariNet",
]


class NatureCNN(nn.Module):
    """conv 32x8s4 - 64x4s2 - 64x3s1 - dense 512 over [B, 84, 84, C]."""

    features: int = 512
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.dtype == jnp.uint8:
            x = x.astype(self.compute_dtype) / 255.0
        else:
            x = x.astype(self.compute_dtype)
        if x.ndim == 5:  # frame-stacked [B, L, H, W, C] -> fold L into channels
            x = jnp.moveaxis(x, 1, -1).reshape(x.shape[0], x.shape[2], x.shape[3], -1)
        if x.ndim == 4 and x.shape[1] in (1, 4) and x.shape[-1] not in (1, 4):
            x = jnp.transpose(x, (0, 2, 3, 1))  # accept NCHW input
        x = nn.relu(nn.Conv(32, (8, 8), strides=(4, 4), dtype=self.compute_dtype)(x))
        x = nn.relu(nn.Conv(64, (4, 4), strides=(2, 2), dtype=self.compute_dtype)(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=(1, 1), dtype=self.compute_dtype)(x))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.features, dtype=self.compute_dtype)(x))
        return x.astype(jnp.float32)


class DQNet(nn.Module):
    """NatureCNN -> Q values (reference atari_network.py:60)."""

    action_dim: int
    features: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.action_dim)(NatureCNN(self.features)(x))


class C51Net(nn.Module):
    """NatureCNN -> categorical atoms (reference atari_network.py:125)."""

    action_dim: int
    num_atoms: int = 51
    features: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = NatureCNN(self.features)(x)
        logits = nn.Dense(self.action_dim * self.num_atoms)(h)
        return nn.softmax(logits.reshape(-1, self.action_dim, self.num_atoms), axis=-1)


class QRDQNet(nn.Module):
    """NatureCNN -> quantiles (reference atari_network.py:211)."""

    action_dim: int
    num_quantiles: int = 200
    features: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = NatureCNN(self.features)(x)
        q = nn.Dense(self.action_dim * self.num_quantiles)(h)
        return q.reshape(-1, self.action_dim, self.num_quantiles)


class ImplicitQuantileAtariNet(nn.Module):
    """NatureCNN trunk + cosine tau embedding -> Q(tau) quantiles, the Atari
    IQN/FQF head (reference atari_network.py QRDQN/ImplicitQuantileNetwork
    wiring). Exposes ``features``/``quantiles`` like
    models.discrete.ImplicitQuantileNetwork so IQN and FQF both drive it."""

    action_dim: int
    features_dim: int = 512
    num_cosines: int = 64

    def setup(self) -> None:
        from tianshou_tpu.models.discrete import CosineEmbedding

        self.trunk = NatureCNN(self.features_dim)
        self.cos_emb = CosineEmbedding(self.features_dim, self.num_cosines)
        self.merge = nn.Dense(self.features_dim)
        self.head = nn.Dense(self.action_dim)

    def features(self, obs: jnp.ndarray) -> jnp.ndarray:
        return self.trunk(obs)

    def quantiles(self, feat: jnp.ndarray, taus: jnp.ndarray) -> jnp.ndarray:
        tau_emb = self.cos_emb(taus)  # [B, K, F]
        mixed = feat[:, None, :] * tau_emb
        return self.head(nn.relu(self.merge(mixed)))  # [B, K, A]

    def __call__(self, obs: jnp.ndarray, taus: jnp.ndarray) -> jnp.ndarray:
        return self.quantiles(self.features(obs), taus)


class RainbowAtariNet(nn.Module):
    """NatureCNN -> noisy dueling distributional head
    (reference atari_network.py:154)."""

    action_dim: int
    num_atoms: int = 51
    features: int = 512
    sigma0: float = 0.5

    def setup(self) -> None:
        self.trunk = NatureCNN(self.features)
        self.v1 = NoisyLinear(self.features, self.sigma0)
        self.v2 = NoisyLinear(self.num_atoms, self.sigma0)
        self.a1 = NoisyLinear(self.features, self.sigma0)
        self.a2 = NoisyLinear(self.action_dim * self.num_atoms, self.sigma0)

    def __call__(self, x: jnp.ndarray, noise_key: jax.Array | None = None) -> jnp.ndarray:
        feat = self.trunk(x)
        ks = jax.random.split(noise_key, 4) if noise_key is not None else [None] * 4
        v = self.v2(nn.relu(self.v1(feat, ks[0])), ks[1]).reshape(-1, 1, self.num_atoms)
        a = self.a2(nn.relu(self.a1(feat, ks[2])), ks[3]).reshape(-1, self.action_dim, self.num_atoms)
        logits = v + a - a.mean(axis=1, keepdims=True)
        return nn.softmax(logits, axis=-1)
