"""Discrete-action nets (reference utils/net/discrete.py): actor/critic,
NoisyLinear (Rainbow), implicit-quantile machinery (IQN/FQF), ICM module."""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tianshou_tpu.models.mlp import MLP

__all__ = [
    "MaskedQNet",
    "DiscreteActor",
    "DiscreteCritic",
    "NoisyLinear",
    "CosineEmbedding",
    "ImplicitQuantileNetwork",
    "FractionProposalNetwork",
    "FullQuantileFunction",
    "IntrinsicCuriosityModule",
]


class DiscreteActor(nn.Module):
    """obs -> action logits (reference discrete.py:29)."""

    hidden_sizes: Sequence[int]
    action_dim: int

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        return MLP(self.hidden_sizes, self.action_dim)(obs)


class DiscreteCritic(nn.Module):
    """obs -> value(s); last_size>1 gives per-action Q (reference discrete.py:94)."""

    hidden_sizes: Sequence[int]
    last_size: int = 1

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        out = MLP(self.hidden_sizes, self.last_size)(obs)
        return out[:, 0] if self.last_size == 1 else out


class NoisyLinear(nn.Module):
    """Factorized-Gaussian noisy layer for Rainbow (reference discrete.py:317).

    Noise is drawn from an explicit PRNG key passed through ``noise_key`` so
    resampling per update step stays functional; pass ``deterministic=True``
    at evaluation to use the mean weights.
    """

    features: int
    sigma0: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, noise_key: jax.Array | None = None) -> jnp.ndarray:
        in_f = x.shape[-1]
        bound = 1.0 / jnp.sqrt(in_f)
        mu_w = self.param("mu_w", nn.initializers.uniform(scale=2 * bound), (in_f, self.features))
        mu_b = self.param("mu_b", nn.initializers.uniform(scale=2 * bound), (self.features,))
        sig_init = self.sigma0 / jnp.sqrt(in_f)
        sigma_w = self.param("sigma_w", nn.initializers.constant(sig_init), (in_f, self.features))
        sigma_b = self.param("sigma_b", nn.initializers.constant(sig_init), (self.features,))
        # initializers.uniform is [0, scale); shift to be centered
        mu_w = mu_w - bound
        mu_b = mu_b - bound
        if noise_key is None:
            return x @ mu_w + mu_b
        k1, k2 = jax.random.split(noise_key)
        def f(e):
            return jnp.sign(e) * jnp.sqrt(jnp.abs(e))
        eps_in = f(jax.random.normal(k1, (in_f,)))
        eps_out = f(jax.random.normal(k2, (self.features,)))
        w = mu_w + sigma_w * jnp.outer(eps_in, eps_out)
        b = mu_b + sigma_b * eps_out
        return x @ w + b


class RainbowNet(nn.Module):
    """Dueling noisy distributional head for Rainbow (reference
    env/atari/atari_network.py:154 RainbowNet, utils/net/discrete.py:317
    NoisyLinear): trunk MLP -> noisy value/advantage streams over atoms,
    softmax over the atom axis. ``noise_key=None`` uses mean weights."""

    hidden_sizes: Sequence[int]
    action_dim: int
    num_atoms: int = 51
    sigma0: float = 0.5

    def setup(self) -> None:
        self.trunk = MLP(self.hidden_sizes)
        h = self.hidden_sizes[-1]
        self.v1 = NoisyLinear(h, self.sigma0)
        self.v2 = NoisyLinear(self.num_atoms, self.sigma0)
        self.a1 = NoisyLinear(h, self.sigma0)
        self.a2 = NoisyLinear(self.action_dim * self.num_atoms, self.sigma0)

    def __call__(self, obs: jnp.ndarray, noise_key: jax.Array | None = None) -> jnp.ndarray:
        feat = self.trunk(obs)
        ks = jax.random.split(noise_key, 4) if noise_key is not None else [None] * 4
        v = self.v2(nn.relu(self.v1(feat, ks[0])), ks[1]).reshape(-1, 1, self.num_atoms)
        a = self.a2(nn.relu(self.a1(feat, ks[2])), ks[3]).reshape(-1, self.action_dim, self.num_atoms)
        logits = v + a - a.mean(axis=1, keepdims=True)
        return nn.softmax(logits, axis=-1)


class CosineEmbedding(nn.Module):
    """tau -> cosine feature embedding (reference discrete.py:126)."""

    embedding_dim: int
    num_cosines: int = 64

    @nn.compact
    def __call__(self, taus: jnp.ndarray) -> jnp.ndarray:
        # taus: [B, K] -> [B, K, embedding_dim]
        i = jnp.arange(1, self.num_cosines + 1, dtype=jnp.float32)
        cos = jnp.cos(taus[..., None] * i * jnp.pi)  # [B,K,C]
        return nn.relu(nn.Dense(self.embedding_dim)(cos))


class ImplicitQuantileNetwork(nn.Module):
    """IQN head (reference discrete.py:163): psi(obs) * phi(tau) -> Q(tau).

    ``features``/``quantiles`` are exposed as separate methods sharing the
    trunk params (used by FQF, reference FullQuantileFunction discrete.py:255).
    """

    hidden_sizes: Sequence[int]
    action_dim: int
    num_cosines: int = 64

    def setup(self) -> None:
        self.trunk = MLP(self.hidden_sizes)
        feat_dim = self.hidden_sizes[-1]
        self.cos_emb = CosineEmbedding(feat_dim, self.num_cosines)
        self.merge = nn.Dense(feat_dim)
        self.head = nn.Dense(self.action_dim)

    def features(self, obs: jnp.ndarray) -> jnp.ndarray:
        return self.trunk(obs)

    def quantiles(self, feat: jnp.ndarray, taus: jnp.ndarray) -> jnp.ndarray:
        tau_emb = self.cos_emb(taus)  # [B,K,F]
        mixed = feat[:, None, :] * tau_emb
        return self.head(nn.relu(self.merge(mixed)))  # [B, K, A]

    def __call__(self, obs: jnp.ndarray, taus: jnp.ndarray) -> jnp.ndarray:
        return self.quantiles(self.features(obs), taus)


# FQF uses the same net; alias for reference-name parity (discrete.py:255)
FullQuantileFunction = ImplicitQuantileNetwork


class FractionProposalNetwork(nn.Module):
    """FQF fraction proposal (reference discrete.py:219): feat -> taus."""

    num_fractions: int

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        logits = nn.Dense(
            self.num_fractions,
            kernel_init=nn.initializers.xavier_uniform(),
        )(feat)
        probs = nn.softmax(logits, axis=-1)
        tau = jnp.cumsum(probs, axis=-1)
        tau = jnp.concatenate([jnp.zeros_like(tau[:, :1]), tau], axis=-1)  # [B, K+1]
        tau_hat = (tau[:, 1:] + tau[:, :-1]) / 2.0  # [B, K]
        logp = jax.nn.log_softmax(logits, axis=-1)
        entropy = -(probs * logp).sum(-1)
        return tau, tau_hat, entropy


class IntrinsicCuriosityModule(nn.Module):
    """ICM (reference discrete.py:377): forward + inverse dynamics over an
    embedding; intrinsic reward = forward prediction error."""

    feature_hidden: Sequence[int]
    action_dim: int
    hidden_sizes: Sequence[int] = (256,)

    @nn.compact
    def __call__(self, obs: jnp.ndarray, act: jnp.ndarray, obs_next: jnp.ndarray):
        phi1 = MLP(self.feature_hidden)(obs)
        phi2 = MLP(self.feature_hidden)(obs_next)
        act_oh = jax.nn.one_hot(act.astype(jnp.int32), self.action_dim)
        phi2_hat = MLP(self.hidden_sizes, phi1.shape[-1], flatten_input=False)(
            jnp.concatenate([phi1, act_oh], axis=-1)
        )
        mse = 0.5 * ((phi2_hat - phi2) ** 2).sum(-1)
        act_hat = MLP(self.hidden_sizes, self.action_dim, flatten_input=False)(
            jnp.concatenate([phi1, phi2], axis=-1)
        )
        return mse, act_hat


class MaskedQNet(nn.Module):
    """Q network over dict observations {agent_id, obs, mask}: MLP on the
    flattened board with invalid actions masked to a large negative value
    (the multi-agent action-mask pattern of the reference's tic-tac-toe
    example, test/pettingzoo/tic_tac_toe.py)."""

    hidden_sizes: Sequence[int]
    action_dim: int

    @nn.compact
    def __call__(self, obs):
        x = obs.obs.reshape(obs.obs.shape[0], -1)
        q = MLP(self.hidden_sizes, self.action_dim)(x)
        return jnp.where(obs.mask, q, -1e9)
