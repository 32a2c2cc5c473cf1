"""Continuous-control actors and critics (reference utils/net/continuous.py)."""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

from tianshou_tpu.models.mlp import MLP

__all__ = [
    "ContinuousActorDeterministic",
    "ContinuousActorProbabilistic",
    "ContinuousCritic",
    "Perturbation",
    "VAE",
]

SIGMA_MIN, SIGMA_MAX = -20.0, 2.0  # reference continuous.py:25


class ContinuousActorDeterministic(nn.Module):
    """obs -> tanh-bounded action * max_action (reference continuous.py:32)."""

    hidden_sizes: Sequence[int]
    action_dim: int
    max_action: float = 1.0

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        x = MLP(self.hidden_sizes, self.action_dim)(obs)
        return self.max_action * nn.tanh(x)


class ContinuousActorProbabilistic(nn.Module):
    """obs -> (mu, sigma) Gaussian params (reference continuous.py:172).

    ``conditioned_sigma``: sigma is a network head; otherwise a learned
    state-independent log-sigma parameter (clamped to [SIGMA_MIN, SIGMA_MAX]).

    ``ppo_init`` applies the reference MuJoCo-PPO initialization recipe
    (reference mujoco_ppo.py:109-120, arXiv:2006.05990 Fig.24): tanh
    activations, orthogonal kernels with gain sqrt(2), the final mu layer
    scaled by 0.01, and log-sigma initialized to ``sigma_init``.

    ``sde``: generalized state-dependent exploration (gSDE,
    arXiv:2005.05719). The actor learns a log-sigma MATRIX [feat, act];
    the policy marginal is Normal(mu, sigma(s)) with per-state
    sigma_a(s) = sqrt(sum_f feat_f(s)^2 exp(2 log_sigma_fa)), and the
    collector samples act = mu + feat^T (eps * exp(log_sigma)) with eps
    held fixed across steps (temporally-correlated exploration — the
    round-5 lever for PPO gait discovery on the device physics envs).
    Returns (mu, sigma(s), feat) in this mode.
    """

    hidden_sizes: Sequence[int]
    action_dim: int
    conditioned_sigma: bool = False
    ppo_init: bool = False
    sigma_init: float = -0.5
    sde: bool = False

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
        if self.ppo_init:
            feat = MLP(
                self.hidden_sizes,
                activation=nn.tanh,
                kernel_init=nn.initializers.orthogonal(jnp.sqrt(2.0)),
            )(obs)
            mu = nn.Dense(
                self.action_dim,
                kernel_init=nn.initializers.orthogonal(0.01),
            )(feat)
        else:
            feat = MLP(self.hidden_sizes)(obs)
            mu = nn.Dense(self.action_dim)(feat)
        if self.sde:
            log_sigma = self.param(
                "log_sigma_mat",
                nn.initializers.constant(self.sigma_init),
                (self.hidden_sizes[-1], self.action_dim),
            )
            log_sigma = jnp.clip(log_sigma, SIGMA_MIN, SIGMA_MAX)
            # marginal std per action dim: ||feat ⊙ σ_col||_2
            var = (feat**2) @ jnp.exp(2.0 * log_sigma)
            return mu, jnp.sqrt(var + 1e-12), feat
        if self.conditioned_sigma:
            log_sigma = nn.Dense(self.action_dim)(feat)
            log_sigma = jnp.clip(log_sigma, SIGMA_MIN, SIGMA_MAX)
        else:
            init = nn.initializers.constant(self.sigma_init) if self.ppo_init else nn.initializers.zeros
            log_sigma = self.param("log_sigma", init, (self.action_dim,))
            log_sigma = jnp.broadcast_to(jnp.clip(log_sigma, SIGMA_MIN, SIGMA_MAX), mu.shape)
        return mu, jnp.exp(log_sigma)


class ContinuousCritic(nn.Module):
    """(obs, act?) -> scalar value (reference continuous.py:99).
    ``ppo_init``: tanh + orthogonal kernels (see actor docstring)."""

    hidden_sizes: Sequence[int]
    use_action: bool = True
    ppo_init: bool = False

    @nn.compact
    def __call__(self, obs: jnp.ndarray, act: jnp.ndarray | None = None) -> jnp.ndarray:
        x = obs.reshape(obs.shape[0], -1)
        if self.use_action and act is not None:
            x = jnp.concatenate([x, act.reshape(act.shape[0], -1)], axis=-1)
        if self.ppo_init:
            return MLP(
                self.hidden_sizes, 1,
                activation=nn.tanh,
                kernel_init=nn.initializers.orthogonal(jnp.sqrt(2.0)),
            )(x)[:, 0]
        return MLP(self.hidden_sizes, 1)(x)[:, 0]


class EnsembleCritic(nn.Module):
    """N independent Q(obs, act) critics evaluated as one batched einsum
    (reference REDQ's EnsembleLinear stack, net/common.py:518). Output [N, B].
    """

    ensemble_size: int
    hidden_sizes: Sequence[int]

    @nn.compact
    def __call__(self, obs: jnp.ndarray, act: jnp.ndarray) -> jnp.ndarray:
        from tianshou_tpu.models.mlp import EnsembleLinear

        x = jnp.concatenate([obs.reshape(obs.shape[0], -1), act.reshape(act.shape[0], -1)], axis=-1)
        for h in self.hidden_sizes:
            x = EnsembleLinear(self.ensemble_size, h)(x)
            x = nn.relu(x)
        x = EnsembleLinear(self.ensemble_size, 1)(x)
        return x[..., 0]  # [N, B]


class Perturbation(nn.Module):
    """BCQ action perturbation net (reference continuous.py:378)."""

    hidden_sizes: Sequence[int]
    action_dim: int
    max_action: float = 1.0
    phi: float = 0.05

    @nn.compact
    def __call__(self, obs: jnp.ndarray, act: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([obs, act], axis=-1)
        noise = self.phi * self.max_action * nn.tanh(MLP(self.hidden_sizes, self.action_dim)(x))
        return jnp.clip(act + noise, -self.max_action, self.max_action)


class VAE(nn.Module):
    """Conditional VAE for BCQ (reference continuous.py:415)."""

    encoder_hidden: Sequence[int]
    decoder_hidden: Sequence[int]
    action_dim: int
    latent_dim: int
    max_action: float = 1.0

    def setup(self) -> None:
        self.encoder = MLP(self.encoder_hidden)
        self.mean_head = nn.Dense(self.latent_dim)
        self.logstd_head = nn.Dense(self.latent_dim)
        self.decoder = MLP(self.decoder_hidden, self.action_dim, flatten_input=False)

    def __call__(self, obs: jnp.ndarray, act: jnp.ndarray, key) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        import jax

        h = self.encoder(jnp.concatenate([obs, act], axis=-1))
        mean = self.mean_head(h)
        log_std = jnp.clip(self.logstd_head(h), -4, 15)
        std = jnp.exp(log_std)
        z = mean + std * jax.random.normal(key, mean.shape)
        recon = self.decode(obs, z)
        return recon, mean, std

    def decode(self, obs: jnp.ndarray, z: jnp.ndarray | None = None, key=None) -> jnp.ndarray:
        import jax

        if z is None:
            z = jnp.clip(jax.random.normal(key, (obs.shape[0], self.latent_dim)) * 0.5, -0.5, 0.5)
        h = self.decoder(jnp.concatenate([obs, z], axis=-1))
        return self.max_action * nn.tanh(h)
