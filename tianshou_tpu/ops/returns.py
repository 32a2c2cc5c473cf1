"""Return/advantage estimation kernels.

TPU-native replacements for the reference's numba ``@njit`` kernels:

- ``gae_advantages``     <- ``_gae``                     (algorithm_base.py:1085-1140)
- ``nstep_returns``      <- ``_nstep_return``            (algorithm_base.py:1160-1222)
- ``mc_return_to_go``    <- ``episode_mc_return_to_go``  (algorithm_base.py:1143-1157)
- ``value_mask``         <- ``Algorithm.value_mask``     (algorithm_base.py:633-651)

All functions are pure jnp over time-major arrays ``[T, ...]`` with trailing
batch dims broadcast through the scan carry, so a vectorized rollout of shape
``[T, num_envs]`` works directly — no vmap required — and everything compiles
to a single fused XLA while-loop.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["gae_advantages", "nstep_returns", "mc_return_to_go", "value_mask"]


def value_mask(terminated: jnp.ndarray) -> jnp.ndarray:
    """1.0 where the next-state value should bootstrap.

    Mirrors reference ``value_mask`` (algorithm_base.py:633-651): values are
    zeroed only on true termination; truncation (time limit) still bootstraps.
    """
    return 1.0 - terminated.astype(jnp.float32)


def gae_advantages(
    rewards: jnp.ndarray,
    values: jnp.ndarray,
    next_values: jnp.ndarray,
    terminated: jnp.ndarray,
    episode_end: jnp.ndarray,
    gamma: float,
    gae_lambda: float,
) -> jnp.ndarray:
    """Generalized advantage estimation via a reversed ``lax.scan``.

    Args (all time-major ``[T, ...]``):
      rewards, values (V(s_t)), next_values (V(s_{t+1}), unmasked),
      terminated (episode truly ended at t), episode_end (terminated OR
      truncated OR rollout boundary -> advantage chain is cut).

    Returns advantages ``[T, ...]``. ``returns = adv + values`` as in the
    reference (algorithm_base.py:653-719).
    """
    rewards = rewards.astype(jnp.float32)
    next_values = next_values * value_mask(terminated)
    delta = rewards + gamma * next_values - values
    discount = (1.0 - episode_end.astype(jnp.float32)) * (gamma * gae_lambda)

    def step(carry, x):
        d, disc = x
        g = d + disc * carry
        return g, g

    _, adv = lax.scan(step, jnp.zeros_like(delta[0]), (delta, discount), reverse=True)
    return adv


def mc_return_to_go(
    rewards: jnp.ndarray,
    gamma: float,
    episode_end: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Discounted return-to-go, reset at episode ends.

    Mirrors reference ``episode_mc_return_to_go`` (algorithm_base.py:1143-1157),
    generalized with an optional ``episode_end`` mask so full rollouts with
    multiple episodes are computed in one scan.
    """
    rewards = rewards.astype(jnp.float32)
    if episode_end is None:
        cont = jnp.ones_like(rewards)
    else:
        cont = 1.0 - episode_end.astype(jnp.float32)

    def step(carry, x):
        r, c = x
        g = r + gamma * c * carry
        return g, g

    _, ret = lax.scan(step, jnp.zeros_like(rewards[0]), (rewards, cont), reverse=True)
    return ret


def nstep_returns(
    rewards: jnp.ndarray,
    episode_end: jnp.ndarray,
    target_q: jnp.ndarray,
    gamma: float,
) -> jnp.ndarray:
    """n-step bootstrapped return.

    Mirrors reference ``_nstep_return`` (algorithm_base.py:1160-1222).

    Args:
      rewards: ``[n, B]`` rewards at t..t+n-1 (gathered along buffer ``next``
        chain; beyond-episode slots repeat the terminal index and must carry
        reward 0 / end_flag 1 as the gather produces).
      episode_end: ``[n, B]`` done flags at t..t+n-1.
      target_q: ``[B, A]`` bootstrapped value at t+n (already masked for
        true termination via :func:`value_mask`).
      gamma: discount.

    Returns ``[B, A]`` returns.
    """
    n = rewards.shape[0]
    bsz = rewards.shape[1]
    tq = target_q.reshape(bsz, -1).astype(jnp.float32)

    def step(carry, x):
        acc, gammas = carry
        rew, end = x
        ended = end > 0
        # the ended step itself contributes one reward, so exponent restarts at 1
        gammas = jnp.where(ended, 1, gammas + 1)
        acc = jnp.where(ended[:, None], 0.0, acc)
        acc = rew[:, None] + gamma * acc
        return (acc, gammas), None

    init = (jnp.zeros_like(tq), jnp.full((bsz,), 0, dtype=jnp.int32))
    (acc, steps_to_boot), _ = lax.scan(
        step, init, (rewards.astype(jnp.float32), episode_end), reverse=True
    )
    # steps_to_boot counts consecutive non-terminal steps from t; bootstrap
    # discount is gamma^k where k = #steps actually accumulated.
    gamma_pow = jnp.power(gamma, steps_to_boot.astype(jnp.float32))
    out = tq * gamma_pow[:, None] + acc
    return out.reshape(target_q.shape)
