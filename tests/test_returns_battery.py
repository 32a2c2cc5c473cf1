"""Edge-case battery for the return/advantage kernels (ops/returns.py).

Degenerate-parameter identities the reference kernels satisfy implicitly
(reference algorithm_base.py:653-719 GAE, :1160-1222 n-step): these pin the
TPU scan implementations at the corners where off-by-one errors hide.
"""

import jax.numpy as jnp
import numpy as np

from tianshou_tpu.ops.returns import (
    gae_advantages,
    mc_return_to_go,
    nstep_returns,
    value_mask,
)


def _np(a):
    return np.asarray(a)


def test_gae_lambda_zero_is_td_error():
    T = 6
    rng = np.random.default_rng(0)
    rew = rng.normal(size=T).astype(np.float32)
    val = rng.normal(size=T).astype(np.float32)
    nxt = rng.normal(size=T).astype(np.float32)
    term = np.zeros(T, bool)
    end = np.zeros(T, bool)
    adv = gae_advantages(jnp.asarray(rew), jnp.asarray(val), jnp.asarray(nxt),
                         jnp.asarray(term), jnp.asarray(end), gamma=0.9, gae_lambda=0.0)
    np.testing.assert_allclose(_np(adv), rew + 0.9 * nxt - val, rtol=1e-6)


def test_gae_lambda_one_is_mc_minus_value():
    """λ=1 telescopes: adv_t = Σ γ^k r_{t+k} + γ^{T-t} V(s_T) - V(s_t)
    on a truncation-free single episode terminated at T-1."""
    T = 5
    rng = np.random.default_rng(1)
    rew = rng.normal(size=T).astype(np.float32)
    val = rng.normal(size=T).astype(np.float32)
    nxt = np.concatenate([val[1:], [rng.normal()]]).astype(np.float32)
    term = np.zeros(T, bool)
    term[-1] = True
    end = term.copy()
    gamma = 0.95
    adv = gae_advantages(jnp.asarray(rew), jnp.asarray(val), jnp.asarray(nxt),
                         jnp.asarray(term), jnp.asarray(end), gamma=gamma, gae_lambda=1.0)
    # terminal masks V(s_T): MC return-to-go of the rewards alone
    mc = _np(mc_return_to_go(jnp.asarray(rew), gamma, jnp.asarray(end)))
    np.testing.assert_allclose(_np(adv), mc - val, rtol=1e-5, atol=1e-6)


def test_gae_gamma_zero_is_immediate_td():
    T = 4
    rew = np.arange(1.0, T + 1, dtype=np.float32)
    val = np.full(T, 0.5, np.float32)
    adv = gae_advantages(jnp.asarray(rew), jnp.asarray(val), jnp.ones(T),
                         jnp.zeros(T, bool), jnp.zeros(T, bool), gamma=0.0, gae_lambda=0.95)
    np.testing.assert_allclose(_np(adv), rew - val, rtol=1e-6)


def test_gae_truncation_cuts_chain_but_bootstraps():
    """A truncated step keeps γ·V(s') in its own delta (value_mask lets
    truncation bootstrap) but the advantage chain must not cross it."""
    T = 4
    rew = np.ones(T, np.float32)
    val = np.zeros(T, np.float32)
    nxt = np.full(T, 2.0, np.float32)
    term = np.zeros(T, bool)
    end = np.zeros(T, bool)
    end[1] = True  # truncated at t=1
    gamma, lam = 0.9, 0.8
    adv = _np(gae_advantages(jnp.asarray(rew), jnp.asarray(val), jnp.asarray(nxt),
                             jnp.asarray(term), jnp.asarray(end), gamma=gamma, gae_lambda=lam))
    delta = rew + gamma * nxt - val  # no termination anywhere
    # chain within [0,1] and [2,3]; t=1 is a boundary
    assert np.isclose(adv[1], delta[1])
    assert np.isclose(adv[0], delta[0] + gamma * lam * delta[1])
    assert np.isclose(adv[3], delta[3])
    assert np.isclose(adv[2], delta[2] + gamma * lam * delta[3])


def test_value_mask_terminated_vs_truncated():
    term = jnp.asarray([False, True, False])
    np.testing.assert_array_equal(_np(value_mask(term)), [1.0, 0.0, 1.0])


def test_nstep_n1_is_td_target():
    B = 5
    rng = np.random.default_rng(2)
    rew = rng.normal(size=(1, B)).astype(np.float32)
    end = np.zeros((1, B), np.float32)
    q = rng.normal(size=(B, 1)).astype(np.float32)
    out = _np(nstep_returns(jnp.asarray(rew), jnp.asarray(end), jnp.asarray(q), gamma=0.9))
    np.testing.assert_allclose(out, rew.T + 0.9 * q, rtol=1e-6)


def test_nstep_gamma_zero_is_first_reward():
    rew = np.array([[1.0, 2.0], [10.0, 20.0], [100.0, 200.0]], np.float32)
    end = np.zeros((3, 2), np.float32)
    q = np.full((2, 1), 7.0, np.float32)
    out = _np(nstep_returns(jnp.asarray(rew), jnp.asarray(end), jnp.asarray(q), gamma=0.0))
    np.testing.assert_allclose(out, [[1.0], [2.0]])


def test_nstep_mid_chain_end_truncates_sum_and_discounts_bootstrap():
    """Episode ends at chain step 1: return = r0 + γ·r1 + γ²·Q_terminal,
    where Q_terminal is whatever the caller supplies (zero when truly
    terminated via value_mask, V(obs_next at the truncated row) otherwise).
    Rewards past the end must not leak in."""
    gamma = 0.5
    rew = np.array([[1.0], [2.0], [999.0]], np.float32)  # 999 is past-end garbage...
    end = np.array([[0.0], [1.0], [1.0]], np.float32)
    q = np.array([[4.0]], np.float32)
    out = _np(nstep_returns(jnp.asarray(rew[:2]), jnp.asarray(end[:2]), jnp.asarray(q), gamma=gamma))
    np.testing.assert_allclose(out, [[1.0 + 0.5 * 2.0 + 0.25 * 4.0]])
    # with the garbage row appended but flagged ended (as the buffer's
    # clamped next-chain produces reward 0 / end 1 — emulate reward 0)
    rew3 = np.array([[1.0], [2.0], [0.0]], np.float32)
    out3 = _np(nstep_returns(jnp.asarray(rew3), jnp.asarray(end), jnp.asarray(q), gamma=gamma))
    np.testing.assert_allclose(out3, [[1.0 + 0.5 * 2.0 + 0.25 * 4.0]])


def test_mc_return_gamma_one_is_suffix_sums_per_episode():
    rew = np.array([1, 2, 3, 4, 5], np.float32)
    end = np.array([0, 0, 1, 0, 0], bool)
    out = _np(mc_return_to_go(jnp.asarray(rew), 1.0, jnp.asarray(end)))
    np.testing.assert_allclose(out, [6, 5, 3, 9, 5])


def test_mc_return_batched_envs():
    rew = np.array([[1, 10], [2, 20], [3, 30]], np.float32)  # [T=3, E=2]
    end = np.array([[0, 0], [1, 0], [0, 1]], bool)
    out = _np(mc_return_to_go(jnp.asarray(rew), 0.5, jnp.asarray(end)))
    np.testing.assert_allclose(out[:, 0], [1 + 0.5 * 2, 2, 3])
    np.testing.assert_allclose(out[:, 1], [10 + 0.5 * (20 + 0.5 * 30), 20 + 0.5 * 30, 30])
