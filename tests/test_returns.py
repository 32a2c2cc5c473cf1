"""Return-estimation kernel tests, mirroring reference test/base/test_returns.py.

Each kernel is validated against a straightforward numpy reference
implementation of the semantics in algorithm_base.py:1085-1222.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.ops.returns import (
    gae_advantages,
    mc_return_to_go,
    nstep_returns,
    value_mask,
)


def np_gae(rew, v_s, v_s_, term, end, gamma, lam):
    v_s_ = v_s_ * (1.0 - term)
    delta = rew + gamma * v_s_ - v_s
    disc = (1.0 - end) * gamma * lam
    adv = np.zeros_like(rew)
    g = 0.0
    for i in range(len(rew) - 1, -1, -1):
        g = delta[i] + disc[i] * g
        adv[i] = g
    return adv


def test_gae_matches_numpy(rng):
    T = 50
    rew = rng.normal(size=T).astype(np.float32)
    v_s = rng.normal(size=T).astype(np.float32)
    v_s_ = rng.normal(size=T).astype(np.float32)
    term = (rng.random(T) < 0.1).astype(np.float32)
    trunc = (rng.random(T) < 0.05).astype(np.float32)
    end = np.maximum(term, trunc)
    end[-1] = 1.0
    got = gae_advantages(
        jnp.array(rew), jnp.array(v_s), jnp.array(v_s_), jnp.array(term), jnp.array(end), 0.99, 0.95
    )
    want = np_gae(rew, v_s, v_s_, term, end, 0.99, 0.95)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gae_batched(rng):
    """[T, B] arrays run through a single scan with no vmap."""
    T, B = 20, 4
    rew = rng.normal(size=(T, B)).astype(np.float32)
    v_s = rng.normal(size=(T, B)).astype(np.float32)
    v_s_ = rng.normal(size=(T, B)).astype(np.float32)
    term = (rng.random((T, B)) < 0.1).astype(np.float32)
    end = term.copy()
    end[-1] = 1.0
    got = gae_advantages(
        jnp.array(rew), jnp.array(v_s), jnp.array(v_s_), jnp.array(term), jnp.array(end), 0.9, 0.9
    )
    for b in range(B):
        want = np_gae(rew[:, b], v_s[:, b], v_s_[:, b], term[:, b], end[:, b], 0.9, 0.9)
        np.testing.assert_allclose(got[:, b], want, rtol=1e-5, atol=1e-5)


def test_gae_simple_case():
    # single 3-step episode, lambda=1 -> MC advantage
    rew = jnp.array([1.0, 1.0, 1.0])
    v = jnp.zeros(3)
    term = jnp.array([0.0, 0.0, 1.0])
    adv = gae_advantages(rew, v, jnp.ones(3) * 5.0, term, term, 0.9, 1.0)
    # returns-to-go with termination (next value masked at the end)
    want2 = 1.0
    want1 = 1.0 + 0.9 * want2
    want0 = 1.0 + 0.9 * want1
    # steps 0,1 bootstrap v_s_=5
    np.testing.assert_allclose(adv[2], want2, rtol=1e-6)


def test_mc_return_to_go():
    rew = jnp.array([1.0, 2.0, 3.0, 4.0])
    got = mc_return_to_go(rew, 0.5)
    want = np.array(
        [1 + 0.5 * (2 + 0.5 * (3 + 0.5 * 4)), 2 + 0.5 * (3 + 0.5 * 4), 3 + 0.5 * 4, 4.0]
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # with an episode boundary after step 1
    end = jnp.array([0.0, 1.0, 0.0, 0.0])
    got = mc_return_to_go(rew, 0.5, end)
    want = np.array([1 + 0.5 * 2, 2.0, 3 + 0.5 * 4, 4.0])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def np_nstep(rew, end, target_q, gamma):
    # direct transcription of reference _nstep_return (algorithm_base.py:1160)
    n, bsz = rew.shape
    tq = target_q.reshape(bsz, -1).copy()
    returns = np.zeros_like(tq)
    gammas = np.full(bsz, n)
    for n_ in range(n - 1, -1, -1):
        gammas = np.where(end[n_] > 0, n_ + 1, gammas)
        returns[end[n_] > 0] = 0.0
        returns = rew[n_].reshape(-1, 1) + gamma * returns
    return (tq * (gamma ** gammas).reshape(-1, 1) + returns).reshape(target_q.shape)


def test_nstep_matches_reference_semantics(rng):
    n, bsz = 5, 16
    rew = rng.normal(size=(n, bsz)).astype(np.float32)
    end = (rng.random((n, bsz)) < 0.2).astype(np.float32)
    tq = rng.normal(size=(bsz,)).astype(np.float32)
    got = nstep_returns(jnp.array(rew), jnp.array(end), jnp.array(tq), 0.97)
    want = np_nstep(rew, end, tq, 0.97)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_nstep_no_termination():
    # 1-step: r + gamma * q
    rew = jnp.array([[1.0, 2.0]])
    end = jnp.zeros((1, 2))
    tq = jnp.array([10.0, 20.0])
    got = nstep_returns(rew, end, tq, 0.9)
    np.testing.assert_allclose(got, [1 + 0.9 * 10, 2 + 0.9 * 20], rtol=1e-6)


def test_nstep_distributional_shape(rng):
    # target_q with action/atom dims flows through
    n, bsz, atoms = 3, 4, 51
    rew = rng.normal(size=(n, bsz)).astype(np.float32)
    end = np.zeros((n, bsz), np.float32)
    tq = rng.normal(size=(bsz, atoms)).astype(np.float32)
    got = nstep_returns(jnp.array(rew), jnp.array(end), jnp.array(tq), 0.99)
    assert got.shape == (bsz, atoms)
    want = np_nstep(rew, end, tq, 0.99)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_value_mask():
    term = jnp.array([0.0, 1.0, 0.0])
    np.testing.assert_allclose(value_mask(term), [1.0, 0.0, 1.0])


def test_kernels_jit_once():
    f = jax.jit(lambda r, v, nv, t, e: gae_advantages(r, v, nv, t, e, 0.99, 0.95))
    z = jnp.zeros(8)
    out = f(z, z, z, z, z)
    assert out.shape == (8,)
