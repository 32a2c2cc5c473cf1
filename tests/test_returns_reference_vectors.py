"""Exact ground-truth vectors from the reference's own return tests
(test/base/test_returns.py): our GAE kernel must reproduce the reference's
``compute_episodic_return`` numbers bit-for-bit, including the
truncation-bootstrapping cases.

Mapping to our API: the reference passes ``v_s_`` (value of obs_next per
index) and derives ``v_s = roll(v_s_, 1)`` (test_returns.py /
algorithm_base.py:653); ``returns = gae_advantages(...) + v_s``.
"""

import jax.numpy as jnp
import numpy as np

from tianshou_tpu.ops.returns import gae_advantages


def episodic_returns(rew, terminated, truncated, v=None, gamma=0.1, lam=1.0):
    rew = np.asarray(rew, np.float32)
    term = np.asarray(terminated, np.float32)
    trunc = np.asarray(truncated, np.float32)
    v = np.zeros_like(rew) if v is None else np.asarray(v, np.float32)
    v_s_masked = v * (1 - term)
    v_s = np.roll(v_s_masked, 1)
    end = np.maximum(term, trunc)
    adv = gae_advantages(
        jnp.array(rew), jnp.array(v_s), jnp.array(v), jnp.array(term), jnp.array(end), gamma, lam
    )
    return np.asarray(adv) + v_s


def test_reference_case_1():
    got = episodic_returns(
        rew=[0, 1, 2, 3, 4, 5, 6, 7.0],
        terminated=[1, 0, 0, 1, 0, 0, 0, 1],
        truncated=[0, 0, 0, 0, 0, 1, 0, 0],
    )
    np.testing.assert_allclose(got, [0, 1.23, 2.3, 3, 4.5, 5, 6.7, 7], rtol=1e-5)


def test_reference_case_2():
    got = episodic_returns(
        rew=[7, 6, 1, 2, 3, 4, 5.0],
        terminated=[0, 1, 0, 1, 0, 1, 0],
        truncated=[0] * 7,
    )
    np.testing.assert_allclose(got, [7.6, 6, 1.2, 2, 3.4, 4, 5], rtol=1e-5)


def test_reference_case_3():
    got = episodic_returns(
        rew=[7, 6, 1, 2, 3, 4, 5.0],
        terminated=[0, 1, 0, 1, 0, 0, 1],
        truncated=[0] * 7,
    )
    np.testing.assert_allclose(got, [7.6, 6, 1.2, 2, 3.45, 4.5, 5], rtol=1e-5)


def test_reference_gae_ground_truth():
    got = episodic_returns(
        rew=[101, 102, 103.0, 200, 104, 105, 106, 201, 107, 108, 109, 202],
        terminated=[0, 0, 0, 1.0, 0, 0, 0, 1, 0, 0, 0, 1],
        truncated=[0] * 12,
        v=[2.0, 3.0, 4, -1, 5.0, 6.0, 7, -2, 8.0, 9.0, 10, -3],
        gamma=0.99,
        lam=0.95,
    )
    ground_truth = [
        454.8344, 376.1143, 291.298, 200.0,
        464.5610, 383.1085, 295.387, 201.0,
        474.2876, 390.1027, 299.476, 202.0,
    ]
    np.testing.assert_allclose(got, ground_truth, atol=1e-3)


def test_reference_gae_with_truncation():
    """Truncated episodes bootstrap their next-state value (the hard case,
    SURVEY.md §7 hard part 5)."""
    got = episodic_returns(
        rew=[101, 102, 103.0, 200, 104, 105, 106, 201, 107, 108, 109, 202],
        terminated=[0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1],
        truncated=[0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 0],
        v=[2.0, 3.0, 4, -1, 5.0, 6.0, 7, -2, 8.0, 9.0, 10, -3],
        gamma=0.99,
        lam=0.95,
    )
    ground_truth = [
        454.0109, 375.2386, 290.3669, 199.01,
        462.9138, 381.3571, 293.5248, 199.02,
        474.2876, 390.1027, 299.476, 202.0,
    ]
    np.testing.assert_allclose(got, ground_truth, atol=1e-3)
