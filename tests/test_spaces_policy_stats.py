"""Action-space sampling, policy action mapping, and stats dataclasses —
the analogues of reference test/base/test_action_space_sampling.py,
test_policy.py and test_stats.py."""

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.algorithm.modelfree.sac import SAC
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.stats import SequenceSummaryStats
from tianshou_tpu.env.core import Box, Discrete, MultiDiscrete
from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, ContinuousCritic


def test_space_sampling_seeded_reproducible():
    # reference test_action_space_sampling.py: same seed -> same samples
    for space in [
        Discrete(5),
        Box(low=-2.0, high=2.0, shape=(3,)),
        MultiDiscrete([3, 4]),
    ]:
        a = space.sample(jax.random.key(42))
        b = space.sample(jax.random.key(42))
        c = space.sample(jax.random.key(43))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.shape == c.shape
    # vectorized sampling over split keys is per-key deterministic
    ks = jax.random.split(jax.random.key(0), 8)
    batch = jax.vmap(Box(low=-1.0, high=1.0, shape=(2,)).sample)(ks)
    assert batch.shape == (8, 2)
    assert float(jnp.abs(batch).max()) <= 1.0


def test_discrete_sample_distribution():
    ks = jax.random.split(jax.random.key(0), 2000)
    s = jax.vmap(Discrete(4).sample)(ks)
    counts = np.bincount(np.asarray(s), minlength=4)
    assert counts.min() > 350  # roughly uniform


def test_map_action_and_inverse_roundtrip():
    # reference test_policy.py: tanh-bounded scaling maps raw <-> env action
    space = Box(low=np.array([-2.0]), high=np.array([4.0]))
    algo = SAC(
        actor=ContinuousActorProbabilistic(hidden_sizes=(8,), action_dim=1, conditioned_sigma=True),
        critic=ContinuousCritic(hidden_sizes=(8,)),
        action_space=space,
        policy_optim=AdamOptimizerFactory(lr=1e-3),
        critic_optim=AdamOptimizerFactory(lr=1e-3),
    )
    raw = jnp.array([[-1.0], [0.0], [1.0]])
    env_act = algo.map_action(raw)
    # bounds respected and midpoint maps to center of the box
    assert float(env_act.min()) >= -2.0 and float(env_act.max()) <= 4.0
    np.testing.assert_allclose(np.asarray(env_act[1]), [1.0], atol=1e-5)
    back = algo.map_action_inverse(env_act)
    np.testing.assert_allclose(np.asarray(back), np.asarray(raw), atol=1e-4)


def test_sequence_summary_stats():
    # reference test_stats.py
    s = SequenceSummaryStats.from_sequence([1.0, 2.0, 3.0, 4.0])
    assert s.mean == 2.5 and s.min == 1.0 and s.max == 4.0
    np.testing.assert_allclose(s.std, np.std([1, 2, 3, 4]))
    empty = SequenceSummaryStats.from_sequence([])
    assert empty.mean == 0.0 and empty.max == 0.0
