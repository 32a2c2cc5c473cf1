"""gSDE (generalized state-dependent exploration, arXiv:2005.05719) for the
on-policy family: marginal-distribution correctness, temporal correlation of
the carried noise, collector-state resampling, and an end-to-end PPO run."""

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.algorithm.modelfree.ppo import PPO
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.env.classic.pendulum import Pendulum
from tianshou_tpu.env.core import VectorDeviceEnv
from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, ContinuousCritic
from tianshou_tpu.trainer.trainer import OnPolicyTrainer, OnPolicyTrainerParams


def _sde_algo(hidden=(16, 16), sigma_init=-1.0, **kw):
    env = Pendulum()
    algo = PPO(
        actor=ContinuousActorProbabilistic(
            hidden_sizes=hidden, action_dim=1, ppo_init=True,
            sde=True, sigma_init=sigma_init,
        ),
        critic=ContinuousCritic(hidden_sizes=hidden, use_action=False, ppo_init=True),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=3e-4, max_grad_norm=0.5),
        deterministic_eval=True,
        **kw,
    )
    return env, algo


def test_sde_marginal_matches_state_dependent_sigma():
    """act = mu + feat^T (eps*sigma_mat) with eps ~ N(0,1) must be
    marginally N(mu, sigma(s)^2) where sigma(s) is the actor's returned
    state-dependent std."""
    env, algo = _sde_algo()
    key = jax.random.key(0)
    ts = algo.init(key, jnp.zeros(3))
    obs = jax.random.normal(jax.random.key(1), (4, 3))

    mu, sigma, feat = algo.actor.apply(ts.params["actor"], obs)
    assert feat.shape == (4, 16) and sigma.shape == mu.shape == (4, 1)
    assert bool(jnp.all(sigma > 0))

    # many independent eps draws -> empirical moments of the SDE action
    # (count=1 so forward uses the provided eps instead of resampling)
    from tianshou_tpu.data.batch import Batch as B
    n = 4000
    eps = jax.vmap(lambda k: algo._sde_eps(4, k))(jax.random.split(key, n))

    def one(e):
        st = B(eps=e, count=jnp.ones(4, jnp.int32))
        return algo.forward(ts, obs, jax.random.key(2), state=st).act

    acts = jax.vmap(one)(eps)  # [n, 4, 1]
    np.testing.assert_allclose(np.asarray(acts.mean(0)), np.asarray(mu), atol=0.05)
    np.testing.assert_allclose(
        np.asarray(acts.std(0)), np.asarray(sigma), rtol=0.12,
    )
    # log_prob of the policy dist is finite and consistent
    dist = algo._dist(ts.params, obs)
    lp = dist.log_prob(acts[0])
    assert bool(jnp.all(jnp.isfinite(lp)))


def test_sde_noise_is_temporally_correlated():
    """With eps held fixed, the same obs maps to the same action (smooth,
    deterministic-in-state exploration); fresh eps changes it."""
    from tianshou_tpu.data.batch import Batch as B

    env, algo = _sde_algo()
    ts = algo.init(jax.random.key(0), jnp.zeros(3))
    obs = jnp.ones((2, 3))
    one = jnp.ones(2, jnp.int32)
    eps = B(eps=algo._sde_eps(2, jax.random.key(3)), count=one)
    a1 = algo.forward(ts, obs, jax.random.key(4), state=eps).act
    a2 = algo.forward(ts, obs, jax.random.key(5), state=eps).act  # diff key, same eps
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    eps2 = B(eps=algo._sde_eps(2, jax.random.key(6)), count=one)
    a3 = algo.forward(ts, obs, jax.random.key(4), state=eps2).act
    assert not np.allclose(np.asarray(a1), np.asarray(a3))
    # deterministic eval ignores the noise entirely
    d1 = algo.forward(ts, obs, jax.random.key(7), state=eps, deterministic=True).act
    d2 = algo.forward(ts, obs, jax.random.key(8), state=eps2, deterministic=True).act
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    # count=0 (episode start / schedule tick) resamples from the step key
    eps0 = B(eps=algo._sde_eps(2, jax.random.key(3)), count=jnp.zeros(2, jnp.int32))
    r1 = algo.forward(ts, obs, jax.random.key(4), state=eps0)
    assert not np.allclose(np.asarray(r1.act), np.asarray(a1))
    assert int(r1.state.count[0]) == 1
    # resample cadence: counts advance, eps held fixed between ticks
    r2 = algo.forward(ts, obs, jax.random.key(9), state=r1.state)
    np.testing.assert_array_equal(np.asarray(r1.state.eps), np.asarray(r2.state.eps))


def test_sde_collector_threads_and_resamples_state():
    """The DeviceCollector carries the eps matrix, refreshes it per chunk,
    and resamples (not zeros) it for envs that finish an episode."""
    env, algo = _sde_algo()
    ts = algo.init(jax.random.key(0), jnp.zeros(3))
    coll = DeviceCollector(VectorDeviceEnv(env, 4), algo, None)
    cstate = coll.reset(jax.random.key(1))
    assert cstate.policy_state is not None and cstate.policy_state.eps.shape == (4, 16, 1)

    c1, _, out = coll.collect(ts, cstate, None, jax.random.key(2), n_steps=8,
                              training=True, keep_rollout=True)
    # eps must never be all-zero (zeroing would kill exploration post-done)
    assert float(jnp.abs(c1.policy_state.eps).sum()) > 0
    # counts advanced through the scan (8 steps, resample every 4)
    assert int(c1.policy_state.count.max()) >= 1
    # chunk refresh + in-scan resamples: a second collect re-derives eps
    c2, _, _ = coll.collect(ts, c1, None, jax.random.key(3), n_steps=8, training=True)
    assert not np.allclose(np.asarray(c1.policy_state.eps), np.asarray(c2.policy_state.eps))
    # rollout actions vary across steps (state-dependent, not frozen)
    acts = np.asarray(out.rollout.act)
    assert np.std(acts) > 0


def test_sde_ppo_pendulum_end_to_end():
    """PPO+gSDE learns Pendulum to the reference threshold-class score."""
    env, algo = _sde_algo(
        hidden=(64, 64), sigma_init=-1.0,
        gamma=0.95, gae_lambda=0.95, eps_clip=0.2, value_clip=True,
        return_standardization=True, recompute_advantage=True, vf_coef=0.25,
    )
    key = jax.random.key(0)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(3))
    train_c = DeviceCollector(VectorDeviceEnv(env, 16), algo, None)
    test_c = DeviceCollector(VectorDeviceEnv(env, 10), algo, None)
    params = OnPolicyTrainerParams(
        max_epochs=12,
        epoch_num_steps=4000,
        test_step_num_episodes=10,
        batch_size=128,
        collection_step_num_env_steps=64,
        update_step_num_repetitions=10,
        stop_fn=lambda r: r >= -250,
        verbose=False,
    )
    result = OnPolicyTrainer(algo, train_c, test_c, params).run(ts, key)
    assert result.best_reward >= -250, f"best_reward {result.best_reward}"
