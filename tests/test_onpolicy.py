"""On-policy algorithms end-to-end on device CartPole (threshold 195,
mirroring reference test/discrete/test_ppo.py, test_a2c_with_il.py)."""

import jax
import jax.numpy as jnp

from tests.helpers import make_collectors
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.algorithm.modelfree.a2c import A2C
from tianshou_tpu.algorithm.modelfree.ppo import PPO
from tianshou_tpu.algorithm.modelfree.reinforce import Reinforce
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.env.classic.cartpole import CartPole
from tianshou_tpu.models.discrete import DiscreteActor, DiscreteCritic
from tianshou_tpu.trainer.trainer import OnPolicyTrainer, OnPolicyTrainerParams


def run_onpolicy(algo, max_epochs=20, repetitions=10, batch_size=256, T=128, stop=195):
    key = jax.random.key(0)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(4))
    env = CartPole()
    train_c, test_c = make_collectors(env, algo, None, n_train=16, n_test=10)
    params = OnPolicyTrainerParams(
        max_epochs=max_epochs,
        epoch_num_steps=10000,
        test_step_num_episodes=10,
        batch_size=batch_size,
        collection_step_num_env_steps=T,
        update_step_num_repetitions=repetitions,
        stop_fn=lambda r: r >= stop,
        verbose=False,
    )
    return OnPolicyTrainer(algo, train_c, test_c, params).run(ts, key)


def _actor_critic():
    return (
        DiscreteActor(hidden_sizes=(64, 64), action_dim=2),
        DiscreteCritic(hidden_sizes=(64, 64)),
    )


def test_ppo_cartpole():
    actor, critic = _actor_critic()
    algo = PPO(
        actor=actor, critic=critic, action_space=CartPole().action_space,
        optim=AdamOptimizerFactory(lr=3e-4, max_grad_norm=0.5),
        gamma=0.99, gae_lambda=0.95, eps_clip=0.2, ent_coef=0.01,
        deterministic_eval=True,
    )
    result = run_onpolicy(algo)
    assert result.best_reward >= 195, f"best_reward {result.best_reward}"


def test_a2c_cartpole():
    actor, critic = _actor_critic()
    algo = A2C(
        actor=actor, critic=critic, action_space=CartPole().action_space,
        optim=AdamOptimizerFactory(lr=7e-4, max_grad_norm=0.5),
        gamma=0.99, gae_lambda=0.95, ent_coef=0.01, vf_coef=0.5,
        deterministic_eval=True,
    )
    result = run_onpolicy(algo, repetitions=1, batch_size=0 or 2048, T=32, max_epochs=25)
    assert result.best_reward >= 195, f"best_reward {result.best_reward}"


def test_reinforce_improves():
    actor, _ = _actor_critic()
    algo = Reinforce(
        actor=actor, action_space=CartPole().action_space,
        optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.99, return_standardization=True, deterministic_eval=True,
    )
    result = run_onpolicy(algo, repetitions=1, batch_size=4096, T=256, max_epochs=10, stop=140)
    assert result.best_reward >= 140, f"best_reward {result.best_reward}"


def test_ppo_dual_and_value_clip():
    actor, critic = _actor_critic()
    algo = PPO(
        actor=actor, critic=critic, action_space=CartPole().action_space,
        optim=AdamOptimizerFactory(lr=3e-4, max_grad_norm=0.5),
        dual_clip=3.0, value_clip=True, deterministic_eval=True,
    )
    result = run_onpolicy(algo, max_epochs=8, stop=150)
    assert result.best_reward >= 150, f"best_reward {result.best_reward}"


def test_return_scaling_reference_semantics():
    """Pin the reference return-scaling contract (a2c.py:115-152): critic
    learns in running-std space (NO mean subtraction), GAE runs on
    UN-scaled values, and the running variance merges via parallel
    Welford. Regression test for the bug where within-batch (x-mean)/std
    standardization made dense-reward tasks unlearnable."""
    import numpy as np

    from tianshou_tpu.algorithm.modelfree.ppo import PPO
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
    from tianshou_tpu.env.core import Box
    from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, ContinuousCritic

    space = Box(low=[-1.0], high=[1.0])
    algo = PPO(
        actor=ContinuousActorProbabilistic(hidden_sizes=(8,), action_dim=1),
        critic=ContinuousCritic(hidden_sizes=(8,), use_action=False),
        action_space=space,
        optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.9, gae_lambda=1.0, return_standardization=True,
    )
    key = jax.random.key(0)
    ts = algo.init(key, jnp.zeros(3))
    assert "ret_var" in ts.extra  # running stats live in TrainState.extra

    # inject a known scale: std = 2
    extra = ts.extra.copy()
    extra.ret_var = jnp.float32(4.0)
    extra.ret_count = jnp.float32(100.0)
    ts = ts.replace(extra=extra)

    T, E = 4, 2
    rollout = Batch(
        obs=jnp.zeros((T, E, 3)),
        obs_next=jnp.zeros((T, E, 3)),
        act=jnp.zeros((T, E, 1)),
        rew=jnp.ones((T, E)),
        terminated=jnp.zeros((T, E), bool),
        truncated=jnp.zeros((T, E), bool),
    )
    batch = algo.process_rollout(ts, rollout, key)
    scale = float(jnp.sqrt(ts.extra.ret_var + 1e-8))
    v0 = float(algo.critic.apply(ts.params["critic"], jnp.zeros((1, 3)))[0])
    # returns are scaled back by the running std: unnorm = adv + v*scale
    np.testing.assert_allclose(
        np.asarray(batch.returns) * scale,
        np.asarray(batch.adv) + v0 * scale,
        rtol=1e-5,
    )
    # NO mean subtraction: constant positive rewards -> positive returns
    assert float(np.asarray(batch.returns).mean()) > 0.0
    assert "unnorm_returns" in batch

    # Welford merge matches pooled statistics
    x = np.asarray(batch.unnorm_returns)
    ts2 = algo.update_return_stats(ts, batch)
    assert "unnorm_returns" not in batch  # popped
    c0, m0, v0r = 100.0, 0.0, 4.0
    tot = c0 + x.size
    exp_mean = (m0 * c0 + x.sum()) / tot
    exp_var = (v0r * c0 + x.var() * x.size + (x.mean() - m0) ** 2 * c0 * x.size / tot) / tot
    np.testing.assert_allclose(float(ts2.extra.ret_mean), exp_mean, rtol=1e-5)
    np.testing.assert_allclose(float(ts2.extra.ret_var), exp_var, rtol=1e-4)
