"""Per-algorithm determinism regression (the reference runs a
``test_*_determinism`` variant for every algorithm, test/determinism_test.py).
Under JAX the property is strong: same key => bit-identical params. Covered
here across the main algorithm families with short runs."""

import jax
import jax.numpy as jnp
import pytest

from tests.helpers import make_collectors, transition_example
from tianshou_tpu.algorithm.modelfree.ppo import PPO
from tianshou_tpu.algorithm.modelfree.sac import SAC
from tianshou_tpu.algorithm.modelfree.c51 import C51
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.env.classic.cartpole import CartPole
from tianshou_tpu.env.classic.pendulum import Pendulum
from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, ContinuousCritic
from tianshou_tpu.models.discrete import DiscreteActor, DiscreteCritic
from tianshou_tpu.models.mlp import Net
from tianshou_tpu.utils.determinism import trace_param_hash


def _run_ppo(seed):
    env = CartPole()
    algo = PPO(
        actor=DiscreteActor(hidden_sizes=(32, 32), action_dim=2),
        critic=DiscreteCritic(hidden_sizes=(32, 32)),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=3e-4),
    )
    key = jax.random.key(seed)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(4))
    tc, _ = make_collectors(env, algo, None, n_train=4, n_test=4)
    cstate = tc.reset(key)
    for i in range(2):
        key, kc, ku = jax.random.split(key, 3)
        cstate, _, out = tc.collect(ts, cstate, None, kc, 16, keep_rollout=True)
        ts, _ = jax.jit(
            lambda ts, r, k: algo.update_rollout(ts, r, k, repeat=2, batch_size=32)
        )(ts, out.rollout, ku)
    return trace_param_hash(ts.params)


def _run_sac(seed):
    env = Pendulum()
    algo = SAC(
        actor=ContinuousActorProbabilistic(hidden_sizes=(32, 32), action_dim=1, conditioned_sigma=True),
        critic=ContinuousCritic(hidden_sizes=(32, 32)),
        action_space=env.action_space,
    )
    key = jax.random.key(seed)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(3))
    buffer = VectorReplayBuffer(total_size=512, buffer_num=4)
    bs = buffer.init(transition_example(env))
    tc, _ = make_collectors(env, algo, buffer, n_train=4, n_test=4)
    cstate = tc.reset(key)
    cstate, bs, _ = tc.collect(ts, cstate, bs, key, 32)
    for i in range(3):
        key, ku = jax.random.split(key)
        ts, bs, _ = algo.update(ts, buffer, bs, ku, 32)
    return trace_param_hash(ts.params)


def _run_c51(seed):
    env = CartPole()
    algo = C51(
        model=Net(hidden_sizes=(32, 32), output_dim=2, num_atoms=17, softmax=True),
        action_space=env.action_space, num_atoms=17, v_min=0.0, v_max=100.0,
        optim=AdamOptimizerFactory(lr=1e-3), target_update_freq=10,
    )
    key = jax.random.key(seed)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(4))
    buffer = VectorReplayBuffer(total_size=512, buffer_num=4)
    bs = buffer.init(transition_example(env))
    tc, _ = make_collectors(env, algo, buffer, n_train=4, n_test=4)
    cstate = tc.reset(key)
    cstate, bs, _ = tc.collect(ts, cstate, bs, key, 32)
    for i in range(3):
        key, ku = jax.random.split(key)
        ts, bs, _ = algo.update(ts, buffer, bs, ku, 32)
    return trace_param_hash(ts.params)


@pytest.mark.parametrize("runner", [_run_ppo, _run_sac, _run_c51], ids=["ppo", "sac", "c51"])
def test_algorithm_determinism(runner):
    h1, h2, h3 = runner(0), runner(0), runner(1)
    assert h1 == h2, "same seed must be bit-identical"
    assert h1 != h3, "different seed must diverge"
