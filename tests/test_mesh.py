"""Mesh sharding tests on the 8-device virtual CPU mesh: DP megastep,
dp x mp tensor parallelism, and trainer test_in_train early stop."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import make_collectors, transition_example
from tianshou_tpu.algorithm.modelfree.dqn import DQN
from tianshou_tpu.algorithm.modelfree.ppo import PPO
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.env.classic.cartpole import CartPole
from tianshou_tpu.env.core import VectorDeviceEnv
from tianshou_tpu.models.discrete import DiscreteActor, DiscreteCritic
from tianshou_tpu.models.mlp import Net
from tianshou_tpu.parallel.mesh import (
    make_dp_offpolicy_train_step,
    make_dp_train_step,
    make_mesh,
    make_mesh_2d,
    replicate,
    shard_params_tp,
)
from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams


def _ppo():
    env = CartPole()
    return env, PPO(
        actor=DiscreteActor(hidden_sizes=(64, 64), action_dim=2),
        critic=DiscreteCritic(hidden_sizes=(64, 64)),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=3e-4, max_grad_norm=0.5),
        deterministic_eval=True,
    )


def test_dp_step_runs_on_mesh():
    env, algo = _ppo()
    mesh = make_mesh(8)
    coll = DeviceCollector(VectorDeviceEnv(env, 32), algo, None)
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    ts = jax.device_put(algo.init(k1, jnp.zeros(4)), replicate(mesh))
    cstate = coll.reset(k2)
    step = make_dp_train_step(algo, coll, mesh, n_steps=8, repeat=2, batch_size=64)
    ts, cstate, stats = step(ts, cstate, k3)
    assert int(ts.step) == 2 * (8 * 32 // 64)


def test_tp_params_sharded_and_step_runs():
    env, algo = _ppo()
    mesh = make_mesh_2d(8, mp=2)
    coll = DeviceCollector(VectorDeviceEnv(env, 32), algo, None)
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    ts = algo.init(k1, jnp.zeros(4))
    ts = ts.replace(
        params=shard_params_tp(ts.params, mesh, "mp"),
        opt_state=jax.device_put(ts.opt_state, replicate(mesh)),
    )
    # a 64x64 kernel must actually be sharded over mp
    kernels = [x for x in jax.tree.leaves(ts.params) if getattr(x, "ndim", 0) == 2 and x.shape == (64, 64)]
    assert kernels and "mp" in str(kernels[0].sharding.spec)
    cstate = coll.reset(k2)
    step = make_dp_train_step(algo, coll, mesh, n_steps=8, repeat=1, batch_size=64, tp_axis="mp")
    ts2, _, _ = step(ts, cstate, k3)
    assert int(ts2.step) > 0
    # numerics match the unsharded single-device run
    ts_ref = algo.init(k1, jnp.zeros(4))
    cstate_ref = coll.reset(k2)
    step_ref = make_dp_train_step(algo, coll, make_mesh(1), n_steps=8, repeat=1, batch_size=64)
    ts_ref2, _, _ = step_ref(jax.device_put(ts_ref, replicate(make_mesh(1))), cstate_ref, k3)
    a = jax.tree.leaves(ts2.params)[0]
    b = jax.tree.leaves(ts_ref2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def _dqn(env):
    return DQN(
        model=Net(hidden_sizes=(64, 64), output_dim=2),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.97, n_step_return_horizon=3, target_update_freq=8, eps_training=0.3,
    )


def _offpolicy_mesh_run(n_devices: int):
    """One sharded-buffer DQN megastep on an n-device dp mesh."""
    env = CartPole()
    algo = _dqn(env)
    mesh = make_mesh(n_devices)
    E = 16
    buffer = VectorReplayBuffer(total_size=64 * E, buffer_num=E)
    coll = DeviceCollector(VectorDeviceEnv(env, E), algo, buffer)
    key = jax.random.key(7)
    k1, k2, k3 = jax.random.split(key, 3)
    ts = jax.device_put(algo.init(k1, jnp.zeros(4)), replicate(mesh))
    cstate = coll.reset(k2)
    bs = buffer.init(transition_example(env))
    step = make_dp_offpolicy_train_step(algo, coll, buffer, mesh, n_steps=16, n_updates=4, batch_size=32)
    ts, cstate, bs, out, ustats = step(ts, cstate, bs, k3)
    return ts, bs, out


def test_offpolicy_dp_step_runs_on_mesh():
    ts, bs, out = _offpolicy_mesh_run(8)
    assert int(ts.step) == 4
    # the replay ring storage really is sharded over dp on the env axis
    store = jax.tree.leaves(bs.data)[0]
    assert "dp" in str(store.sharding.spec)
    assert int(bs.size.sum()) == 16 * 16  # every collected step landed


def test_offpolicy_mesh_matches_single_device():
    """Sharding must not change the numerics: 8-device run == 1-device run."""
    ts8, _, _ = _offpolicy_mesh_run(8)
    ts1, _, _ = _offpolicy_mesh_run(1)
    for a, b in zip(jax.tree.leaves(ts8.params), jax.tree.leaves(ts1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_test_in_train_early_stop():
    env = CartPole()
    algo = DQN(
        model=Net(hidden_sizes=(64, 64), output_dim=2),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.97, n_step_return_horizon=3, target_update_freq=320, eps_training=0.3,
    )
    key = jax.random.key(0)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(4))
    buffer = VectorReplayBuffer(total_size=20000, buffer_num=10)
    bs = buffer.init(transition_example(env))
    tc, ec = make_collectors(env, algo, buffer)
    params = OffPolicyTrainerParams(
        max_epochs=15, epoch_num_steps=100000,  # huge epochs: only test_in_train can stop early
        test_step_num_episodes=10, batch_size=64, collection_step_num_env_steps=10,
        update_per_step=0.1, start_steps=1000,
        stop_fn=lambda r: r >= 180, test_in_train=True,
        train_fn=lambda ep, step: {"eps_training": max(0.1, 0.3 * (1 - step / 30000))},
        verbose=False,
    )
    res = OffPolicyTrainer(algo, tc, ec, buffer, params).run(ts, bs, key)
    assert res.best_reward >= 180
    assert res.env_step < 100000  # stopped inside the first epoch
