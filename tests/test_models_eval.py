"""Atari net shapes, evaluation aggregation, space info, random policy."""

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.algorithm.random_policy import RandomActionPolicy
from tianshou_tpu.env.classic.cartpole import CartPole
from tianshou_tpu.env.classic.pendulum import Pendulum
from tianshou_tpu.env.core import VectorDeviceEnv
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.evaluation.launcher import run_seeded_experiments
from tianshou_tpu.evaluation.rliable_evaluation import eval_results, iqm, stratified_bootstrap_ci
from tianshou_tpu.models.atari import C51Net, DQNet, QRDQNet, RainbowAtariNet
from tianshou_tpu.utils.space_info import SpaceInfo


def test_atari_net_shapes():
    key = jax.random.key(0)
    obs = jnp.zeros((2, 84, 84, 4), jnp.uint8)
    q = DQNet(action_dim=6)
    params = q.init(key, obs)
    assert q.apply(params, obs).shape == (2, 6)
    c = C51Net(action_dim=6, num_atoms=51)
    cp = c.init(key, obs)
    probs = c.apply(cp, obs)
    assert probs.shape == (2, 6, 51)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-4)
    r = RainbowAtariNet(action_dim=6, num_atoms=51)
    rp = r.init(key, obs)
    assert r.apply(rp, obs, noise_key=key).shape == (2, 6, 51)
    qr = QRDQNet(action_dim=6, num_quantiles=32)
    qp = qr.init(key, obs)
    assert qr.apply(qp, obs).shape == (2, 6, 32)
    # NCHW input also accepted
    assert q.apply(params, jnp.zeros((2, 4, 84, 84), jnp.uint8)).shape == (2, 6)


def test_iqm_and_ci():
    scores = np.array([1.0, 2.0, 3.0, 4.0, 100.0])
    assert iqm(scores) < scores.mean()  # robust to the outlier
    lo, hi = stratified_bootstrap_ci(scores[:, None], n_boot=200)
    assert lo <= iqm(scores) <= hi
    s = eval_results(np.array([10.0, 12.0, 11.0, 9.0, 13.0]), n_boot=200)
    assert 9 <= s.ci_low <= s.iqm <= s.ci_high <= 13.5
    assert s.n_runs == 5


def test_multi_seed_launcher(tmp_path):
    from tianshou_tpu.highlevel.config import ExperimentConfig, OnPolicyTrainingConfig
    from tianshou_tpu.highlevel.experiment import ReinforceExperimentBuilder

    def builder(seed):
        return ReinforceExperimentBuilder(
            lambda: CartPole(),
            ExperimentConfig(seed=seed, persistence_enabled=False),
            OnPolicyTrainingConfig(max_epochs=1, epoch_num_steps=1024, num_train_envs=8, num_test_envs=4,
                                   test_step_num_episodes=2),
        )

    res = run_seeded_experiments(builder, seeds=[0, 1], run_name=str(tmp_path / "rs"))
    assert len(res.successes) == 2 and not res.failures
    scores = np.array([r.best_reward for _, r in res.successes])
    summary = eval_results(scores, n_boot=100)
    assert summary.n_runs == 2


def test_space_info():
    si = SpaceInfo.from_env(CartPole())
    assert si.action_info.action_dim == 2
    assert si.observation_info.obs_shape == (4,)
    sp = SpaceInfo.from_env(Pendulum())
    assert sp.action_info.action_dim == 1
    assert sp.action_info.max_action == 2.0
    import gymnasium as gym

    sg = SpaceInfo.from_env(gym.make("CartPole-v1"))
    assert sg.action_info.action_dim == 2


def test_random_policy_collects():
    env = Pendulum()
    algo = RandomActionPolicy(env.action_space)
    ts = algo.init(jax.random.key(0), jnp.zeros(3))
    coll = DeviceCollector(VectorDeviceEnv(env, 4), algo, None)
    cstate = coll.reset(jax.random.key(1))
    cstate, _, out = coll.collect(ts, cstate, None, jax.random.key(2), 50, training=False)
    stats = coll.stats_from(out)
    assert stats.n_collected_steps == 200
