"""Parity extras: shared-memory venv, async host collector, device collector
hooks, trainer resume-from-log (reference ShmemVectorEnv, AsyncCollector,
Step/EpisodeRolloutHook, resume_from_log)."""

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import make_collectors, transition_example
from tianshou_tpu.algorithm.modelfree.dqn import DQN
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.async_collector import AsyncHostCollector
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.env.classic.cartpole import CartPole
from tianshou_tpu.env.core import Discrete, VectorDeviceEnv
from tianshou_tpu.env.shmem import ShmemVectorEnv
from tianshou_tpu.env.venvs import DummyVectorEnv, SubprocVectorEnv
from tianshou_tpu.models.mlp import Net
from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams
from tianshou_tpu.utils.logger.tensorboard import TensorboardLogger


def make_cp():
    return gym.make("CartPole-v1")


def _dqn():
    return DQN(
        model=Net(hidden_sizes=(32, 32), output_dim=2),
        action_space=Discrete(2),
        optim=AdamOptimizerFactory(lr=1e-3),
        eps_training=0.2,
    )


def test_shmem_venv_matches_dummy():
    d = DummyVectorEnv([make_cp for _ in range(2)])
    s = ShmemVectorEnv([make_cp for _ in range(2)])
    od, _ = d.reset(seed=3)
    os_, _ = s.reset(seed=3)
    np.testing.assert_allclose(od, os_, rtol=1e-6)
    for _ in range(10):
        a = np.random.randint(0, 2, size=2)
        rd, rs = d.step(a), s.step(a)
        np.testing.assert_allclose(rd[0], rs[0], rtol=1e-6)
        np.testing.assert_allclose(rd[1], rs[1])
        np.testing.assert_array_equal(rd[2], rs[2])
    d.close()
    s.close()


def test_async_host_collector():
    venv = SubprocVectorEnv([make_cp for _ in range(4)], wait_num=2)
    algo = _dqn()
    ts = algo.init(jax.random.key(0), jnp.zeros(4))
    buffer = VectorReplayBuffer(total_size=400, buffer_num=4)
    coll = AsyncHostCollector(venv, algo, buffer)
    coll.reset(seed=0)
    coll.buf_state = buffer.init(
        Batch(obs=jnp.zeros(4), act=jnp.int32(0), rew=jnp.float32(0),
              terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=jnp.zeros(4))
    )
    stats = coll.collect(ts, jax.random.key(1), n_step=60)
    assert stats.n_collected_steps >= 60
    assert int(coll.buf_state.size.sum()) >= 60
    # stored obs/act stay per-env consistent: obs_next of slot i == obs of slot i+1
    data = coll.buf_state.data
    for e in range(4):
        n = int(coll.buf_state.size[e])
        if n > 2:
            same_ep = ~np.asarray(data.done[e, : n - 1])
            o_next = np.asarray(data.obs_next[e, : n - 1])[same_ep]
            o = np.asarray(data.obs[e, 1:n])[same_ep]
            np.testing.assert_allclose(o_next, o, rtol=1e-5)
    venv.close()


def test_device_collector_hooks():
    env = CartPole()
    algo = _dqn()
    ts = algo.init(jax.random.key(0), jnp.zeros(4))
    seen = []

    def step_hook(tr):
        tr = tr.copy()
        tr.rew = tr.rew * 2.0  # reward shaping inside the jitted scan
        return tr

    buffer = VectorReplayBuffer(total_size=100, buffer_num=2)
    coll = DeviceCollector(
        VectorDeviceEnv(env, 2), algo, buffer,
        on_step_hook=step_hook,
        on_episode_done_hook=lambda stats: seen.append(stats.n_collected_episodes),
    )
    bs = buffer.init(transition_example(env))
    cstate = coll.reset(jax.random.key(1))
    cstate, bs, out = coll.collect(ts, cstate, bs, jax.random.key(2), 30)
    np.testing.assert_allclose(np.asarray(bs.data.rew[0, :5]), 2.0)  # shaped
    assert seen and seen[0] == int(np.asarray(out.done).sum())


def test_trainer_resume_from_log(tmp_path):
    env = CartPole()
    algo = _dqn()
    ts = algo.init(jax.random.key(0), jnp.zeros(4))
    buffer = VectorReplayBuffer(total_size=2000, buffer_num=4)
    bs = buffer.init(transition_example(env))
    tc, ec = make_collectors(env, algo, buffer, n_train=4, n_test=4)
    logger = TensorboardLogger(log_dir=str(tmp_path))
    params = OffPolicyTrainerParams(
        max_epochs=2, epoch_num_steps=400, test_step_num_episodes=2,
        batch_size=32, collection_step_num_env_steps=10, update_per_step=0.1,
        start_steps=200, logger=logger, verbose=False,
    )
    res = OffPolicyTrainer(algo, tc, ec, buffer, params).run(ts, bs, jax.random.key(1))
    assert res.epochs == 2
    # resume: new trainer picks up counters and runs only the remaining epochs
    logger2 = TensorboardLogger(log_dir=str(tmp_path))
    params2 = OffPolicyTrainerParams(
        max_epochs=4, epoch_num_steps=400, test_step_num_episodes=2,
        batch_size=32, collection_step_num_env_steps=10, update_per_step=0.1,
        logger=logger2, resume_from_log=True, verbose=False,
    )
    tr2 = OffPolicyTrainer(algo, tc, ec, buffer, params2)
    assert tr2.start_epoch == 2 and tr2.env_step == res.env_step
    res2 = tr2.run(res.train_state, res.buf_state, jax.random.key(2))
    assert res2.epochs == 4
    assert res2.env_step > res.env_step
