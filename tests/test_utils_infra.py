"""Logger, persistence, stats, determinism tests (reference
test/base/test_logger.py, test_stats.py, determinism harness §4.4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tests.helpers import make_collectors, transition_example
from tianshou_tpu.algorithm.modelfree.dqn import DQN
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import ReplayBuffer, VectorReplayBuffer
from tianshou_tpu.data.stats import SequenceSummaryStats
from tianshou_tpu.env.classic.cartpole import CartPole
from tianshou_tpu.models.mlp import Net
from tianshou_tpu.trainer.trainer import OffPolicyTrainer, OffPolicyTrainerParams
from tianshou_tpu.utils.determinism import (
    TraceDeterminismTest,
    TraceLogger,
    TraceLoggerContext,
    trace_param_hash,
)
from tianshou_tpu.utils.logger.base import LazyLogger
from tianshou_tpu.utils.logger.tensorboard import TensorboardLogger
from tianshou_tpu.utils.persistence import (
    buffer_from_data,
    load_buffer_hdf5,
    restore_train_state,
    save_buffer_hdf5,
    save_train_state,
)
from tianshou_tpu.utils.statistics import MovAvg, RunningMeanStd


def test_movavg_bans_nan():
    m = MovAvg(size=4)
    m.add([1.0, 2.0, np.nan, np.inf])
    assert m.get() == 1.5
    m.add(3.0)
    assert m.get() == 2.0


def test_running_mean_std(rng):
    rms = RunningMeanStd()
    data = rng.normal(3.0, 2.0, size=(1000, 4))
    rms.update(data[:500])
    rms.update(data[500:])
    np.testing.assert_allclose(rms.mean, data.mean(0), rtol=1e-6)
    np.testing.assert_allclose(np.sqrt(rms.var), data.std(0), rtol=1e-5)


def test_sequence_summary():
    s = SequenceSummaryStats.from_sequence([1, 2, 3])
    assert (s.mean, s.max, s.min) == (2.0, 3.0, 1.0)
    assert SequenceSummaryStats.from_sequence([]).mean == 0.0


def test_tensorboard_logger(tmp_path):
    lg = TensorboardLogger(log_dir=str(tmp_path), train_interval=5)
    lg.log_train_data({"train/reward": 1.0}, step=0)
    lg.log_train_data({"train/reward": 2.0}, step=3)  # below interval: skipped
    lg.log_train_data({"train/reward": 3.0}, step=10)
    lg.save_data(epoch=2, env_step=10, gradient_step=7)
    lg2 = TensorboardLogger(log_dir=str(tmp_path))
    assert lg2.restore_data() == (2, 10, 7)
    assert any(f.startswith("events") for f in os.listdir(tmp_path))
    LazyLogger().log_train_data({"x": 1}, 0)  # no-op


def _small_dqn():
    env = CartPole()
    algo = DQN(
        model=Net(hidden_sizes=(32, 32), output_dim=2),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.97, n_step_return_horizon=2, target_update_freq=50, eps_training=0.2,
    )
    return env, algo


def test_train_state_checkpoint_roundtrip(tmp_path):
    env, algo = _small_dqn()
    ts = algo.init(jax.random.key(0), jnp.zeros(4))
    # take a few updates so optimizer state is non-trivial
    buffer = VectorReplayBuffer(total_size=512, buffer_num=4)
    bs = buffer.init(transition_example(env))
    tc, _ = make_collectors(env, algo, buffer, n_train=4, n_test=4)
    cstate = tc.reset(jax.random.key(1))
    cstate, bs, _ = tc.collect(ts, cstate, bs, jax.random.key(2), 64)
    for i in range(3):
        ts, bs, _ = algo.update(ts, buffer, bs, jax.random.key(3 + i), 32)
    path = str(tmp_path / "ckpt")
    save_train_state(path, ts)
    template = algo.init(jax.random.key(9), jnp.zeros(4))  # different params
    restored = restore_train_state(path, template)
    assert trace_param_hash(restored.params) == trace_param_hash(ts.params)
    assert trace_param_hash(restored.opt_state) == trace_param_hash(ts.opt_state)
    assert int(restored.step) == int(ts.step)


def test_buffer_hdf5_roundtrip(tmp_path):
    env, _ = _small_dqn()
    buf = ReplayBuffer(16)
    state = buf.init(transition_example(env))
    for i in range(5):
        t = jax.tree.map(
            lambda x: jnp.asarray(x)[None],
            Batch(obs=jnp.full(4, float(i)), act=jnp.int32(i % 2), rew=jnp.float32(i),
                  terminated=jnp.bool_(i == 4), truncated=jnp.bool_(False), obs_next=jnp.full(4, i + 1.0)),
        )
        state, _ = buf.add(state, t)
    p = str(tmp_path / "buf.h5")
    save_buffer_hdf5(p, state)
    state2 = load_buffer_hdf5(p)
    np.testing.assert_array_equal(np.asarray(state2.data.obs), np.asarray(state.data.obs))
    np.testing.assert_array_equal(np.asarray(state2.cursor), np.asarray(state.cursor))
    # sampling works from the restored state
    batch, _ = buf.sample(state2, jax.random.key(0), 8)
    assert batch.obs.shape == (8, 4)


def test_buffer_from_data():
    n = 32
    buf, state = buffer_from_data(
        ReplayBuffer,
        obs=np.random.randn(n, 3).astype(np.float32),
        act=np.random.randn(n, 1).astype(np.float32),
        rew=np.random.randn(n).astype(np.float32),
        terminated=np.zeros(n, bool),
        truncated=np.zeros(n, bool),
        obs_next=np.random.randn(n, 3).astype(np.float32),
    )
    assert int(buf.num_stored(state)) == n
    batch, idx = buf.sample(state, jax.random.key(0), 16)
    assert batch.obs.shape == (16, 3)


def _run_traced(seed):
    env, algo = _small_dqn()
    key = jax.random.key(seed)
    key, k1 = jax.random.split(key)
    ts = algo.init(k1, jnp.zeros(4))
    buffer = VectorReplayBuffer(total_size=1024, buffer_num=4)
    bs = buffer.init(transition_example(env))
    tc, _ = make_collectors(env, algo, buffer, n_train=4, n_test=4)
    cstate = tc.reset(key)
    with TraceLoggerContext() as tl:
        for i in range(3):
            key, kc, ku = jax.random.split(key, 3)
            cstate, bs, out = tc.collect(ts, cstate, bs, kc, 32)
            TraceLogger.log("collect", lambda: f"done={int(np.asarray(out.done).sum())}")
            ts, bs, stats = algo.update(ts, buffer, bs, ku, 32)
            TraceLogger.log("update", lambda: f"params={trace_param_hash(ts.params)}")
        trace = tl.get_trace()
    return trace, trace_param_hash(ts.params)


def test_determinism_same_seed(tmp_path):
    t1, h1 = _run_traced(0)
    t2, h2 = _run_traced(0)
    assert h1 == h2
    assert t1 == t2
    # snapshot harness: first run creates, second compares
    det = TraceDeterminismTest(str(tmp_path))
    det.check("dqn_small", t1)
    det.check("dqn_small", t2)
    try:
        det.check("dqn_small", t1[:-1] + ["update: params=deadbeef"])
        raise RuntimeError("should have failed")
    except AssertionError:
        pass


def test_determinism_different_seed():
    _, h1 = _run_traced(0)
    _, h2 = _run_traced(1)
    assert h1 != h2


def test_rliable_curves_and_plot(tmp_path):
    """Load multi-seed TB curves, aggregate IQM + CI band, render the plot
    (reference rliable_evaluation.py LoggedCollectStats/eval_results)."""
    import numpy as np

    from tianshou_tpu.evaluation.rliable_evaluation import (
        load_and_eval_experiments,
        plot_iqm_curve,
    )
    from tianshou_tpu.utils.logger.tensorboard import TensorboardLogger

    dirs = []
    for seed in range(3):
        d = str(tmp_path / f"run{seed}")
        lg = TensorboardLogger(log_dir=d, test_interval=1)
        for i, step in enumerate([0, 100, 200, 300]):
            lg.write("test/env_step", step, {"test/reward": float(seed + i * 10)})
        lg.writer.close()  # event file must be closed for the accumulator to see it
        dirs.append(d)
    grid, iqm_c, lo, hi, summary = load_and_eval_experiments(dirs, n_boot=200)
    assert len(grid) == 4 and np.all(np.diff(iqm_c) > 0)
    assert summary.n_runs == 3 and lo[-1] <= summary.iqm <= hi[-1] + 1e-9
    out = str(tmp_path / "curve.png")
    plot_iqm_curve(grid, iqm_c, lo, hi, title="t", out_path=out)
    import os
    assert os.path.getsize(out) > 0
