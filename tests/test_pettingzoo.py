"""Real-PettingZoo MARL path: the AEC adapter + MARL dispatcher over
pettingzoo.classic tic-tac-toe (reference test/pettingzoo/test_tic_tac_toe.py
runs the same env through PettingZooEnv; full-strength self-play training is
covered CI-cheaply by tests/test_marl.py on the built-in board)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pettingzoo = pytest.importorskip("pettingzoo")

from tianshou_tpu.algorithm.multiagent.marl import MultiAgentOffPolicyAlgorithm
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.data.host_collector import HostCollector
from tianshou_tpu.env.pettingzoo_env import PettingZooEnv
from tianshou_tpu.env.venvs import DummyVectorEnv
from tests.test_marl import make_dqn, obs_example


def make_env():
    from pettingzoo.classic import tictactoe_v3

    return PettingZooEnv(tictactoe_v3.env())


def test_pettingzoo_adapter_contract():
    env = make_env()
    obs, _ = env.reset(seed=0)
    assert set(obs) == {"agent_id", "obs", "mask"}
    assert obs["obs"].shape == (3, 3, 2) and obs["mask"].shape == (9,)
    # zero-sum at game end, per-agent reward vector (pettingzoo_env.py:50)
    done, rew = False, None
    o = obs
    rng = np.random.default_rng(0)
    while not done:
        o, rew, done, trunc, _ = env.step(int(rng.choice(np.flatnonzero(o["mask"]))))
    assert rew.shape == (2,) and rew.sum() == 0.0 and abs(rew[0]) in (0.0, 1.0)
    env.close()


def test_pettingzoo_marl_collect_and_update():
    envs = DummyVectorEnv([make_env for _ in range(4)])
    marl = MultiAgentOffPolicyAlgorithm([make_dqn(), make_dqn()], action_space=envs.action_space)
    key = jax.random.key(0)
    key, k1 = jax.random.split(key)
    ts = marl.init(k1, obs_example())

    buffer = VectorReplayBuffer(total_size=4000, buffer_num=4)
    example = Batch(
        obs=obs_example(), act=jnp.int32(0), rew=jnp.zeros(2),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=obs_example(),
    )
    coll = HostCollector(envs, marl, buffer)
    coll.reset(seed=0)
    coll.buf_state = buffer.init(example)

    key, kc = jax.random.split(key)
    stats = coll.collect(ts, kc, n_step=300)
    assert int(coll.buf_state.size.sum()) == 300
    # episode returns come from the env's true reward vector (zero-sum ±1 or draw)
    assert stats.n_collected_episodes > 0
    assert set(np.unique(np.abs(stats.returns))) <= {0.0, 1.0}

    update_jit = jax.jit(lambda ts, bs, k: marl.update(ts, buffer, bs, k, 64))
    for _ in range(5):
        key, ku = jax.random.split(key)
        ts, coll.buf_state, tr_stats = update_jit(ts, coll.buf_state, ku)
    # both agents' Q-losses are live and finite
    for agent in ("agent0", "agent1"):
        assert np.isfinite(float(tr_stats[agent].loss))
    envs.close()
