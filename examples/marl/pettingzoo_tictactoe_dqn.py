"""DQN self-play on the REAL PettingZoo tic-tac-toe (pettingzoo.classic
tictactoe_v3) through the AEC adapter + MARL dispatcher — the analogue of
reference test/pettingzoo/tic_tac_toe.py, which drives the same PettingZoo
env. Demonstrates that any pettingzoo.classic AEC game with discrete actions
and an action_mask runs through the host MARL path unchanged."""

import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))  # run without install


import flax.linen as nn
import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.modelfree.dqn import DQN
from tianshou_tpu.algorithm.multiagent.marl import MARLRandomPolicy, MultiAgentOffPolicyAlgorithm
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.data.host_collector import HostCollector
from tianshou_tpu.env.core import Discrete
from tianshou_tpu.env.pettingzoo_env import PettingZooEnv
from tianshou_tpu.env.venvs import DummyVectorEnv
from tianshou_tpu.models.mlp import MLP


def make_env():
    from pettingzoo.classic import tictactoe_v3

    return PettingZooEnv(tictactoe_v3.env())


class BoardQNet(nn.Module):
    @nn.compact
    def __call__(self, obs):
        return MLP((128, 128), 9)(obs.obs.reshape(obs.obs.shape[0], -1))


def make_dqn():
    return DQN(model=BoardQNet(), action_space=Discrete(9),
               optim=AdamOptimizerFactory(lr=1e-3), gamma=0.9,
               target_update_freq=200, eps_training=0.2)


if __name__ == "__main__":
    obs0 = Batch(agent_id=jnp.int32(0), obs=jnp.zeros((3, 3, 2)), mask=jnp.ones(9, bool))
    marl = MultiAgentOffPolicyAlgorithm([make_dqn(), make_dqn()], action_space=Discrete(9))
    key = jax.random.key(0)
    key, k = jax.random.split(key)
    ts = marl.init(k, obs0)

    envs = DummyVectorEnv([make_env for _ in range(8)])
    buffer = VectorReplayBuffer(total_size=20000, buffer_num=8)
    coll = HostCollector(envs, marl, buffer)
    coll.reset(seed=0)
    coll.buf_state = buffer.init(Batch(obs=obs0, act=jnp.int32(0), rew=jnp.zeros(2),
                                       terminated=jnp.bool_(False), truncated=jnp.bool_(False), obs_next=obs0))
    update = jax.jit(lambda ts, bs, k: marl.update(ts, buffer, bs, k, 64))
    key, k = jax.random.split(key)
    coll.collect(ts, k, n_step=500)
    for it in range(200):
        key, kc, ku = jax.random.split(key, 3)
        coll.collect(ts, kc, n_step=64)
        ts, coll.buf_state, _ = update(ts, coll.buf_state, ku)

    # evaluate trained agent 0 vs the mask-aware random baseline
    eval_marl = MultiAgentOffPolicyAlgorithm(
        [marl.algorithms[0], MARLRandomPolicy(Discrete(9))], action_space=Discrete(9))
    ets = {"agent0": ts["agent0"], "agent1": eval_marl.algorithms[1].init(key, obs0)}
    eval_envs = DummyVectorEnv([make_env for _ in range(8)])
    ec = HostCollector(eval_envs, eval_marl, None)
    ec.reset(seed=1)
    key, ke = jax.random.split(key)
    stats = ec.collect(ets, ke, n_episode=100, training=False)
    print(f"win rate vs random: {(stats.returns > 0).mean():.2f}")
    envs.close()
    eval_envs.close()
