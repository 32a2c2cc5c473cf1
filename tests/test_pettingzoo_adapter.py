"""Exercise the real :class:`PettingZooEnv` adapter code paths without the
optional dependency: a faithful in-test stub of the PettingZoo AEC API
(``pettingzoo.utils.env.AECEnv`` + a turn-based tic-tac-toe implementing it)
is installed into ``sys.modules``, and the adapter is driven through reset /
step / masking / reward-vector / termination plus a full host-collector
episode sweep (reference test/pettingzoo/test_tic_tac_toe.py exercises the
same adapter surface via the real dependency, env/pettingzoo_env.py:20)."""

import sys
import types

import jax
import numpy as np
import pytest

_WIN_LINES = [
    (0, 1, 2), (3, 4, 5), (6, 7, 8),
    (0, 3, 6), (1, 4, 7), (2, 5, 8),
    (0, 4, 8), (2, 4, 6),
]


def _install_fake_pettingzoo():
    """Minimal but API-faithful pettingzoo.utils.env module."""
    if "pettingzoo" in sys.modules:
        return sys.modules["pettingzoo.utils.env"].AECEnv

    class AECEnv:  # matches the real base class surface the adapter touches
        def last(self):
            a = self.agent_selection
            return (
                self.observe(a),
                self._cumulative_rewards[a],
                self.terminations[a],
                self.truncations[a],
                self.infos[a],
            )

    pz = types.ModuleType("pettingzoo")
    utils = types.ModuleType("pettingzoo.utils")
    envmod = types.ModuleType("pettingzoo.utils.env")
    envmod.AECEnv = AECEnv
    pz.utils = utils
    utils.env = envmod
    sys.modules["pettingzoo"] = pz
    sys.modules["pettingzoo.utils"] = utils
    sys.modules["pettingzoo.utils.env"] = envmod
    return AECEnv


class _Discrete9:
    n = 9

    def sample(self):
        return int(np.random.default_rng().integers(9))


class _BoardSpace:
    shape = (3, 3, 2)


def _make_aec_tictactoe():
    AECEnv = _install_fake_pettingzoo()

    class AecTicTacToe(AECEnv):
        """Tic-tac-toe speaking the AEC protocol: agent_selection rotation,
        observe() with action_mask, per-agent rewards/terminations dicts."""

        metadata = {"name": "aec_tictactoe"}

        def __init__(self) -> None:
            self.possible_agents = ["player_1", "player_2"]
            self.agents = list(self.possible_agents)
            self.reset()

        def observation_space(self, agent):
            return _BoardSpace()

        def action_space(self, agent):
            return _Discrete9()

        def observe(self, agent):
            i = self.possible_agents.index(agent)
            own = (self.board == i + 1).astype(np.float32).reshape(3, 3)
            opp = (self.board == 2 - i).astype(np.float32).reshape(3, 3)
            return {
                "observation": np.stack([own, opp], axis=-1),
                "action_mask": (self.board == 0).astype(np.int8),
            }

        def reset(self, seed=None, options=None):
            self.board = np.zeros(9, np.int8)
            self.agents = list(self.possible_agents)
            self.agent_selection = self.agents[0]
            self.rewards = {a: 0.0 for a in self.agents}
            self._cumulative_rewards = {a: 0.0 for a in self.agents}
            self.terminations = {a: False for a in self.agents}
            self.truncations = {a: False for a in self.agents}
            self.infos = {a: {} for a in self.agents}

        def step(self, action):
            agent = self.agent_selection
            i = self.possible_agents.index(agent)
            other = self.possible_agents[1 - i]
            self.rewards = {a: 0.0 for a in self.possible_agents}
            if self.terminations[agent] or self.truncations[agent]:
                return
            assert self.board[action] == 0, "illegal move reached the env"
            self.board[action] = i + 1
            won = any(all(self.board[j] == i + 1 for j in line) for line in _WIN_LINES)
            draw = bool((self.board != 0).all())
            if won:
                self.rewards[agent] = 1.0
                self.rewards[other] = -1.0
            if won or draw:
                self.terminations = {a: True for a in self.possible_agents}
            self._cumulative_rewards = dict(self.rewards)
            self.agent_selection = other

        def render(self):
            return str(self.board.reshape(3, 3))

        def close(self):
            pass

    return AecTicTacToe()


@pytest.fixture
def adapted():
    from tianshou_tpu.env.pettingzoo_env import PettingZooEnv

    return PettingZooEnv(_make_aec_tictactoe())


def test_adapter_contract(adapted):
    obs, info = adapted.reset(seed=0)
    assert set(obs) == {"agent_id", "obs", "mask"}
    assert obs["agent_id"] == 0
    assert obs["obs"].shape == (3, 3, 2)
    assert obs["mask"].dtype == bool and obs["mask"].all()
    assert adapted.agents == ["player_1", "player_2"]
    assert adapted.action_space.n == 9

    # after one move: agent_id rotates, mask excludes the played square
    obs, rew, term, trunc, _ = adapted.step(4)
    assert obs["agent_id"] == 1
    assert not obs["mask"][4] and obs["mask"].sum() == 8
    assert rew.shape == (2,) and not term and not trunc


def test_adapter_win_rewards_and_termination(adapted):
    adapted.reset(seed=0)
    # player 0 takes the top row; player 1 plays the middle row
    for a in [0, 3, 1, 4]:
        _, rew, term, _, _ = adapted.step(a)
        assert not term
    obs, rew, term, _, _ = adapted.step(2)
    assert term
    np.testing.assert_array_equal(rew, np.array([1.0, -1.0], np.float32))


def test_adapter_through_host_collector():
    """Full sweep: vectorized adapter envs + MARL random policies through the
    host collector, episodes complete and returns are zero-sum-or-draw."""
    from tianshou_tpu.algorithm.multiagent.marl import (
        MARLRandomPolicy,
        MultiAgentOffPolicyAlgorithm,
    )
    from tianshou_tpu.data.batch import Batch
    from tianshou_tpu.data.host_collector import HostCollector
    from tianshou_tpu.env.core import Discrete
    from tianshou_tpu.env.pettingzoo_env import PettingZooEnv
    from tianshou_tpu.env.venvs import DummyVectorEnv

    import jax.numpy as jnp

    envs = DummyVectorEnv([lambda: PettingZooEnv(_make_aec_tictactoe()) for _ in range(4)])
    marl = MultiAgentOffPolicyAlgorithm(
        [MARLRandomPolicy(Discrete(9)), MARLRandomPolicy(Discrete(9))],
        action_space=Discrete(9),
    )
    obs_ex = Batch(agent_id=jnp.int32(0), obs=jnp.zeros((3, 3, 2)), mask=jnp.ones(9, bool))
    key = jax.random.key(0)
    ts = marl.init(key, obs_ex)
    coll = HostCollector(envs, marl, None)
    coll.reset(seed=0)
    stats = coll.collect(ts, key, n_episode=12, training=False)
    envs.close()
    assert stats.n_collected_episodes >= 12
    # tic-tac-toe returns for player 0: win +1, loss -1, draw 0
    assert set(np.unique(stats.returns)) <= {-1.0, 0.0, 1.0}
