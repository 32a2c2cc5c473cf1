"""Multi-agent RL dispatcher.

Rebuild of reference ``tianshou/algorithm/multiagent/marl.py``:
``MultiAgentPolicy`` (:74, dispatch by ``obs.agent_id``), ``MARLDispatcher``
(:188, per-agent reward slicing) and ``MultiAgentOff/OnPolicyAlgorithm``
(:268,:311).

TPU-native difference: the reference slices each agent's rows out of the
batch (dynamic shapes); here every agent updates on the FULL batch with a
0/1 dispatch weight (``agent_id == agent``) — the same gradients with static
shapes, so the whole multi-agent update stays one XLA program. Targets run
through each algorithm's OWN ``preprocess`` (n-step chains over the shared
buffer, PER weights) via a per-agent reward view of the buffer state, and
``postprocess`` writes PER priorities back — the reference's full
``_preprocess``/``_postprocess`` dispatch (marl.py:205).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.base import ActOut, OffPolicyAlgorithm, TrainState
from tianshou_tpu.data.batch import Batch

__all__ = ["MultiAgentOffPolicyAlgorithm", "MultiAgentOnPolicyAlgorithm", "MARLRandomPolicy"]


class MultiAgentOffPolicyAlgorithm(OffPolicyAlgorithm):
    """``algorithms``: list of per-agent off-policy algorithms (index =
    agent_id). Observations must be Batches with keys agent_id/obs/mask."""

    def __init__(self, algorithms: list[OffPolicyAlgorithm], action_space, **kwargs) -> None:
        super().__init__(action_space=action_space, **kwargs)
        self.algorithms = algorithms
        self.n_agents = len(algorithms)

    def init(self, key: jax.Array, obs_example: Any) -> dict:
        keys = jax.random.split(key, self.n_agents)
        return {f"agent{i}": algo.init(k, obs_example) for i, (algo, k) in enumerate(zip(self.algorithms, keys))}

    # ------------------------------------------------------------------
    def forward(self, ts: dict, obs: Batch, key: jax.Array, state=None, deterministic: bool = False) -> ActOut:
        """Each agent computes actions for all rows; the agent_id column
        selects (reference MultiAgentPolicy:74)."""
        keys = jax.random.split(key, self.n_agents)
        acts = None
        for i, algo in enumerate(self.algorithms):
            out = algo.forward(ts[f"agent{i}"], obs, keys[i], deterministic=deterministic)
            acts = out.act if acts is None else jnp.where(obs.agent_id == i, out.act, acts)
        return ActOut(act=acts, state=state, info=Batch())

    def exploration_noise(self, ts: dict, act: jnp.ndarray, obs: Batch, key: jax.Array, training: bool = True) -> jnp.ndarray:
        keys = jax.random.split(key, self.n_agents)
        for i, algo in enumerate(self.algorithms):
            noisy = algo.exploration_noise(ts[f"agent{i}"], act, obs, keys[i], training)
            act = jnp.where(obs.agent_id == i, noisy, act)
        return act

    def map_action(self, act: jnp.ndarray) -> jnp.ndarray:
        return act

    # ------------------------------------------------------------------
    @staticmethod
    def _agent_reward_view(buf_state, agent: int):
        """A zero-copy view of the buffer state whose ``rew`` is the
        agent's reward column — the TPU analogue of the reference's
        MARLDispatcher buffer view (marl.py:188), so each algorithm's own
        ``preprocess`` (n-step chains etc.) runs unchanged."""

        def fix(state):
            data = state.data.copy()
            data.rew = state.data.rew[..., agent]
            return state._replace(data=data)

        if hasattr(buf_state, "base"):
            return buf_state._replace(base=fix(buf_state.base))
        return fix(buf_state)

    def update(self, ts: dict, buffer, buf_state, key: jax.Array, batch_size: int):
        """Sample once, dispatch to every agent with masked weights
        (reference MARLDispatcher.dispatch_update, marl.py:205). Each
        agent's targets run through ITS OWN preprocess (n-step returns,
        PER weighting) over a per-agent reward view of the shared buffer,
        and postprocess (PER priority writeback) updates the shared
        buf_state — matching the reference's full-_preprocess dispatch."""
        k_sample, k_agents = jax.random.split(key)
        batch, indices = buffer.sample(buf_state, k_sample, batch_size)
        keys = jax.random.split(k_agents, self.n_agents)
        stats = Batch()
        for i, algo in enumerate(self.algorithms):
            sub_ts = ts[f"agent{i}"]
            b = batch.copy()
            b.rew = batch.rew[:, i]  # per-agent reward column (marl.py:188)
            is_mine = (batch.obs.agent_id == i).astype(jnp.float32)
            k1, k2 = jax.random.split(keys[i])
            bs_view = self._agent_reward_view(buf_state, i)
            b = algo.preprocess(sub_ts, buffer, bs_view, b, indices, k1)
            b.weight = is_mine * b.get("weight", jnp.ones_like(is_mine))
            sub_ts, sub_stats = algo.update_step(sub_ts, b, k2)
            buf_state = algo.postprocess(sub_ts, buffer, buf_state, b, indices, sub_stats)
            ts = {**ts, f"agent{i}": sub_ts}
            stats[f"agent{i}"] = sub_stats
        return ts, buf_state, stats


class MultiAgentOnPolicyAlgorithm:
    """On-policy dispatcher (reference MultiAgentOnPolicyAlgorithm,
    marl.py:311): each agent runs its own GAE + minibatch loop over the
    SHARED rollout, with static shapes preserved by masking instead of
    slicing — rewards come from the agent's reward column, and the
    advantage is zeroed on steps where another agent acted, so actor
    gradients flow only through the agent's own decisions while the critic
    still learns values for every game state."""

    def __init__(self, algorithms: list, action_space) -> None:
        self.algorithms = algorithms
        self.n_agents = len(algorithms)
        self.action_space = action_space

    def init(self, key: jax.Array, obs_example: Any) -> dict:
        keys = jax.random.split(key, self.n_agents)
        return {f"agent{i}": algo.init(k, obs_example) for i, (algo, k) in enumerate(zip(self.algorithms, keys))}

    forward = MultiAgentOffPolicyAlgorithm.forward
    exploration_noise = MultiAgentOffPolicyAlgorithm.exploration_noise

    def map_action(self, act: jnp.ndarray) -> jnp.ndarray:
        return act

    def init_policy_state(self, num_envs: int):
        return None

    def update_rollout(self, ts: dict, rollout: Batch, key: jax.Array, repeat: int, batch_size: int):
        keys = jax.random.split(key, self.n_agents)
        stats = Batch()
        for i, algo in enumerate(self.algorithms):
            k_proc, k_loop = jax.random.split(keys[i])
            r = rollout.copy()
            r.rew = rollout.rew[..., i]  # per-agent reward column (marl.py:188)
            batch = algo.process_rollout(ts[f"agent{i}"], r, k_proc)
            ts[f"agent{i}"] = algo.update_return_stats(ts[f"agent{i}"], batch)
            is_mine = (rollout.obs.agent_id == i).reshape(batch.adv.shape).astype(jnp.float32)
            batch.adv = batch.adv * is_mine
            sub_ts, sub_stats = algo.run_minibatch_updates(
                ts[f"agent{i}"], batch, k_loop, repeat, batch_size
            )
            ts = {**ts, f"agent{i}": sub_ts}
            stats[f"agent{i}"] = sub_stats
        stats.n_grad_steps = stats["agent0"].get("n_grad_steps", jnp.int32(1)) * self.n_agents
        return ts, stats


class MARLRandomPolicy(OffPolicyAlgorithm):
    """Mask-aware random baseline (reference algorithm/random.py:17)."""

    def __init__(self, action_space, **kwargs) -> None:
        super().__init__(action_space=action_space, **kwargs)

    def init(self, key: jax.Array, obs_example: Any) -> TrainState:
        return TrainState(params={}, target_params={}, opt_state={}, hparams=Batch(), extra=Batch(), step=jnp.int32(0))

    def forward(self, ts, obs: Batch, key: jax.Array, state=None, deterministic: bool = False) -> ActOut:
        mask = obs.mask if "mask" in obs else jnp.ones((obs.agent_id.shape[0], self.action_space.n), bool)
        logits = jnp.where(mask, 0.0, -jnp.inf)
        act = jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
        return ActOut(act=act, state=state, info=Batch())

    def update_step(self, ts, batch, key):
        return ts, Batch()

    def _target_q(self, ts, obs_next, key):
        return jnp.zeros(obs_next.agent_id.shape[0])
