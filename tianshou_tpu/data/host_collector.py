"""Host collector: rollout engine for host (Gymnasium) vector envs.

Mirrors the reference ``Collector`` semantics (data/collector.py:302-1067):
n_step XOR n_episode collection, exploration noise, raw-action storage,
episode return/length bookkeeping, surplus-env masking in n_episode mode
(collector.py:1049), and ``CollectStats`` output. The policy forward runs
jitted on the accelerator over the whole env batch; only obs/action batches
cross the host boundary per step (the unavoidable cost of non-JAX envs —
SURVEY.md §3.4).

Random-action collection (reference ``RandomActionPolicy``,
algorithm_base.py:1063) is supported via ``random=True``.
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.collector import CollectStats
from tianshou_tpu.env.venvs import BaseVectorEnv
from tianshou_tpu.utils.determinism import TraceLogger

__all__ = ["HostCollector"]


class HostCollector:
    def __init__(self, venv: BaseVectorEnv, algo, buffer=None, return_reduction=None) -> None:
        self.venv = venv
        self.algo = algo
        if buffer is not None and getattr(buffer, "num_envs", len(venv)) != len(venv):
            # reference BaseCollector._validate_buffer (collector.py:371):
            # a buffer whose per-env ring count differs from the env count
            # would silently mis-shard transitions
            raise ValueError(
                f"buffer.num_envs={buffer.num_envs} must equal the vector env "
                f"count {len(venv)} (use VectorReplayBuffer(total, {len(venv)}))"
            )
        self.buffer = buffer
        self.buf_state = None
        self._obs: np.ndarray | None = None
        self._forward_jit: dict = {}
        self._add_jit = None
        self._key_pool: list = []
        # optional per-vector-step callback ``hook(n_env_steps)`` used by
        # HostOffPolicyTrainer's overlapped mode to dispatch async gradient
        # steps while the (subprocess) envs are busy stepping — the host
        # analogue of the device trainer's fused collect+update megastep
        self.step_hook = None
        # vector (multi-agent) episode returns -> scalar for stats
        # (reference multi_agent_return_reduction, trainer.py:81)
        self.return_reduction = return_reduction if return_reduction is not None else (
            lambda r: r if np.ndim(r) == 0 else r[0]
        )

    # ------------------------------------------------------------------
    @staticmethod
    def _to_obs(raw) -> Any:
        """list-of-dict observations (multi-agent) -> stacked Batch."""
        if isinstance(raw, list) and raw and isinstance(raw[0], dict):
            return Batch(raw)
        return np.asarray(raw)

    def reset(self, seed: int | None = None) -> None:
        obs, _ = self.venv.reset(seed=seed) if seed is not None else self.venv.reset()
        self._obs = self._to_obs(obs)
        E = len(self.venv)
        self._ep_rew = None  # lazily shaped on the first reward (vector for MARL)
        self._ep_len = np.zeros(E, np.int64)

    def reset_buffer(self, example: Batch) -> None:
        assert self.buffer is not None
        self.buf_state = self.buffer.init(example)

    # ------------------------------------------------------------------
    def _seed_keys(self, key: jax.Array) -> None:
        """Start a fresh per-step key stream for one collect call."""
        self._key_carry = key
        self._key_pool = []

    def _next_key(self) -> jax.Array:
        """Amortized per-step PRNG key: one ``jax.random.split`` dispatch
        (~ms of host overhead) buys 128 step keys."""
        if not self._key_pool:
            ks = jax.random.split(self._key_carry, 129)
            self._key_carry = ks[0]
            self._key_pool = list(ks[1:])
        return self._key_pool.pop()

    def _buffer_add(self, transition: Batch, mask) -> None:
        """Jitted ring insert (donated state): the eager per-op dispatch of
        an unjitted add() dominates host-path step cost otherwise."""
        if self._add_jit is None:
            self._add_jit = jax.jit(
                lambda st, tr, m: self.buffer.add(st, tr, m)[0], donate_argnums=(0,)
            )
        self.buf_state = self._add_jit(self.buf_state, transition, jnp.asarray(mask))

    # ------------------------------------------------------------------
    def _forward(self, ts, obs_dev, key, training: bool):
        if training not in self._forward_jit:
            algo = self.algo

            def fwd(ts, obs, key):
                k1, k2 = jax.random.split(key)
                out = algo.forward(ts, obs, k1, deterministic=not training)
                act = algo.exploration_noise(ts, out.act, obs, k2, training=training)
                return act, algo.map_action(act)

            self._forward_jit[training] = jax.jit(fwd)
        return self._forward_jit[training](ts, obs_dev, key)

    # ------------------------------------------------------------------
    def collect(
        self,
        ts,
        key: jax.Array,
        n_step: int | None = None,
        n_episode: int | None = None,
        random: bool = False,
        training: bool = True,
        reset_before_collect: bool = False,
    ) -> CollectStats:
        assert (n_step is None) != (n_episode is None), "exactly one of n_step/n_episode"
        if reset_before_collect or self._obs is None:
            self.reset()
        E = len(self.venv)
        t0 = time.monotonic()
        step_count = 0
        ep_returns: list[float] = []
        ep_lens: list[int] = []
        active = np.ones(E, bool)
        if n_episode is not None:
            # surplus-env masking (reference collector.py:1049)
            active = np.arange(E) < max(min(n_episode, E), 1)
        self._seed_keys(key)

        while True:
            # only ACTIVE envs are stepped (reference Collector removes
            # surplus envs from the ready set, collector.py:1049-1067):
            # stepping a deactivated env without storing would leave a
            # chronological gap in its ring that corrupts prev/next walks
            # (frame-stacking, n-step gathers) in later collect calls
            ids = np.where(active)[0]
            k1 = self._next_key()
            obs_act = self._obs[ids] if isinstance(self._obs, Batch) else np.asarray(self._obs)[ids]
            if random:
                space = self.venv.action_space
                acts = np.stack([space.sample() for _ in ids])
                # Store the *raw-scale* action the algorithm trains on, not
                # the env-scale sample (reference collector.py:724 applies
                # map_action_inverse before buffer insertion).
                raw_acts = np.asarray(self.algo.map_action_inverse(jnp.asarray(acts)))
            else:
                obs_dev = obs_act.to_jax() if isinstance(obs_act, Batch) else jnp.asarray(obs_act)
                raw, mapped = self._forward(ts, obs_dev, k1, training)
                raw_acts = np.asarray(raw)
                acts = np.asarray(mapped)
            all_active = len(ids) == E
            obs_next, rew, term, trunc, infos = (
                self.venv.step(acts) if all_active else self.venv.step(acts, id=ids.tolist())
            )
            obs_next = self._to_obs(obs_next)
            rew = np.asarray(rew)
            term = np.asarray(term)
            trunc = np.asarray(trunc)
            done = np.logical_or(term, trunc)
            if self._ep_rew is None:
                self._ep_rew = np.zeros((E,) + rew.shape[1:])

            if self.buffer is not None:
                # scatter the active subset into full-E rows; the mask keeps
                # inactive rings untouched
                obs_store = obs_act.to_jax() if isinstance(obs_act, Batch) else jnp.asarray(obs_act)
                obs_next_store = obs_next.to_jax() if isinstance(obs_next, Batch) else jnp.asarray(obs_next)
                transition = Batch(
                    obs=obs_store,
                    act=jnp.asarray(raw_acts),
                    rew=jnp.asarray(rew),
                    terminated=jnp.asarray(term),
                    truncated=jnp.asarray(trunc),
                    obs_next=obs_next_store,
                )
                if not all_active:
                    transition = jax.tree.map(
                        lambda a: jnp.zeros((E,) + a.shape[1:], a.dtype).at[ids].set(a),
                        transition,
                    )
                self._buffer_add(transition, active)

            self._ep_rew[ids] += rew
            self._ep_len[ids] += 1
            step_count += len(ids)
            if self.step_hook is not None and training and not random:
                self.step_hook(len(ids))

            if done.any():
                done_ids = ids[done]
                for i in done_ids:
                    ep_returns.append(float(self.return_reduction(self._ep_rew[i])))
                    ep_lens.append(int(self._ep_len[i]))
                    self._ep_rew[i] = 0.0
                    self._ep_len[i] = 0
                reset_obs, _ = self.venv.reset(id=done_ids.tolist())
                reset_obs = self._to_obs(reset_obs)
                done_pos = np.where(done)[0]
                obs_next[done_pos.tolist() if isinstance(obs_next, Batch) else done_pos] = reset_obs
                if n_episode is not None:
                    remaining = n_episode - len(ep_returns)
                    # deactivate surplus envs once enough episodes are running
                    n_active = int(active.sum())
                    for i in done_ids:
                        if n_active > remaining:
                            active[i] = False
                            n_active -= 1
            if all_active:
                self._obs = obs_next if isinstance(obs_next, Batch) else np.asarray(obs_next)
            else:
                if isinstance(self._obs, Batch):
                    self._obs[ids.tolist()] = obs_next
                else:
                    self._obs = np.asarray(self._obs)
                    self._obs[ids] = obs_next

            if n_step is not None and step_count >= n_step:
                break
            if n_episode is not None and len(ep_returns) >= n_episode:
                break

        TraceLogger.log(
            "host_collector",
            lambda: (
                f"steps={step_count} episodes={len(ep_returns)} "
                f"ret_sum={float(np.sum(ep_returns)):.6f}"
            ),
        )
        return CollectStats(
            n_collected_steps=step_count,
            n_collected_episodes=len(ep_returns),
            returns=np.asarray(ep_returns),
            lens=np.asarray(ep_lens),
        )

    # ------------------------------------------------------------------
    def collect_rollout(
        self, ts, key: jax.Array, n_step_per_env: int, training: bool = True
    ) -> tuple[Batch, CollectStats]:
        """Collect a time-major rollout ``[T, E, ...]`` for on-policy updates
        (host analogue of the device collector's ``keep_rollout=True`` path).
        Episode bookkeeping matches :meth:`collect`; the rollout stores raw
        (pre map_action) actions and the true pre-reset ``obs_next``."""
        if self._obs is None:
            self.reset()
        E = len(self.venv)
        steps: list[Batch] = []
        ep_returns: list[float] = []
        ep_lens: list[int] = []
        self._seed_keys(key)
        for _ in range(n_step_per_env):
            k1 = self._next_key()
            obs_dev = self._obs.to_jax() if isinstance(self._obs, Batch) else jnp.asarray(self._obs)
            raw, mapped = self._forward(ts, obs_dev, k1, training)
            acts = np.asarray(mapped)
            obs_next, rew, term, trunc, infos = self.venv.step(acts)
            obs_next = self._to_obs(obs_next)
            rew = np.asarray(rew, np.float32)
            done = np.logical_or(term, trunc)
            steps.append(
                Batch(
                    obs=self._obs, act=np.asarray(raw), rew=rew,
                    terminated=np.asarray(term), truncated=np.asarray(trunc),
                    obs_next=obs_next,
                )
            )
            if self._ep_rew is None:
                self._ep_rew = np.zeros(rew.shape)
            self._ep_rew += rew
            self._ep_len += 1
            if done.any():
                ids = np.where(done)[0]
                for i in ids:
                    ep_returns.append(float(self.return_reduction(self._ep_rew[i])))
                    ep_lens.append(int(self._ep_len[i]))
                    self._ep_rew[i] = 0.0
                    self._ep_len[i] = 0
                reset_obs, _ = self.venv.reset(id=ids.tolist())
                obs_next[ids.tolist() if isinstance(obs_next, Batch) else ids] = self._to_obs(reset_obs)
            self._obs = obs_next
        rollout = Batch.stack(steps, axis=0).to_jax()
        stats = CollectStats(
            n_collected_steps=n_step_per_env * E,
            n_collected_episodes=len(ep_returns),
            returns=np.asarray(ep_returns),
            lens=np.asarray(ep_lens),
        )
        return rollout, stats
