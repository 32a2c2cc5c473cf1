"""Async host collector: steps only the ready env subset.

Rebuild of the reference ``AsyncCollector`` (data/collector.py:1119-1397):
persistent per-env obs/episode state for ALL E envs, partial stepping of the
ready subset through a ``wait_num``/``timeout`` vector env, result recovery
via ``info["env_id"]`` (:1299), buffer insertion by global env id. Slow envs
never block fast ones; the policy forward still runs jitted over the ready
batch on the accelerator.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.collector import CollectStats
from tianshou_tpu.data.host_collector import HostCollector

__all__ = ["AsyncHostCollector"]


class AsyncHostCollector(HostCollector):
    def __init__(self, venv, algo, buffer=None) -> None:
        assert venv.is_async, "AsyncHostCollector needs wait_num/timeout on the venv"
        super().__init__(venv, algo, buffer)
        self._last_act = None

    def reset(self, seed: int | None = None) -> None:
        super().reset(seed)
        self._last_act = None

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
        # n_step: stop once >= n_step transitions landed; n_episode: stop once
        # >= n_episode episodes finished (reference AsyncCollector supports
        # both, collector.py:1203 — async mode over-delivers rather than
        # masking surplus envs)
        assert (n_step is None) != (n_episode is None), "exactly one of n_step/n_episode"
        if reset_before_collect or self._obs is None:
            self.reset()
        E = len(self.venv)
        if self._ep_rew is None:
            self._ep_rew = np.zeros(E)
        step_count = 0
        ep_returns: list[float] = []
        ep_lens: list[int] = []
        ready = list(self.venv.ready_id)
        self._seed_keys(key)

        while (
            (n_step is not None and step_count < n_step)
            or (n_episode is not None and len(ep_returns) < n_episode)
        ):
            k1 = self._next_key()
            obs_ready = np.asarray(self._obs)[ready]
            if random:
                space = self.venv.action_space
                acts = np.stack([space.sample() for _ in ready])
                raw_acts = acts
            else:
                raw, mapped = self._forward(ts, jnp.asarray(obs_ready), k1, training)
                raw_acts, acts = np.asarray(raw), np.asarray(mapped)
            # remember the action sent to each env: results may surface many
            # iterations later (reference EO/EA/EH arrays, collector.py:1152)
            if not hasattr(self, "_last_act") or self._last_act is None:
                self._last_act = np.zeros((E,) + raw_acts.shape[1:], raw_acts.dtype)
            for k, e in enumerate(ready):
                self._last_act[e] = raw_acts[k]
            obs_next, rew, term, trunc, infos = self.venv.step(acts, id=ready)
            ids = np.array([i["env_id"] for i in infos])

            if self.buffer is not None:
                # scatter the returned subset into full-E arrays, mask the rest
                mask = np.zeros(E, bool)
                mask[ids] = True
                transition = Batch(
                    obs=jnp.asarray(_scatter(E, ids, np.asarray(self._obs)[ids])),
                    act=jnp.asarray(_scatter(E, ids, self._last_act[ids])),
                    rew=jnp.asarray(_scatter(E, ids, rew)),
                    terminated=jnp.asarray(_scatter(E, ids, term)),
                    truncated=jnp.asarray(_scatter(E, ids, trunc)),
                    obs_next=jnp.asarray(_scatter(E, ids, np.asarray(obs_next))),
                )
                self._buffer_add(transition, mask)

            done = np.logical_or(term, trunc)
            self._ep_rew[ids] += rew
            self._ep_len[ids] += 1
            step_count += len(ids)
            done_ids = ids[done]
            for i in done_ids:
                ep_returns.append(float(self._ep_rew[i]))
                ep_lens.append(int(self._ep_len[i]))
                self._ep_rew[i] = 0.0
                self._ep_len[i] = 0
            obs_next = np.asarray(obs_next)
            if len(done_ids) > 0:
                reset_obs, _ = self.venv.reset(id=done_ids.tolist())
                pos = {int(e): k for k, e in enumerate(ids)}
                for j, e in enumerate(done_ids):
                    obs_next[pos[int(e)]] = np.asarray(reset_obs)[j]
            self._obs = np.asarray(self._obs)
            self._obs[ids] = obs_next
            ready = ids.tolist()

        return CollectStats(
            n_collected_steps=step_count,
            n_collected_episodes=len(ep_returns),
            returns=np.asarray(ep_returns),
            lens=np.asarray(ep_lens),
        )


def _scatter(E: int, ids: np.ndarray, vals: np.ndarray) -> np.ndarray:
    vals = np.asarray(vals)
    out = np.zeros((E,) + vals.shape[1:], vals.dtype)
    out[ids] = vals
    return out
