"""Pipelined host collector: overlap device policy compute with host env.step.

The plain :class:`HostCollector` serializes every step:

    forward(obs) [device]  ->  env.step(act) [host/subprocess]  ->  repeat

so the accelerator idles while Python envs step and vice versa (the
reference has the same serialization around its torch forward,
collector.py:707-911). Here the env pool is split into two halves that run
half a step out of phase: while half A's subprocess workers are stepping,
the device computes half B's actions (and the previous transition's buffer
scatter is still in flight — JAX dispatch is async). The pipeline hides the
serial host work (policy forward, H2D transfer, buffer-add dispatch) behind
subprocess env compute; measured on 8 subproc CartPole envs it gives
1.1x (2 ms/step envs) to 1.2x (8 ms/step envs) over the sequential
collector, which itself runs ~2.6x faster than the round-1 version thanks
to the jitted buffer add and the amortized key stream
(``examples/benchmark/host_throughput.py``). For free-running envs it
degrades gracefully to the sequential rate.

Semantics match :meth:`HostCollector.collect` n_step mode: same transition
contents, raw-action storage, per-env episode bookkeeping, and
``CollectStats``. n_episode / random collection falls back to the base
implementation (those paths are not throughput-critical).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.collector import CollectStats
from tianshou_tpu.data.host_collector import HostCollector
from tianshou_tpu.utils.determinism import TraceLogger

__all__ = ["PipelinedHostCollector"]


class PipelinedHostCollector(HostCollector):
    # ------------------------------------------------------------------
    def _send_group(self, ids: np.ndarray, acts: np.ndarray) -> None:
        for k, i in enumerate(ids):
            self.venv.workers[i].send(acts[k])

    def _recv_group(self, ids: np.ndarray):
        obs, rew, term, trunc = [], [], [], []
        for i in ids:
            o, r, te, tr, _ = self.venv.workers[i].recv()
            obs.append(o)
            rew.append(r)
            term.append(te)
            trunc.append(tr)
        return (
            np.stack(obs),
            np.asarray(rew, np.float32),
            np.asarray(term, bool),
            np.asarray(trunc, bool),
        )

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
        from tianshou_tpu.env.venvs import DummyVectorEnv, SubprocVectorEnv

        # the pipeline drives venv.workers directly; a wrapper (e.g.
        # VectorEnvNormObs, which only intercepts reset/step) would be
        # silently bypassed — route wrapped venvs through the sequential
        # path, which goes through venv.step and keeps wrapper semantics
        if n_step is None or random or not isinstance(
            self.venv, (SubprocVectorEnv, DummyVectorEnv)
        ):
            return super().collect(
                ts, key, n_step=n_step, n_episode=n_episode, random=random,
                training=training, reset_before_collect=reset_before_collect,
            )
        if reset_before_collect or self._obs is None:
            self.reset()
        E = len(self.venv)
        if E < 2:
            return super().collect(ts, key, n_step=n_step, training=training)
        t0 = time.monotonic()
        groups = [np.arange(E // 2), np.arange(E // 2, E)]
        obs = np.asarray(self._obs)
        if self._ep_rew is None:
            self._ep_rew = np.zeros(E)
        step_count = 0
        ep_returns: list[float] = []
        ep_lens: list[int] = []

        def forward(ids):
            raw, mapped = self._forward(ts, jnp.asarray(obs[ids]), self._next_key(), training)
            return raw, np.asarray(mapped)  # blocks only on the action transfer

        def absorb(ids, raw, key_unused=None):
            """Receive the in-flight group's results, store, bookkeep."""
            nonlocal step_count
            o_next, rew, term, trunc = self._recv_group(ids)
            if self.buffer is not None:
                mask = np.zeros(E, bool)
                mask[ids] = True
                # scatter the group's rows into a full-width transition; the
                # mask keeps add() from advancing the other group's cursors
                act_full = np.zeros((E,) + np.asarray(raw).shape[1:], np.asarray(raw).dtype)
                act_full[ids] = np.asarray(raw)
                rew_full = np.zeros(E, np.float32)
                rew_full[ids] = rew
                term_full = np.zeros(E, bool)
                term_full[ids] = term
                trunc_full = np.zeros(E, bool)
                trunc_full[ids] = trunc
                obs_next_full = obs.copy()
                obs_next_full[ids] = o_next
                transition = Batch(
                    obs=jnp.asarray(obs),
                    act=jnp.asarray(act_full),
                    rew=jnp.asarray(rew_full),
                    terminated=jnp.asarray(term_full),
                    truncated=jnp.asarray(trunc_full),
                    obs_next=jnp.asarray(obs_next_full),
                )
                # async jitted scatter; overlaps with the in-flight env steps
                self._buffer_add(transition, mask)
            done = term | trunc
            self._ep_rew[ids] += rew
            self._ep_len[ids] += 1
            step_count += len(ids)
            if done.any():
                done_ids = ids[done]
                for i in done_ids:
                    ep_returns.append(float(self.return_reduction(self._ep_rew[i])))
                    ep_lens.append(int(self._ep_len[i]))
                    self._ep_rew[i] = 0.0
                    self._ep_len[i] = 0
                reset_obs, _ = self.venv.reset(id=done_ids.tolist())
                o_next[done] = np.asarray(reset_obs)
            obs[ids] = o_next

        # prologue: compute + launch group 0
        self._seed_keys(key)
        raw0, act0 = forward(groups[0])
        self._send_group(groups[0], act0)
        raws = {0: np.asarray(raw0)}
        in_flight = [0]  # groups currently stepping, oldest first
        next_g = 1
        # steady state: LAUNCH the idle group (forward + send) BEFORE
        # absorbing the oldest in-flight one, so both env halves step
        # concurrently while the device forward and the buffer scatter of
        # the absorbed half overlap them.  The step_hook fires right after
        # a send — BOTH env halves are stepping in their subprocesses at
        # that point, so async device work it dispatches (gradient steps)
        # executes inside the env-compute window.
        while in_flight:
            launched = step_count + sum(len(groups[g]) for g in in_flight)
            if launched < n_step:
                raw_o, act_o = forward(groups[next_g])
                self._send_group(groups[next_g], act_o)
                raws[next_g] = np.asarray(raw_o)
                in_flight.append(next_g)
                if self.step_hook is not None and training:
                    self.step_hook(len(groups[next_g]))
                next_g = 1 - next_g
            g = in_flight.pop(0)
            absorb(groups[g], raws[g])
        self._obs = obs

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
