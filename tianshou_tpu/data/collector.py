"""Device collector: the rollout engine as a single jitted ``lax.scan``.

Rebuild of the reference's ``Collector._collect`` hot loop
(data/collector.py:773-1067). The reference steps worker processes over
pipes, converts obs numpy->torch per step, and bounces actions back
(collector.py:739, net/common.py:173) — the main throughput limiter the
survey identifies (SURVEY.md §3.4). Here policy forward, env step, buffer
insert, episode bookkeeping and auto-reset are ONE fused XLA program: data
never leaves the chip during collection.

Episode semantics match the reference:
- transitions store the raw policy action (pre ``map_action``), the true
  terminal ``obs_next`` (pre-reset), terminated/truncated separately;
- per-env episode return/length accumulators emit on done
  (reference collector.py:554-578 R/N/D/S bookkeeping);
- auto-reset replaces the carried obs with a fresh reset obs.

``collect`` gathers a fixed number of steps per env (the device-native
n_step mode). n_episode collection is host-chunked: see
``collect_episodes`` which scans fixed chunks until enough episodes finish
(SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.algorithm.base import ActOut
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.env.core import VectorDeviceEnv
from tianshou_tpu.utils.determinism import TraceLogger

__all__ = ["CollectState", "CollectStats", "DeviceCollector"]


class CollectState(NamedTuple):
    env_state: Any
    obs: Any
    policy_state: Any     # recurrent carry (None for stateless policies)
    ep_rew: jnp.ndarray   # [E] running episode return
    ep_len: jnp.ndarray   # [E] running episode length


@dataclasses.dataclass
class CollectStats:
    """Host-side summary, mirroring reference CollectStats (collector.py:117)."""

    n_collected_steps: int
    n_collected_episodes: int
    returns: np.ndarray
    lens: np.ndarray

    @property
    def returns_stat(self):
        r = self.returns
        return None if len(r) == 0 else {"mean": float(r.mean()), "std": float(r.std()), "max": float(r.max()), "min": float(r.min())}

    @property
    def lens_stat(self):
        l = self.lens
        return None if len(l) == 0 else {"mean": float(l.mean()), "std": float(l.std())}


class DeviceCollector:
    """Collects rollouts from a :class:`VectorDeviceEnv` with a jitted scan.

    Parameters mirror the reference Collector (policy, env, buffer); the
    buffer may be ``None`` for pure on-policy collection where the rollout
    batch is consumed directly.

    Hooks (reference StepHook collector.py:1412 / EpisodeRolloutHook :1468):
    ``on_step_hook(transition Batch) -> Batch`` transforms every stored
    transition INSIDE the jitted scan (e.g. add an action distribution,
    reward shaping); ``on_episode_done_hook(stats)`` runs on host after each
    collect with the finished-episode returns/lengths.
    """

    def __init__(self, venv: VectorDeviceEnv, algo, buffer=None,
                 on_step_hook=None, on_episode_done_hook=None) -> None:
        self.venv = venv
        self.algo = algo
        self.buffer = buffer
        self.on_step_hook = on_step_hook
        self.on_episode_done_hook = on_episode_done_hook
        self._collect_jit: dict = {}

    # ------------------------------------------------------------------
    def reset(self, key: jax.Array) -> CollectState:
        env_state, obs = self.venv.reset(key)
        E = self.venv.num_envs
        ps = self.algo.init_policy_state(E)
        return CollectState(env_state, obs, ps, jnp.zeros(E), jnp.zeros(E, jnp.int32))

    # ------------------------------------------------------------------
    def _step_fn(self, ts, carry, key, training: bool, store: bool, keep_rollout: bool,
                 random: bool = False):
        cstate, buf_state = carry
        k_act, k_noise, k_env, k_reset = jax.random.split(key, 4)
        if random:
            # uniform action-space sampling for warmup prefill (reference
            # RandomActionPolicy / start_timesteps, collector.py:724 stores
            # map_action_inverse'd raw actions)
            ks = jax.random.split(k_act, self.venv.num_envs)
            env_act = jax.vmap(self.venv.env.action_space.sample)(ks)
            act = self.algo.map_action_inverse(env_act)
            out = ActOut(act=act, state=cstate.policy_state, info=Batch())
        else:
            out = self.algo.forward(
                ts, cstate.obs, k_act, state=cstate.policy_state, deterministic=not training
            )
            act = out.act
            # applied in BOTH modes: eps-greedy policies use eps_inference at
            # eval time (reference dqn.py:158, collector.py:741)
            act = self.algo.exploration_noise(ts, act, cstate.obs, k_noise, training=training)
            env_act = self.algo.map_action(act)
        step = self.venv.step(cstate.env_state, env_act, k_env)
        done = step.terminated | step.truncated
        transition = Batch(
            obs=cstate.obs,
            act=act,
            rew=step.reward,
            terminated=step.terminated,
            truncated=step.truncated,
            obs_next=step.obs,
        )
        if self.on_step_hook is not None:
            transition = self.on_step_hook(transition)
        if store and self.buffer is not None:
            buf_state, _ = self.buffer.add(buf_state, transition)
        ep_rew = cstate.ep_rew + step.reward
        ep_len = cstate.ep_len + 1
        emit_ret = jnp.where(done, ep_rew, 0.0)
        emit_len = jnp.where(done, ep_len, 0)
        # auto-reset finished envs (persistent sub-state like obs-norm
        # statistics survives the reset via carry_through_reset)
        reset_state, reset_obs = self.venv.reset(k_reset)
        reset_state = self.venv.carry_through_reset(step.state, reset_state)
        def sel(new, old):
            d = done.reshape(done.shape + (1,) * (new.ndim - done.ndim))
            return jnp.where(d, new, old)
        env_state = jax.tree.map(sel, reset_state, step.state)
        obs = jax.tree.map(sel, reset_obs, step.obs)
        # recurrent carry resets on episode end (reference collector.py:1103);
        # the key is folded (not split) so existing algos' RNG streams are
        # unchanged — only gSDE's reset_policy_state consumes it
        policy_state = out.state
        if policy_state is not None:
            reset_ps = self.algo.reset_policy_state(
                self.venv.num_envs, jax.random.fold_in(k_reset, 1)
            )
            policy_state = jax.tree.map(sel, reset_ps, policy_state)
        new_cstate = CollectState(
            env_state=env_state,
            obs=obs,
            policy_state=policy_state,
            ep_rew=jnp.where(done, 0.0, ep_rew),
            ep_len=jnp.where(done, 0, ep_len),
        )
        per_step = Batch(done=done, ep_ret=emit_ret, ep_len=emit_len)
        if keep_rollout:
            per_step.rollout = transition
        return (new_cstate, buf_state), per_step

    def _build_collect(self, n_steps: int, training: bool, keep_rollout: bool, random: bool = False):
        store = self.buffer is not None

        def run(ts, cstate, buf_state, key):
            # per-chunk policy-state refresh (gSDE noise resample; identity
            # for everything else). fold_in keeps existing RNG streams intact.
            ps = self.algo.refresh_policy_state(
                cstate.policy_state, self.venv.num_envs, jax.random.fold_in(key, 0x5DE)
            )
            cstate = cstate._replace(policy_state=ps)
            keys = jax.random.split(key, n_steps)

            def body(carry, k):
                return self._step_fn(ts, carry, k, training, store, keep_rollout, random)

            (cstate, buf_state), out = jax.lax.scan(body, (cstate, buf_state), keys)
            return cstate, buf_state, out

        return jax.jit(run, donate_argnums=(2,) if store else ())

    # ------------------------------------------------------------------
    def collect(
        self,
        ts,
        cstate: CollectState,
        buf_state,
        key: jax.Array,
        n_steps: int,
        training: bool = True,
        keep_rollout: bool = False,
        random: bool = False,
    ):
        """Collect ``n_steps`` per env. Returns (cstate, buf_state, out)
        where ``out.done/ep_ret/ep_len`` are [T, E] device arrays and
        ``out.rollout`` (if requested) is the time-major transition Batch.
        ``random=True`` samples uniform actions (warmup prefill).
        """
        sig = (n_steps, training, keep_rollout, random)
        if sig not in self._collect_jit:
            self._collect_jit[sig] = self._build_collect(*sig)
        cstate, buf_state, out = self._collect_jit[sig](ts, cstate, buf_state, key)
        TraceLogger.log(
            "collector",
            lambda: (
                f"n_steps={n_steps} training={training} "
                f"episodes={int(np.asarray(out.done).sum())} "
                f"ep_ret_sum={float(np.asarray(out.ep_ret).sum()):.6f}"
            ),
        )
        if self.on_episode_done_hook is not None:
            self.on_episode_done_hook(self.stats_from(out))
        return cstate, buf_state, out

    # ------------------------------------------------------------------
    def stats_from(self, out: Batch, max_episodes: int | None = None) -> CollectStats:
        """Summarize a collect() output on host."""
        done = np.asarray(out.done)
        rets = np.asarray(out.ep_ret)[done]
        lens = np.asarray(out.ep_len)[done]
        if max_episodes is not None:
            rets, lens = rets[:max_episodes], lens[:max_episodes]
        return CollectStats(
            n_collected_steps=int(done.size),
            n_collected_episodes=int(done.sum() if max_episodes is None else len(rets)),
            returns=rets,
            lens=lens,
        )

    # ------------------------------------------------------------------
    def _build_collect_episodes(self, chunk_steps: int, training: bool):
        """Chunk scan with an in-scan active-env mask implementing the
        reference's surplus-env removal (collector.py:1049-1067): start with
        min(n, E) active envs; whenever episodes finish, deactivate just-done
        envs so the active count never exceeds episodes still needed. This
        removes the short-episode over-weighting of naive fixed-chunk
        collection."""

        def run(ts, cstate, active, n_done, n_target, key):
            keys = jax.random.split(key, chunk_steps)

            def body(carry, k):
                cstate, active, n_done = carry
                (cstate, _), per = self._step_fn(
                    ts, (cstate, None), k, training, store=False, keep_rollout=False
                )
                done = per.done & active
                n_done = n_done + done.sum()
                remaining = jnp.maximum(n_target - n_done, 0)
                k_deact = jnp.maximum(active.sum() - remaining, 0)
                # deactivate the first k_deact just-done envs (env-id order)
                rank = jnp.cumsum(done.astype(jnp.int32))
                active = active & ~(done & (rank <= k_deact))
                emit = Batch(done=done, ep_ret=per.ep_ret, ep_len=per.ep_len)
                return (cstate, active, n_done), emit

            (cstate, active, n_done), out = jax.lax.scan(body, (cstate, active, n_done), keys)
            return cstate, active, n_done, out

        return jax.jit(run)

    def collect_episodes(
        self,
        ts,
        key: jax.Array,
        n_episodes: int,
        chunk_steps: int = 128,
        training: bool = False,
        max_chunks: int = 100,
        rms=None,
    ) -> CollectStats:
        """Collect exactly ``n_episodes`` finished episodes (test phase).

        Device scans run in fixed chunks with in-scan surplus-env masking;
        the host checks the episode count between chunks (the static-shape
        answer to the reference's data-dependent n_episode loop,
        collector.py:1049-1067). Fresh reset before starting, like the
        reference test collector.
        """
        key, rk = jax.random.split(key)
        cstate = self.reset(rk)
        if rms is not None:
            # test envs evaluate under the TRAIN envs' pooled obs-norm
            # statistics (reference shares one obs_rms, venv_wrappers.py:99)
            from tianshou_tpu.env.wrappers import inject_rms

            cstate = cstate._replace(
                env_state=inject_rms(self.venv.env, cstate.env_state, rms)
            )
        E = self.venv.num_envs
        sig = (chunk_steps, training)
        if not hasattr(self, "_collect_ep_jit"):
            self._collect_ep_jit = {}
        if sig not in self._collect_ep_jit:
            self._collect_ep_jit[sig] = self._build_collect_episodes(*sig)
        run = self._collect_ep_jit[sig]
        active = jnp.arange(E) < max(min(n_episodes, E), 1)
        n_done = jnp.int32(0)
        all_rets: list[np.ndarray] = []
        all_lens: list[np.ndarray] = []
        steps = 0
        for chunk in range(max_chunks):
            key, ck = jax.random.split(key)
            cstate, active, n_done, out = run(ts, cstate, active, n_done, jnp.int32(n_episodes), ck)
            done = np.asarray(out.done)
            all_rets.append(np.asarray(out.ep_ret)[done])
            all_lens.append(np.asarray(out.ep_len)[done])
            steps += int(done.size)
            if int(n_done) >= n_episodes:
                break
        else:
            import warnings

            warnings.warn(
                f"collect_episodes hit max_chunks={max_chunks} with only "
                f"{int(n_done)}/{n_episodes} episodes finished; returning partial results",
                stacklevel=2,
            )
        # emissions are time-major == completion order; truncate to exactly n
        rets = np.concatenate(all_rets)[:n_episodes]
        lens = np.concatenate(all_lens)[:n_episodes]
        return CollectStats(
            n_collected_steps=steps,
            n_collected_episodes=len(rets),
            returns=rets,
            lens=lens,
        )
