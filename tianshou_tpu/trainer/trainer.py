"""Trainers: host-side epoch orchestration over jitted device megasteps.

Rebuild of the reference ``tianshou/trainer.py``: ``Trainer`` (:354),
``OffPolicyTrainer`` (:1043), ``OnPolicyTrainer`` (:1098), ``OfflineTrainer``
(:780) and the ``TrainerParams`` dataclasses (:81-347). Epoch semantics,
test-step/stop_fn/save hooks and the update cadence (``update_per_step`` for
off-policy, ``repeat`` epochs for on-policy) are preserved; the inner loops
are fused: collection is one ``lax.scan`` and the gradient-step burst is a
second scan, so an epoch is a handful of device calls rather than thousands
of python iterations.
"""

from __future__ import annotations

import dataclasses
import time
from collections.abc import Callable
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu import config
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.utils.print import DataclassPPrintMixin
from tianshou_tpu.data.collector import CollectStats, DeviceCollector
from tianshou_tpu.utils.determinism import TraceLogger, trace_param_hash
from tianshou_tpu.utils.statistics import MovAvg

__all__ = [
    "TrainerParams",
    "OffPolicyTrainerParams",
    "OnPolicyTrainerParams",
    "OfflineTrainerParams",
    "OffPolicyTrainer",
    "OnPolicyTrainer",
    "OfflineTrainer",
    "HostOffPolicyTrainer",
    "HostOnPolicyTrainer",
    "TrainResult",
]


@dataclasses.dataclass
class TrainerParams(DataclassPPrintMixin):
    """Common knobs (reference trainer.py:81)."""

    max_epochs: int = 10
    epoch_num_steps: int = 10000          # env steps per epoch (total across envs)
    test_step_num_episodes: int = 10
    stop_fn: Callable[[float], bool] | None = None
    compute_score_fn: Callable[[CollectStats], float] | None = None
    save_best_fn: Callable[[Any], None] | None = None
    save_checkpoint_fn: Callable[[int, int, int, Any], None] | None = None
    train_fn: Callable[[int, int], dict] | None = None   # -> hparam overrides
    test_fn: Callable[[int, int], dict] | None = None
    logger: Any = None
    verbose: bool = True
    show_progress: bool = False
    test_in_train: bool = False
    resume_from_log: bool = False   # restore epoch/step counters (trainer.py:448)
    seed: int = 0


@dataclasses.dataclass
class OffPolicyTrainerParams(TrainerParams):
    batch_size: int = 64
    collection_step_num_env_steps: int = 10   # steps per env per collect chunk
    update_per_step: float = 1.0              # grad steps per collected env step
    start_steps: int = 0                      # prefill before learning
    start_random: bool = True
    # fuse collect + update burst into ONE jitted program per chunk: fewer
    # dispatches and XLA can overlap rollout and gradient work. Episode
    # stats still come back per chunk for logging.
    fused_megastep: bool = False
    # HOST path only: dispatch gradient steps asynchronously from the
    # collector's per-step hook so the device chews updates while the
    # (subprocess) envs step — wall time per chunk approaches
    # max(collect, update) instead of collect + update. Actor params stay
    # chunk-stale exactly like the sequential loop; updates sample the
    # buffer as it fills (per-step interleaving, the reference's own
    # update_per_step semantics at a finer grain).
    overlap_updates: bool = False


@dataclasses.dataclass
class OnPolicyTrainerParams(TrainerParams):
    batch_size: int = 64
    collection_step_num_env_steps: int = 128  # rollout length per env
    update_step_num_repetitions: int = 1      # passes over each rollout


@dataclasses.dataclass
class OfflineTrainerParams(TrainerParams):
    batch_size: int = 64
    update_step_num_gradient_steps_per_epoch: int = 500


@dataclasses.dataclass
class TrainResult(DataclassPPrintMixin):
    """Summary, mirroring reference InfoStats (data/stats.py:83)."""

    best_score: float
    best_reward: float
    env_step: int
    gradient_step: int
    epochs: int
    train_time: float
    timing: dict
    train_state: Any = None
    buf_state: Any = None


def _split_host(key):
    k1, k2 = jax.random.split(key)
    return k1, k2


class _TrainerBase:
    def __init__(self, algo, params: TrainerParams) -> None:
        self.algo = algo
        self.params = params
        self.env_step = 0
        self.gradient_step = 0
        self.start_epoch = 0
        self.best_reward = -np.inf
        self.best_score = -np.inf
        # MovAvg smoothing per loss key for the update scope
        # (reference trainer.py:731-754)
        self._mov: dict[str, MovAvg] = {}
        if params.resume_from_log and params.logger is not None:
            self.start_epoch, self.env_step, self.gradient_step = params.logger.restore_data()

    # ------------------------------------------------------------------
    @staticmethod
    def _flat_scalars(stats, prefix: str = "") -> dict[str, np.ndarray]:
        """Flatten a (possibly nested) stats Batch into numeric arrays."""
        out: dict[str, np.ndarray] = {}
        for k, v in stats.items():
            name = f"{prefix}{k}"
            if isinstance(v, Batch):
                out.update(_TrainerBase._flat_scalars(v, f"{name}/"))
                continue
            arr = np.asarray(v)
            if arr.dtype.kind in "fiu" and arr.size:
                out[name] = arr
        return out

    def _log_update(self, upd_stats) -> None:
        """Log MovAvg-smoothed losses at the update scope
        (reference trainer.py:731-754 via log_update_data)."""
        if upd_stats is None:
            return
        TraceLogger.log(
            "trainer/update",
            lambda: f"gradient_step={self.gradient_step} params={trace_param_hash(self._ts.params)}",
        )
        if self.params.logger is None:
            return
        data = {}
        for k, arr in self._flat_scalars(upd_stats).items():
            data[f"update/{k}"] = self._mov.setdefault(k, MovAvg()).add(arr)
        if data:
            self.params.logger.log_update_data(data, self.gradient_step)

    def _log_info(self, epoch: int, t0: float, timing: dict) -> None:
        """Epoch InfoStats/TimingStats (reference trainer.py:531-572,
        data/stats.py:65-121) at the info scope."""
        if self.params.logger is None:
            return
        total = time.time() - t0
        data = {
            "info/env_step": self.env_step,
            "info/gradient_step": self.gradient_step,
            "info/best_reward": self.best_reward,
            "info/best_score": self.best_score,
            "timing/total_time": total,
        }
        for k, v in timing.items():
            data[f"timing/{k}_time"] = v
        update_t = timing.get("update", 0.0)
        collect_t = timing.get("collect", 0.0)
        if collect_t + update_t > 0:
            data["timing/update_speed"] = self.gradient_step / max(update_t, 1e-9)
        self.params.logger.log_info_data(data, epoch)

    def _validate_collect(self, out) -> None:
        """NaN screen of collected data, gated by ENABLE_VALIDATION
        (reference collector.py:515-525, trainer.py:953)."""
        if not config.ENABLE_VALIDATION or out is None:
            return
        bad = []
        for k, arr in self._flat_scalars(out if isinstance(out, Batch) else Batch(out)).items():
            if arr.dtype.kind == "f" and np.isnan(arr).any():
                bad.append(k)
        if bad:
            raise ValueError(
                f"NaN detected in collected data at keys {bad} "
                "(ENABLE_VALIDATION integrity check)"
            )

    def _save_counters(self, epoch: int) -> None:
        if self.params.logger is not None:
            self.params.logger.save_data(epoch, self.env_step, self.gradient_step)

    # ------------------------------------------------------------------
    def _test(self, ts, test_collector: DeviceCollector, key, train_collector=None) -> CollectStats:
        p = self.params
        if p.test_fn is not None:
            ts = self._apply_hparams(ts, p.test_fn(self._epoch, self.env_step))
        rms = None
        if train_collector is not None and getattr(self, "_train_cstate", None) is not None:
            # hand the train envs' pooled obs-norm stats to the test envs
            from tianshou_tpu.env.wrappers import extract_pooled_rms

            rms = extract_pooled_rms(
                train_collector.venv.env, self._train_cstate.env_state
            )
        return test_collector.collect_episodes(
            ts, key, p.test_step_num_episodes, training=False, rms=rms
        )

    def _apply_hparams(self, ts, overrides: dict | None):
        if not overrides:
            return ts
        hp = ts.hparams.copy()
        for k, v in overrides.items():
            hp[k] = jnp.float32(v)
        return ts.replace(hparams=hp)

    def _score(self, stats: CollectStats) -> float:
        if self.params.compute_score_fn is not None:
            return self.params.compute_score_fn(stats)
        return float(stats.returns.mean()) if len(stats.returns) else -np.inf

    def _log_test(self, stats: CollectStats, epoch: int) -> bool:
        """Track best; returns True if stop condition met."""
        rew = float(stats.returns.mean()) if len(stats.returns) else -np.inf
        score = self._score(stats)
        if score > self.best_score:
            self.best_score = score
            self.best_reward = rew
            if self.params.save_best_fn is not None:
                self.params.save_best_fn(self._ts)
        if self.params.logger is not None:
            self.params.logger.log_test_data(
                {"test/reward": rew, "test/reward_std": float(stats.returns.std()) if len(stats.returns) else 0.0,
                 "test/length": float(stats.lens.mean()) if len(stats.lens) else 0.0,
                 "test/n_episodes": stats.n_collected_episodes},
                self.env_step,
            )
        if self.params.verbose:
            print(f"Epoch {epoch}: test_reward {rew:.2f} (best {self.best_reward:.2f}), env_step {self.env_step}")
        return self.params.stop_fn is not None and self.params.stop_fn(rew)


class OffPolicyTrainer(_TrainerBase):
    """Collect chunk -> burst of gradient steps, repeated (reference :1043)."""

    def __init__(self, algo, train_collector: DeviceCollector, test_collector: DeviceCollector,
                 buffer, params: OffPolicyTrainerParams) -> None:
        super().__init__(algo, params)
        self.train_collector = train_collector
        self.test_collector = test_collector
        self.buffer = buffer
        self._update_many = None

    def _build_update_many(self, n_updates: int, batch_size: int):
        algo, buffer = self.algo, self.buffer

        def update_many(ts, buf_state, key):
            def body(carry, k):
                ts, buf_state = carry
                ts, buf_state, stats = algo.update(ts, buffer, buf_state, k, batch_size)
                return (ts, buf_state), stats

            (ts, buf_state), stats = jax.lax.scan(body, (ts, buf_state), jax.random.split(key, n_updates))
            return ts, buf_state, stats

        return jax.jit(update_many, donate_argnums=(0, 1))

    def _build_megastep(self, T: int, n_updates: int, batch_size: int):
        """collect T steps + n_updates gradient steps as ONE jitted program."""
        algo, buffer = self.algo, self.buffer
        coll = self.train_collector

        def megastep(ts, cstate, buf_state, key):
            k_c, k_u = jax.random.split(key)
            keys = jax.random.split(k_c, T)

            def c_body(carry, k):
                # under ENABLE_VALIDATION keep the full transition in the
                # emitted rollout so the NaN screen sees obs/act/rew, not
                # just episode returns (reference collector.py:515-525)
                return coll._step_fn(
                    ts, carry, k, training=True, store=True,
                    keep_rollout=config.ENABLE_VALIDATION,
                )

            (cstate, buf_state), out = jax.lax.scan(c_body, (cstate, buf_state), keys)

            def u_body(carry, k):
                ts, buf_state = carry
                ts, buf_state, stats = algo.update(ts, buffer, buf_state, k, batch_size)
                return (ts, buf_state), stats

            (ts, buf_state), ustats = jax.lax.scan(u_body, (ts, buf_state), jax.random.split(k_u, n_updates))
            return ts, cstate, buf_state, out, ustats

        return jax.jit(megastep, donate_argnums=(0, 2))

    def run(self, ts, buf_state, key) -> TrainResult:
        p: OffPolicyTrainerParams = self.params
        t0 = time.time()
        collect_time = update_time = test_time = 0.0
        key, k = _split_host(key)
        cstate = self.train_collector.reset(k)
        E = self.train_collector.venv.num_envs
        T = p.collection_step_num_env_steps
        self._ts = ts

        # prefill with uniform random actions (reference start_timesteps /
        # RandomActionPolicy, experiment.py:444, collector.py:724)
        if p.start_steps > 0:
            n_chunks = int(np.ceil(p.start_steps / (T * E)))
            for _ in range(n_chunks):
                key, k = _split_host(key)
                cstate, buf_state, _ = self.train_collector.collect(
                    ts, cstate, buf_state, k, T, random=p.start_random
                )
                self.env_step += T * E

        n_updates = max(1, round(p.update_per_step * T * E))
        # build the jitted programs once per trainer (repeat run() calls —
        # warmup, resume — must not recompile)
        if self._update_many is None and not p.fused_megastep:
            self._update_many = self._build_update_many(n_updates, p.batch_size)
        if getattr(self, "_megastep", None) is None and p.fused_megastep:
            self._megastep = self._build_megastep(T, n_updates, p.batch_size)
        update_fn = self._update_many
        megastep_fn = getattr(self, "_megastep", None)

        from tianshou_tpu.utils.progress import progress_bar

        stop = False
        for epoch in range(self.start_epoch + 1, p.max_epochs + 1):
            self._epoch = epoch
            steps_this_epoch = 0
            pbar = progress_bar(p.epoch_num_steps, f"epoch {epoch}", p.show_progress)
            while steps_this_epoch < p.epoch_num_steps:
                if p.train_fn is not None:
                    ts = self._apply_hparams(ts, p.train_fn(epoch, self.env_step))
                tc = time.time()
                key, k = _split_host(key)
                upd_stats = None
                if p.fused_megastep:
                    ts, cstate, buf_state, out, upd_stats = megastep_fn(ts, cstate, buf_state, k)
                    self._train_cstate = cstate
                    jax.block_until_ready(out.done)
                    self.gradient_step += n_updates
                else:
                    cstate, buf_state, out = self.train_collector.collect(
                        ts, cstate, buf_state, k, T,
                        keep_rollout=config.ENABLE_VALIDATION,
                    )
                    self._train_cstate = cstate
                    jax.block_until_ready(out.done)
                collect_time += time.time() - tc
                self._validate_collect(out)
                self.env_step += T * E
                steps_this_epoch += T * E
                TraceLogger.log(
                    "trainer/collect",
                    lambda: f"env_step={self.env_step} episodes={int(np.asarray(out.done).sum())}",
                )
                pbar.update(T * E)
                stats = None
                if self.params.logger is not None or p.test_in_train:
                    stats = self.train_collector.stats_from(out)
                if self.params.logger is not None and stats.n_collected_episodes:
                    self.params.logger.log_train_data(
                        {"train/reward": float(stats.returns.mean()), "train/length": float(stats.lens.mean())},
                        self.env_step,
                    )
                # test_in_train: if training episodes already hit the stop
                # threshold, confirm with a test run and stop early
                # (reference trainer.py:978)
                if (
                    p.test_in_train
                    and p.stop_fn is not None
                    and stats is not None
                    and stats.n_collected_episodes > 0
                    and p.stop_fn(float(stats.returns.mean()))
                ):
                    key, k = _split_host(key)
                    self._ts = ts
                    test_stats = self._test(ts, self.test_collector, k, self.train_collector)
                    self._epoch = epoch
                    if self._log_test(test_stats, epoch):
                        return self._result(epoch, t0, collect_time, update_time, test_time, ts, buf_state)
                if not p.fused_megastep:
                    tu = time.time()
                    key, k = _split_host(key)
                    ts, buf_state, upd_stats = update_fn(ts, buf_state, k)
                    jax.block_until_ready(ts)
                    update_time += time.time() - tu
                    self.gradient_step += n_updates
                self._ts = ts
                self._log_update(upd_stats)
            pbar.close()
            tt = time.time()
            key, k = _split_host(key)
            test_stats = self._test(ts, self.test_collector, k, self.train_collector)
            test_time += time.time() - tt
            stop = self._log_test(test_stats, epoch)
            self._log_info(epoch, t0, {"collect": collect_time, "update": update_time, "test": test_time})
            self._save_counters(epoch)
            if p.save_checkpoint_fn is not None:
                p.save_checkpoint_fn(epoch, self.env_step, self.gradient_step, ts)
            if stop:
                break
        return self._result(epoch, t0, collect_time, update_time, test_time, ts, buf_state)

    def _result(self, epoch, t0, collect_time, update_time, test_time, ts, buf_state) -> TrainResult:
        return TrainResult(
            best_score=self.best_score,
            best_reward=self.best_reward,
            env_step=self.env_step,
            gradient_step=self.gradient_step,
            epochs=epoch,
            train_time=time.time() - t0,
            timing={"collect": collect_time, "update": update_time, "test": test_time},
            train_state=ts,
            buf_state=buf_state,
        )


class OnPolicyTrainer(_TrainerBase):
    """Rollout -> full-batch update with minibatch repeats (reference :1098).

    The rollout never touches a replay buffer: ``collect(keep_rollout=True)``
    hands the time-major batch straight to ``algo.update_rollout``.
    """

    def __init__(self, algo, train_collector: DeviceCollector, test_collector: DeviceCollector,
                 params: OnPolicyTrainerParams) -> None:
        super().__init__(algo, params)
        self.train_collector = train_collector
        self.test_collector = test_collector
        self._update_jit = None

    def run(self, ts, key) -> TrainResult:
        p: OnPolicyTrainerParams = self.params
        t0 = time.time()
        collect_time = update_time = test_time = 0.0
        key, k = _split_host(key)
        cstate = self.train_collector.reset(k)
        E = self.train_collector.venv.num_envs
        T = p.collection_step_num_env_steps
        self._ts = ts
        algo = self.algo

        if self._update_jit is None:
            self._update_jit = jax.jit(
                lambda ts, rollout, key: algo.update_rollout(
                    ts, rollout, key, repeat=p.update_step_num_repetitions, batch_size=p.batch_size
                ),
                donate_argnums=(0,),
            )

        from tianshou_tpu.utils.progress import progress_bar

        stop = False
        for epoch in range(self.start_epoch + 1, p.max_epochs + 1):
            self._epoch = epoch
            steps_this_epoch = 0
            pbar = progress_bar(p.epoch_num_steps, f"epoch {epoch}", p.show_progress)
            while steps_this_epoch < p.epoch_num_steps:
                if p.train_fn is not None:
                    ts = self._apply_hparams(ts, p.train_fn(epoch, self.env_step))
                key, k = _split_host(key)
                tc = time.time()
                cstate, _, out = self.train_collector.collect(
                    ts, cstate, None, k, T, training=True, keep_rollout=True
                )
                self._train_cstate = cstate
                jax.block_until_ready(out.done)
                collect_time += time.time() - tc
                self._validate_collect(out)
                self.env_step += T * E
                steps_this_epoch += T * E
                pbar.update(T * E)
                TraceLogger.log(
                    "trainer/collect",
                    lambda: f"env_step={self.env_step} episodes={int(np.asarray(out.done).sum())}",
                )
                stats = None
                if self.params.logger is not None or p.test_in_train:
                    stats = self.train_collector.stats_from(out)
                if self.params.logger is not None and stats.n_collected_episodes:
                    self.params.logger.log_train_data(
                        {"train/reward": float(stats.returns.mean()), "train/length": float(stats.lens.mean())},
                        self.env_step,
                    )
                # test_in_train early-stop confirmation (reference trainer.py:978)
                if (
                    p.test_in_train
                    and p.stop_fn is not None
                    and stats is not None
                    and stats.n_collected_episodes > 0
                    and p.stop_fn(float(stats.returns.mean()))
                ):
                    key, k = _split_host(key)
                    self._ts = ts
                    test_stats = self._test(ts, self.test_collector, k, self.train_collector)
                    self._epoch = epoch
                    if self._log_test(test_stats, epoch):
                        pbar.close()
                        return self._result(epoch, t0, collect_time, update_time, test_time, ts)
                key, k = _split_host(key)
                tu = time.time()
                ts, upd_stats = self._update_jit(ts, out.rollout, k)
                jax.block_until_ready(ts)
                update_time += time.time() - tu
                self.gradient_step += int(np.asarray(upd_stats.get("n_grad_steps", 1)))
                self._ts = ts
                self._log_update(upd_stats)
            pbar.close()
            key, k = _split_host(key)
            tt = time.time()
            test_stats = self._test(ts, self.test_collector, k, self.train_collector)
            test_time += time.time() - tt
            stop = self._log_test(test_stats, epoch)
            self._log_info(epoch, t0, {"collect": collect_time, "update": update_time, "test": test_time})
            self._save_counters(epoch)
            if p.save_checkpoint_fn is not None:
                p.save_checkpoint_fn(epoch, self.env_step, self.gradient_step, ts)
            if stop:
                break
        return self._result(epoch, t0, collect_time, update_time, test_time, ts)

    def _result(self, epoch, t0, collect_time, update_time, test_time, ts) -> TrainResult:
        return TrainResult(
            best_score=self.best_score,
            best_reward=self.best_reward,
            env_step=self.env_step,
            gradient_step=self.gradient_step,
            epochs=epoch,
            train_time=time.time() - t0,
            timing={"collect": collect_time, "update": update_time, "test": test_time},
            train_state=ts,
        )


class OfflineTrainer(_TrainerBase):
    """Fixed-dataset training (reference :780)."""

    def __init__(self, algo, buffer, test_collector: DeviceCollector | None,
                 params: OfflineTrainerParams) -> None:
        super().__init__(algo, params)
        self.buffer = buffer
        self.test_collector = test_collector

    def run(self, ts, buf_state, key) -> TrainResult:
        p: OfflineTrainerParams = self.params
        t0 = time.time()
        algo, buffer = self.algo, self.buffer
        n = p.update_step_num_gradient_steps_per_epoch
        self._ts = ts

        def update_many(ts, buf_state, key):
            def body(carry, k):
                ts, buf_state = carry
                ts, buf_state, stats = algo.update(ts, buffer, buf_state, k, p.batch_size)
                return (ts, buf_state), stats

            (ts, buf_state), stats = jax.lax.scan(body, (ts, buf_state), jax.random.split(key, n))
            return ts, buf_state, stats

        update_fn = jax.jit(update_many, donate_argnums=(0,))

        stop = False
        for epoch in range(self.start_epoch + 1, p.max_epochs + 1):
            self._epoch = epoch
            key, k = _split_host(key)
            ts, buf_state, upd_stats = update_fn(ts, buf_state, k)
            self.gradient_step += n
            self._ts = ts
            self._log_update(upd_stats)
            if self.test_collector is not None:
                key, k = _split_host(key)
                test_stats = self._test(ts, self.test_collector, k)
                stop = self._log_test(test_stats, epoch)
            self._log_info(epoch, t0, {})
            self._save_counters(epoch)
            if p.save_checkpoint_fn is not None:
                p.save_checkpoint_fn(epoch, self.env_step, self.gradient_step, ts)
            if stop:
                break
        return TrainResult(
            best_score=self.best_score,
            best_reward=self.best_reward,
            env_step=0,
            gradient_step=self.gradient_step,
            epochs=epoch,
            train_time=time.time() - t0,
            timing={},
            train_state=ts,
            buf_state=buf_state,
        )


class HostOnPolicyTrainer(_TrainerBase):
    """On-policy trainer over the HOST collector (Gymnasium envs): rollouts
    come from :meth:`HostCollector.collect_rollout`, updates stay jitted on
    the accelerator (reference OnPolicyTrainer :1098 applied to the host
    env path)."""

    def __init__(self, algo, train_collector, test_collector, params: OnPolicyTrainerParams) -> None:
        super().__init__(algo, params)
        self.train_collector = train_collector
        self.test_collector = test_collector
        self._update_jit = None

    def run(self, ts, key) -> TrainResult:
        p: OnPolicyTrainerParams = self.params
        t0 = time.time()
        collect_time = update_time = test_time = 0.0
        tc = self.train_collector
        if tc._obs is None:
            tc.reset(seed=p.seed)
        E = len(tc.venv)
        T = p.collection_step_num_env_steps
        self._ts = ts
        algo = self.algo
        if self._update_jit is None:
            self._update_jit = jax.jit(
                lambda ts, rollout, key: algo.update_rollout(
                    ts, rollout, key, repeat=p.update_step_num_repetitions, batch_size=p.batch_size
                ),
                donate_argnums=(0,),
            )
        stop = False
        epoch = self.start_epoch
        for epoch in range(self.start_epoch + 1, p.max_epochs + 1):
            self._epoch = epoch
            steps_this_epoch = 0
            while steps_this_epoch < p.epoch_num_steps:
                if p.train_fn is not None:
                    ts = self._apply_hparams(ts, p.train_fn(epoch, self.env_step))
                key, k = _split_host(key)
                t_c = time.time()
                rollout, stats = tc.collect_rollout(ts, k, T)
                collect_time += time.time() - t_c
                self._validate_collect(rollout)
                self.env_step += stats.n_collected_steps
                steps_this_epoch += stats.n_collected_steps
                if p.logger is not None and stats.n_collected_episodes:
                    p.logger.log_train_data(
                        {"train/reward": float(stats.returns.mean())}, self.env_step
                    )
                key, k = _split_host(key)
                t_u = time.time()
                ts, upd_stats = self._update_jit(ts, rollout, k)
                jax.block_until_ready(ts)
                update_time += time.time() - t_u
                self.gradient_step += int(np.asarray(upd_stats.get("n_grad_steps", 1)))
                self._ts = ts
                self._log_update(upd_stats)
            key, k = _split_host(key)
            ts_test = self._apply_hparams(ts, p.test_fn(epoch, self.env_step)) if p.test_fn else ts
            t_t = time.time()
            test_stats = self.test_collector.collect(
                ts_test, k, n_episode=p.test_step_num_episodes, training=False,
                reset_before_collect=True,
            )
            test_time += time.time() - t_t
            stop = self._log_test(test_stats, epoch)
            self._log_info(epoch, t0, {"collect": collect_time, "update": update_time, "test": test_time})
            self._save_counters(epoch)
            if p.save_checkpoint_fn is not None:
                p.save_checkpoint_fn(epoch, self.env_step, self.gradient_step, ts)
            if stop:
                break
        return TrainResult(
            best_score=self.best_score,
            best_reward=self.best_reward,
            env_step=self.env_step,
            gradient_step=self.gradient_step,
            epochs=epoch,
            train_time=time.time() - t0,
            timing={"collect": collect_time, "update": update_time, "test": test_time},
            train_state=ts,
        )


class HostOffPolicyTrainer(_TrainerBase):
    """Off-policy trainer over the HOST collector (Gymnasium envs): same
    epoch/test/stop semantics as :class:`OffPolicyTrainer`, with collection
    through :class:`tianshou_tpu.data.host_collector.HostCollector` (or its
    async variant) while updates stay jitted on the accelerator."""

    def __init__(self, algo, train_collector, test_collector, buffer,
                 params: OffPolicyTrainerParams) -> None:
        super().__init__(algo, params)
        self.train_collector = train_collector
        self.test_collector = test_collector
        self.buffer = buffer

    def run(self, ts, buf_state, key) -> TrainResult:
        p: OffPolicyTrainerParams = self.params
        t0 = time.time()
        collect_time = update_time = test_time = 0.0
        algo, buffer = self.algo, self.buffer
        tc = self.train_collector
        tc.buf_state = buf_state
        if tc._obs is None:
            tc.reset(seed=p.seed)
        self._ts = ts
        T = p.collection_step_num_env_steps * len(tc.venv)

        if p.start_steps > 0:
            key, k = _split_host(key)
            tc.collect(ts, k, n_step=p.start_steps, random=p.start_random)
            self.env_step += p.start_steps

        n_updates = max(1, round(p.update_per_step * T))

        def update_many(ts, buf_state, key):
            def body(carry, k):
                ts, buf_state = carry
                ts, buf_state, stats = algo.update(ts, buffer, buf_state, k, p.batch_size)
                return (ts, buf_state), stats

            (ts, buf_state), stats = jax.lax.scan(body, (ts, buf_state), jax.random.split(key, n_updates))
            return ts, buf_state, stats

        update_fn = jax.jit(update_many)
        # overlapped mode: ONE gradient step per jitted call, dispatched
        # async from the collector's step hook while envs are stepping.
        # buf_state is donated (the add/update chain is strictly linear);
        # ts is NOT (the chunk's forwards still read the chunk-start ts).
        upd_one = jax.jit(
            lambda ts, bs, k: algo.update(ts, buffer, bs, k, p.batch_size),
            donate_argnums=(1,),
        )

        stop = False
        epoch = self.start_epoch
        for epoch in range(self.start_epoch + 1, p.max_epochs + 1):
            self._epoch = epoch
            steps_this_epoch = 0
            while steps_this_epoch < p.epoch_num_steps:
                if p.train_fn is not None:
                    ts = self._apply_hparams(ts, p.train_fn(epoch, self.env_step))
                key, k = _split_host(key)
                t_c = time.time()
                if p.overlap_updates:
                    key, ku = _split_host(key)
                    # one split dispatch buys the whole chunk's update keys
                    upd_keys = jax.random.split(ku, n_updates)
                    st = {"ts": ts, "pend": 0.0, "n": 0, "stats": None}

                    def hook(n_env_steps: int) -> None:
                        st["pend"] += p.update_per_step * n_env_steps
                        while st["pend"] >= 1.0 and st["n"] < n_updates:
                            st["pend"] -= 1.0
                            st["ts"], tc.buf_state, st["stats"] = upd_one(
                                st["ts"], tc.buf_state, upd_keys[st["n"]]
                            )
                            st["n"] += 1

                    tc.step_hook = hook
                    try:
                        stats = tc.collect(ts, k, n_step=T)
                    finally:
                        tc.step_hook = None
                    # flush the rounding remainder so the chunk's gradient
                    # cadence matches the sequential loop exactly
                    while st["n"] < n_updates:
                        st["ts"], tc.buf_state, st["stats"] = upd_one(
                            st["ts"], tc.buf_state, upd_keys[st["n"]]
                        )
                        st["n"] += 1
                    collect_time += time.time() - t_c
                    t_u = time.time()
                    ts, upd_stats = st["ts"], st["stats"]
                    # residual sync: ~0 when the env-step window fully hid
                    # the update work — the overlap shows up as this gap
                    jax.block_until_ready(ts)
                    update_time += time.time() - t_u
                else:
                    stats = tc.collect(ts, k, n_step=T)
                    collect_time += time.time() - t_c
                if config.ENABLE_VALIDATION:
                    # probe the live transition state the collector just
                    # wrote (obs + episode returns) — the off-policy path
                    # has no rollout to screen (reference collector.py:515)
                    self._validate_collect(Batch(
                        obs=np.asarray(tc._obs), returns=stats.returns,
                    ))
                self.env_step += stats.n_collected_steps
                steps_this_epoch += stats.n_collected_steps
                if p.logger is not None and stats.n_collected_episodes:
                    p.logger.log_train_data(
                        {"train/reward": float(stats.returns.mean())}, self.env_step
                    )
                if not p.overlap_updates:
                    key, k = _split_host(key)
                    t_u = time.time()
                    ts, tc.buf_state, upd_stats = update_fn(ts, tc.buf_state, k)
                    jax.block_until_ready(ts)
                    update_time += time.time() - t_u
                self.gradient_step += n_updates
                self._ts = ts
                self._log_update(upd_stats)
            key, k = _split_host(key)
            if p.test_fn is not None:
                ts_test = self._apply_hparams(ts, p.test_fn(epoch, self.env_step))
            else:
                ts_test = ts
            t_t = time.time()
            test_stats = self.test_collector.collect(
                ts_test, k, n_episode=p.test_step_num_episodes, training=False,
                reset_before_collect=True,
            )
            test_time += time.time() - t_t
            stop = self._log_test(test_stats, epoch)
            self._log_info(epoch, t0, {"collect": collect_time, "update": update_time, "test": test_time})
            self._save_counters(epoch)
            if p.save_checkpoint_fn is not None:
                p.save_checkpoint_fn(epoch, self.env_step, self.gradient_step, ts)
            if stop:
                break
        return TrainResult(
            best_score=self.best_score,
            best_reward=self.best_reward,
            env_step=self.env_step,
            gradient_step=self.gradient_step,
            epochs=epoch,
            train_time=time.time() - t0,
            timing={"collect": collect_time, "update": update_time, "test": test_time},
            train_state=ts,
            buf_state=tc.buf_state,
        )
