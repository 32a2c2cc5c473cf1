"""Host vector environments for Gymnasium-compatible envs.

Rebuild of the reference's process-based env layer (``tianshou/env/
venvs.py:25-473``, ``env/worker/*``): ``DummyVectorEnv`` (sequential),
``SubprocVectorEnv`` (one process per env over pipes with cloudpickled
factories, subproc.py:77-140) and the async partial-wait API
(``wait_num``/``timeout``, venvs.py:288-310).

This path exists for envs that cannot be expressed as pure JAX functions
(Atari, MuJoCo, PettingZoo). On-device envs use
:class:`tianshou_tpu.env.core.VectorDeviceEnv` instead, where stepping is a
fused XLA program. The host collector overlaps policy inference with env
stepping via ``jax.device_put`` of observation batches.
"""

from __future__ import annotations

import multiprocessing as mp
import time
from collections.abc import Callable
from typing import Any

import cloudpickle
import numpy as np

__all__ = ["EnvWorker", "DummyEnvWorker", "SubprocEnvWorker", "BaseVectorEnv", "DummyVectorEnv", "SubprocVectorEnv", "VectorEnvNormObs"]

GYM_RESERVED_KEYS = ("metadata", "reward_range", "spec", "action_space", "observation_space")


class _CloudpickleWrapper:
    """Pickle env factories through cloudpickle (reference env/utils.py:14)."""

    def __init__(self, fn: Callable) -> None:
        self.fn = fn

    def __getstate__(self):
        return cloudpickle.dumps(self.fn)

    def __setstate__(self, data):
        self.fn = cloudpickle.loads(data)


class EnvWorker:
    """send/recv decoupled worker protocol (reference worker_base.py:11)."""

    def __init__(self, env_fn: Callable) -> None:
        self._env_fn = env_fn
        self.is_closed = False
        self.result: Any = None

    def send(self, action: Any, **kwargs: Any) -> None:
        raise NotImplementedError

    def recv(self) -> Any:
        return self.result

    def reset(self, **kwargs: Any) -> tuple:
        self.send(None, **kwargs)
        return self.recv()

    def step(self, action: Any) -> tuple:
        self.send(action)
        return self.recv()

    def get_env_attr(self, key: str) -> Any:
        raise NotImplementedError

    def set_env_attr(self, key: str, value: Any) -> None:
        raise NotImplementedError

    def seed(self, seed: int | None = None) -> Any:
        return None

    def render(self, **kwargs: Any) -> Any:
        raise NotImplementedError

    def close(self) -> None:
        self.is_closed = True

    @staticmethod
    def wait(workers: list["EnvWorker"], wait_num: int, timeout: float | None = None) -> list["EnvWorker"]:
        raise NotImplementedError


class DummyEnvWorker(EnvWorker):
    """In-process worker (reference env/worker/dummy.py)."""

    def __init__(self, env_fn: Callable) -> None:
        super().__init__(env_fn)
        self.env = env_fn()

    def send(self, action: Any, **kwargs: Any) -> None:
        if action is None:
            self.result = self.env.reset(**kwargs)
        else:
            self.result = self.env.step(action)

    def get_env_attr(self, key: str) -> Any:
        return getattr(self.env, key)

    def set_env_attr(self, key: str, value: Any) -> None:
        setattr(self.env.unwrapped, key, value)

    def seed(self, seed: int | None = None) -> Any:
        try:
            return self.env.reset(seed=seed)
        except TypeError:
            return None

    def render(self, **kwargs: Any) -> Any:
        return self.env.render(**kwargs)

    def close(self) -> None:
        if not self.is_closed:
            self.env.close()
            self.is_closed = True

    @staticmethod
    def wait(workers, wait_num, timeout=None):
        return workers[:wait_num]


def _subproc_worker(parent, pipe, env_fn_wrapper):
    parent.close()
    env = env_fn_wrapper.fn()
    try:
        while True:
            try:
                cmd, data = pipe.recv()
            except EOFError:
                pipe.close()
                break
            if cmd == "step":
                pipe.send(env.step(data))
            elif cmd == "reset":
                pipe.send(env.reset(**data))
            elif cmd == "close":
                pipe.send(env.close())
                pipe.close()
                break
            elif cmd == "render":
                pipe.send(env.render(**data) if hasattr(env, "render") else None)
            elif cmd == "getattr":
                pipe.send(getattr(env, data, None))
            elif cmd == "setattr":
                setattr(env.unwrapped, data["key"], data["value"])
            else:
                pipe.close()
                raise NotImplementedError(cmd)
    except KeyboardInterrupt:
        pipe.close()


class SubprocEnvWorker(EnvWorker):
    """One OS process per env over a pipe (reference subproc.py:143)."""

    def __init__(self, env_fn: Callable) -> None:
        super().__init__(env_fn)
        ctx = mp.get_context("fork")
        self.parent_remote, self.child_remote = ctx.Pipe()
        args = (self.parent_remote, self.child_remote, _CloudpickleWrapper(env_fn))
        self.process = ctx.Process(target=_subproc_worker, args=args, daemon=True)
        self.process.start()
        self.child_remote.close()
        self._waiting = False

    def send(self, action: Any, **kwargs: Any) -> None:
        if action is None:
            self.parent_remote.send(("reset", kwargs))
        else:
            self.parent_remote.send(("step", action))
        self._waiting = True

    def recv(self) -> Any:
        result = self.parent_remote.recv()
        self._waiting = False
        return result

    def get_env_attr(self, key: str) -> Any:
        self.parent_remote.send(("getattr", key))
        return self.parent_remote.recv()

    def set_env_attr(self, key: str, value: Any) -> None:
        self.parent_remote.send(("setattr", {"key": key, "value": value}))

    def render(self, **kwargs: Any) -> Any:
        self.parent_remote.send(("render", kwargs))
        return self.parent_remote.recv()

    def close(self) -> None:
        if not self.is_closed:
            try:
                self.parent_remote.send(("close", None))
                self.parent_remote.recv()
                self.process.join(timeout=5)
            except (BrokenPipeError, EOFError):
                pass
            finally:
                self.process.terminate()
                self.is_closed = True

    @staticmethod
    def wait(workers, wait_num, timeout=None):
        from multiprocessing import connection

        remain = list(workers)
        ready: list[EnvWorker] = []
        t0 = time.time()
        while len(ready) < wait_num:
            budget = None if timeout is None else max(timeout - (time.time() - t0), 0)
            conns = connection.wait([w.parent_remote for w in remain], timeout=budget)
            new = [w for w in remain if w.parent_remote in conns]
            ready.extend(new)
            remain = [w for w in remain if w not in new]
            if timeout is not None and time.time() - t0 > timeout:
                break
        return ready


class BaseVectorEnv:
    """Synchronous + async stepping over a worker pool (reference venvs.py:25)."""

    def __init__(
        self,
        env_fns: list[Callable],
        worker_fn: Callable[[Callable], EnvWorker],
        wait_num: int | None = None,
        timeout: float | None = None,
    ) -> None:
        self.workers = [worker_fn(fn) for fn in env_fns]
        self.env_num = len(env_fns)
        self.wait_num = wait_num or len(env_fns)
        self.timeout = timeout
        self.is_async = self.wait_num != len(env_fns) or timeout is not None
        self.waiting_conn: list[EnvWorker] = []
        self.waiting_id: list[int] = []
        self.ready_id = list(range(self.env_num))
        self.is_closed = False

    def __len__(self) -> int:
        return self.env_num

    def _wrap_id(self, id: int | list[int] | np.ndarray | None) -> list[int]:
        if id is None:
            return list(range(self.env_num))
        return [id] if np.isscalar(id) else list(id)

    def get_env_attr(self, key: str, id=None) -> list:
        return [self.workers[i].get_env_attr(key) for i in self._wrap_id(id)]

    def set_env_attr(self, key: str, value: Any, id=None) -> None:
        for i in self._wrap_id(id):
            self.workers[i].set_env_attr(key, value)

    @property
    def observation_space(self):
        return self.get_env_attr("observation_space", 0)[0]

    @property
    def action_space(self):
        return self.get_env_attr("action_space", 0)[0]

    def reset(self, id=None, **kwargs):
        ids = self._wrap_id(id)
        # decorrelate parallel envs: spread a scalar reset seed per env
        # (reference venvs.py:324-328 applies the same spreading for seed())
        seed = kwargs.get("seed")
        for k, i in enumerate(ids):
            kw = kwargs if seed is None or not np.isscalar(seed) else {**kwargs, "seed": int(seed) + i}
            self.workers[i].send(None, **kw)
        results = [self.workers[i].recv() for i in ids]
        obs = np.stack([r[0] for r in results]) if not isinstance(results[0][0], dict) else [r[0] for r in results]
        infos = [r[1] for r in results]
        return obs, np.array(infos, dtype=object)

    def step(self, action: np.ndarray, id=None):
        ids = self._wrap_id(id)
        if not self.is_async:
            assert len(action) == len(ids)
            for i, j in enumerate(ids):
                self.workers[j].send(action[i])
            results = []
            for j in ids:
                obs, rew, term, trunc, info = self.workers[j].recv()
                info["env_id"] = j
                results.append((obs, rew, term, trunc, info))
        else:
            if action is not None:
                for i, (act, env_id) in enumerate(zip(action, ids)):
                    self.workers[env_id].send(act)
                    self.waiting_conn.append(self.workers[env_id])
                    self.waiting_id.append(env_id)
                self.ready_id = [x for x in self.ready_id if x not in ids]
            ready_workers: list[EnvWorker] = []
            while not ready_workers:
                ready_workers = type(self.workers[0]).wait(self.waiting_conn, self.wait_num, self.timeout)
            results = []
            for w in ready_workers:
                idx = self.waiting_conn.index(w)
                self.waiting_conn.pop(idx)
                env_id = self.waiting_id.pop(idx)
                obs, rew, term, trunc, info = w.recv()
                info["env_id"] = env_id
                results.append((obs, rew, term, trunc, info))
                self.ready_id.append(env_id)
        obs_list = [r[0] for r in results]
        obs = np.stack(obs_list) if not isinstance(obs_list[0], dict) else obs_list
        rew = np.array([r[1] for r in results], np.float32)
        term = np.array([r[2] for r in results], bool)
        trunc = np.array([r[3] for r in results], bool)
        info = np.array([r[4] for r in results], dtype=object)
        return obs, rew, term, trunc, info

    def seed(self, seed: int | list[int] | None = None) -> None:
        # spread a scalar seed to [seed, seed+1, ...] so parallel envs are
        # decorrelated (reference venvs.py:324-328)
        if seed is None:
            seeds: list[int | None] = [None] * self.env_num
        elif np.isscalar(seed):
            seeds = [int(seed) + i for i in range(self.env_num)]
        else:
            seeds = list(seed)
        for w, s in zip(self.workers, seeds):
            w.seed(s)

    def render(self, **kwargs) -> list:
        return [w.render(**kwargs) for w in self.workers]

    def close(self) -> None:
        for w in self.workers:
            w.close()
        self.is_closed = True


class DummyVectorEnv(BaseVectorEnv):
    """Sequential in-process loop (reference venvs.py:365)."""

    def __init__(self, env_fns, **kwargs) -> None:
        super().__init__(env_fns, DummyEnvWorker, **kwargs)


class SubprocVectorEnv(BaseVectorEnv):
    """One subprocess per env (reference venvs.py:389)."""

    def __init__(self, env_fns, **kwargs) -> None:
        super().__init__(env_fns, SubprocEnvWorker, **kwargs)


class VectorEnvNormObs:
    """Host venv wrapper normalizing observations with ONE shared
    RunningMeanStd (reference venv_wrappers.py:69 VectorEnvNormObs):
    update on train steps, freeze for test via ``set_obs_rms`` +
    ``update_obs_rms=False``."""

    def __init__(self, venv, update_obs_rms: bool = True) -> None:
        from tianshou_tpu.utils.statistics import RunningMeanStd

        self.venv = venv
        self.update_obs_rms = update_obs_rms
        self.obs_rms = RunningMeanStd()

    # delegation -----------------------------------------------------------
    def __len__(self) -> int:
        return len(self.venv)

    def __getattr__(self, key):
        return getattr(self.venv, key)

    def get_obs_rms(self):
        return self.obs_rms

    def set_obs_rms(self, obs_rms) -> None:
        self.obs_rms = obs_rms

    # stepping -------------------------------------------------------------
    def _norm(self, obs):
        if isinstance(obs, np.ndarray) and obs.dtype != object:
            if self.update_obs_rms:
                self.obs_rms.update(obs)
            return self.obs_rms.norm(obs).astype(np.float32)
        return obs

    def reset(self, id=None, **kwargs):
        obs, info = self.venv.reset(id=id, **kwargs)
        return self._norm(obs), info

    def step(self, action, id=None):
        obs, rew, term, trunc, info = self.venv.step(action, id=id)
        return self._norm(obs), rew, term, trunc, info
