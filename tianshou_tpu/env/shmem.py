"""Shared-memory env worker: observations bypass the pipe.

Rebuild of the reference's ``ShmemVectorEnv`` / ``ShArray`` (env/venvs.py:
427-446, env/worker/subproc.py:18-74): each child process writes its
observation into a ``multiprocessing.shared_memory`` block and sends only
scalars through the pipe, avoiding obs pickling for large (image)
observations. The host collector then feeds the stacked obs straight to
``jax.device_put``.
"""

from __future__ import annotations

import multiprocessing as mp
from multiprocessing import shared_memory

import numpy as np

from tianshou_tpu.env.venvs import BaseVectorEnv, EnvWorker, _CloudpickleWrapper

__all__ = ["ShmemEnvWorker", "ShmemVectorEnv"]


def _shmem_worker(parent, pipe, env_fn_wrapper):
    parent.close()
    env = env_fn_wrapper.fn()
    shm = None
    buf = None

    def put_obs(obs):
        nonlocal shm, buf
        obs = np.asarray(obs)
        if shm is None:
            shm = shared_memory.SharedMemory(create=True, size=max(obs.nbytes, 1))
            buf = np.ndarray(obs.shape, obs.dtype, buffer=shm.buf)
            pipe.send(("spec", (shm.name, obs.shape, str(obs.dtype))))
        buf[...] = obs

    try:
        while True:
            try:
                cmd, data = pipe.recv()
            except EOFError:
                break
            if cmd == "step":
                obs, rew, term, trunc, info = env.step(data)
                put_obs(obs)
                pipe.send(("step", (rew, term, trunc, info)))
            elif cmd == "reset":
                obs, info = env.reset(**data)
                put_obs(obs)
                pipe.send(("reset", (info,)))
            elif cmd == "getattr":
                pipe.send(("attr", getattr(env, data, None)))
            elif cmd == "close":
                pipe.send(("closed", None))
                break
    finally:
        if shm is not None:
            shm.close()
            shm.unlink()
        pipe.close()


class ShmemEnvWorker(EnvWorker):
    def __init__(self, env_fn) -> None:
        super().__init__(env_fn)
        ctx = mp.get_context("fork")
        self.parent_remote, self.child_remote = ctx.Pipe()
        args = (self.parent_remote, self.child_remote, _CloudpickleWrapper(env_fn))
        self.process = ctx.Process(target=_shmem_worker, args=args, daemon=True)
        self.process.start()
        self.child_remote.close()
        self._shm = None
        self._view: np.ndarray | None = None

    def _attach(self, name: str, shape, dtype) -> None:
        self._shm = shared_memory.SharedMemory(name=name)
        self._view = np.ndarray(shape, np.dtype(dtype), buffer=self._shm.buf)

    def _recv_tagged(self):
        tag, payload = self.parent_remote.recv()
        if tag == "spec":
            self._attach(*payload)
            return self._recv_tagged()
        return tag, payload

    def send(self, action, **kwargs) -> None:
        if action is None:
            self.parent_remote.send(("reset", kwargs))
        else:
            self.parent_remote.send(("step", action))

    def recv(self):
        tag, payload = self._recv_tagged()
        obs = self._view.copy()
        if tag == "reset":
            return obs, payload[0]
        rew, term, trunc, info = payload
        return obs, rew, term, trunc, info

    def get_env_attr(self, key: str):
        self.parent_remote.send(("getattr", key))
        return self._recv_tagged()[1]

    def set_env_attr(self, key, value) -> None:
        raise NotImplementedError

    def close(self) -> None:
        if not self.is_closed:
            try:
                self.parent_remote.send(("close", None))
                self.parent_remote.recv()
            except (BrokenPipeError, EOFError):
                pass
            finally:
                if self._shm is not None:
                    self._shm.close()
                self.process.terminate()
                self.is_closed = True

    @staticmethod
    def wait(workers, wait_num, timeout=None):
        from tianshou_tpu.env.venvs import SubprocEnvWorker

        return SubprocEnvWorker.wait(workers, wait_num, timeout)


class ShmemVectorEnv(BaseVectorEnv):
    """Vector env over shared-memory workers (reference venvs.py:427)."""

    def __init__(self, env_fns, **kwargs) -> None:
        super().__init__(env_fns, ShmemEnvWorker, **kwargs)
