"""Device-resident replay buffer.

Rebuild of the reference's ``ReplayBuffer`` (data/buffer/buffer_base.py:25)
and ``ReplayBufferManager`` (data/buffer/manager.py:13) as ONE structure: a
pytree of ``[num_envs, capacity, ...]`` ring arrays with per-env cursors.
The reference lays N sub-buffers into one flat array with offset bookkeeping
and numba prev/next kernels (manager.py:311-363); here the env axis is a real
array axis, so every operation is a batched gather/scatter that XLA fuses
into the surrounding jitted program — buffer adds inside a ``lax.scan``
rollout never leave the chip.

All mutating ops are pure: ``add(state, transitions) -> (state, info)``.
Flat index convention: ``idx = env * capacity + slot``.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.data.batch import Batch

__all__ = ["BufferState", "ReplayBuffer", "VectorReplayBuffer"]


class BufferState(NamedTuple):
    data: Batch            # [E, C, ...] ring storage per reserved key
    cursor: jnp.ndarray    # [E] next write slot
    size: jnp.ndarray      # [E] valid entries per env ring
    last_idx: jnp.ndarray  # [E] slot of most recent write (for next())


class AddInfo(NamedTuple):
    """Returned by add(): flat indices written and episode bookkeeping."""

    indices: jnp.ndarray    # [E] flat indices written (or -1 where masked out)
    done: jnp.ndarray       # [E] episode finished at this step
    ep_returns: jnp.ndarray  # [E] episode return where done (garbage elsewhere)
    ep_lens: jnp.ndarray     # [E] episode length where done


class ReplayBuffer:
    """Static configuration handle; state lives in :class:`BufferState`.

    Reserved keys match the reference (buffer_base.py:41): obs, act, rew,
    terminated, truncated, done, obs_next, plus optional info/policy subtrees.
    """

    relabels_on_sample = False  # HER overrides: targets must use the batch

    def __init__(
        self,
        size: int,
        num_envs: int = 1,
        stack_num: int = 1,
        ignore_obs_next: bool = False,
        save_only_last_obs: bool = False,
        sample_avail: bool = False,
    ) -> None:
        assert size > 0 and num_envs > 0
        self.capacity = int(math.ceil(size / num_envs))
        self.num_envs = num_envs
        self.total_size = self.capacity * num_envs
        self.stack_num = stack_num
        self.ignore_obs_next = ignore_obs_next
        # frame-stacked envs: store only the newest frame, re-stack at sample
        # time via stack_num (reference buffer_base.py save_only_last_obs)
        self.save_only_last_obs = save_only_last_obs
        self.sample_avail = sample_avail

    # ------------------------------------------------------------------
    def init(self, example: Batch) -> BufferState:
        """Allocate storage from a single example transition (no env axis)."""
        from tianshou_tpu.data.types import TRANSITION_EXAMPLE_KEYS, validate_keys

        validate_keys(example, TRANSITION_EXAMPLE_KEYS)
        E, C = self.num_envs, self.capacity

        def alloc(x):
            x = jnp.asarray(x)
            return jnp.zeros((E, C) + x.shape, x.dtype)

        data = jax.tree.map(alloc, example)
        if self.ignore_obs_next and "obs_next" in data:
            del data["obs_next"]
        if "done" not in data and "terminated" in data:
            data.done = jnp.zeros((E, C), bool)
        return BufferState(
            data=data,
            cursor=jnp.zeros(E, jnp.int32),
            size=jnp.zeros(E, jnp.int32),
            last_idx=jnp.zeros(E, jnp.int32),
        )

    # ------------------------------------------------------------------
    def add(
        self,
        state: BufferState,
        transitions: Batch,
        mask: jnp.ndarray | None = None,
    ) -> tuple[BufferState, AddInfo]:
        """Insert one transition per env (leading axis E), ring-advance.

        ``mask`` (optional [E] bool) suppresses writes for inactive envs —
        the analogue of the reference's ``buffer_ids`` subset adds
        (manager.py:131).
        """
        E, C = self.num_envs, self.capacity
        if mask is None:
            mask = jnp.ones(E, bool)
        cur = state.cursor
        term = transitions.terminated.astype(bool)
        trunc = transitions.truncated.astype(bool)
        done = term | trunc
        transitions = transitions.copy()
        transitions.done = done
        if self.save_only_last_obs:
            # obs arrives frame-stacked [E, L, ...]; keep the newest frame
            transitions.obs = jax.tree.map(lambda a: a[:, -1], transitions.obs)
            if "obs_next" in transitions:
                transitions.obs_next = jax.tree.map(lambda a: a[:, -1], transitions.obs_next)
        if self.ignore_obs_next and "obs_next" in transitions:
            transitions = transitions.copy()
            del transitions["obs_next"]

        env_ids = jnp.arange(E)
        write_env = jnp.where(mask, env_ids, E)  # E = drop sentinel

        def write(store, val):
            return store.at[write_env, cur].set(val, mode="drop")

        data = jax.tree.map(write, state.data, transitions)
        m = mask.astype(jnp.int32)
        new_state = BufferState(
            data=data,
            cursor=(cur + m) % C,
            size=jnp.minimum(state.size + m, C),
            last_idx=jnp.where(mask, cur, state.last_idx),
        )
        flat = jnp.where(mask, env_ids * C + cur, -1)
        info = AddInfo(
            indices=flat,
            done=done & mask,
            ep_returns=jnp.zeros(E, jnp.float32),  # filled by the collector
            ep_lens=jnp.zeros(E, jnp.int32),
        )
        return new_state, info

    def add_rollout(self, state: BufferState, rollout: Batch) -> BufferState:
        """Bulk-insert a time-major rollout ``[T, E, ...]`` via one scan."""

        def body(st, tr):
            st, _ = self.add(st, tr)
            return st, None

        state, _ = jax.lax.scan(body, state, rollout)
        return state

    # ------------------------------------------------------------------
    # episode-aware index arithmetic (reference buffer_base.py:319-334,
    # manager.py:311-363 numba kernels)
    # ------------------------------------------------------------------
    def _split(self, flat_idx: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        return flat_idx // self.capacity, flat_idx % self.capacity

    def _oldest_slot(self, state: BufferState, env: jnp.ndarray) -> jnp.ndarray:
        full = state.size[env] >= self.capacity
        return jnp.where(full, state.cursor[env] % self.capacity, 0)

    def prev(self, state: BufferState, flat_idx: jnp.ndarray) -> jnp.ndarray:
        """Index of previous transition, stopping at episode/buffer start."""
        env, slot = self._split(flat_idx)
        C = self.capacity
        prev_abs = (slot - 1) % C
        at_oldest = slot == self._oldest_slot(state, env)
        prev_abs = jnp.where(at_oldest, slot, prev_abs)
        end_prev = state.data.done[env, prev_abs]
        out_slot = jnp.where(end_prev, slot, prev_abs)
        return env * C + out_slot

    def next(self, state: BufferState, flat_idx: jnp.ndarray) -> jnp.ndarray:
        """Index of next transition, stopping at episode end / newest entry."""
        env, slot = self._split(flat_idx)
        C = self.capacity
        is_end = state.data.done[env, slot]
        is_last = slot == state.last_idx[env]
        stay = is_end | is_last
        nxt = jnp.where(stay, slot, (slot + 1) % C)
        return env * C + nxt

    # ------------------------------------------------------------------
    def _avail_mask(self, state: BufferState) -> jnp.ndarray:
        """[E*C] mask of indices whose full ``stack_num`` history exists
        (reference sample_avail, buffer_base.py:515-545): walking prev must
        not clamp (episode start / buffer edge) before the stack completes."""
        E, C = self.num_envs, self.capacity
        idx = jnp.arange(E * C)
        slot = idx % C
        stored = slot[None, :].reshape(E, C) < jnp.maximum(state.size[:, None], 0)
        full = state.size[:, None] >= C
        ok = jnp.where(full, True, stored).reshape(E * C)
        cur = idx
        for _ in range(self.stack_num - 1):
            prv = self.prev(state, cur)
            ok = ok & (prv != cur)
            cur = prv
        return ok

    def sample_indices(self, state: BufferState, key: jax.Array, batch_size: int) -> jnp.ndarray:
        """Uniform flat indices over all valid entries (ragged per-env sizes).

        Mirrors weighted cross-sub-buffer sampling (manager.py:200). With
        ``sample_avail`` and ``stack_num>1``, only indices with a complete
        frame-stack history are drawn.
        """
        if self.sample_avail and self.stack_num > 1:
            ok = self._avail_mask(state)
            logits = jnp.where(ok, 0.0, -jnp.inf)
            return jax.random.categorical(key, logits, shape=(batch_size,))
        sizes = state.size
        cum = jnp.cumsum(sizes)
        total = cum[-1]
        u = jax.random.randint(key, (batch_size,), 0, jnp.maximum(total, 1))
        # On a fully-empty buffer searchsorted returns env == num_envs, which
        # would silently clamp on gather (reference raises; inside jit we clamp
        # — callers must guard, see Trainer/ENABLE_VALIDATION).
        env = jnp.minimum(jnp.searchsorted(cum, u, side="right"), self.num_envs - 1)
        offset_in_env = u - jnp.where(env > 0, cum[jnp.maximum(env - 1, 0)], 0)
        # map the k-th valid entry of a ring to an absolute slot
        oldest = self._oldest_slot(state, env)
        slot = (oldest + offset_in_env) % self.capacity
        return env * self.capacity + slot

    # ------------------------------------------------------------------
    def get(
        self,
        state: BufferState,
        flat_idx: jnp.ndarray,
        stack_num: int | None = None,
        keys: tuple[str, ...] | None = None,
        drop_keys: tuple[str, ...] = (),
    ) -> Batch:
        """Gather transitions at ``flat_idx``; frame-stack obs if configured.

        Frame stacking mirrors reference ``get`` (buffer_base.py:557-598):
        the last ``stack_num`` observations along a new trailing-first axis,
        clamped at episode starts (earliest frame repeats).

        ``keys`` (whitelist) / ``drop_keys`` (blacklist) restrict which
        fields are gathered. On pixel rings one frame-stacked field is a
        multi-KB row gather — the dominant cost of a DQN update (measured:
        half the update time, scripts/mfu_probe.py) — so callers that don't
        consume a field must not pay for it: the n-step preprocess fetches
        only ``(obs_next, terminated)`` at the terminal index, and the DQN
        family drops ``obs_next`` from the sampled batch entirely when
        targets come from the n-step terminal row.
        """
        stack = self.stack_num if stack_num is None else stack_num
        want = set(state.data.keys() if keys is None else keys) - set(drop_keys)
        want_obs_next = "obs_next" in want or (keys is None and "obs_next" not in drop_keys)
        env, slot = self._split(flat_idx)
        batch = Batch()
        for k, v in state.data.items():
            if k not in want or (stack > 1 and k in ("obs", "obs_next")):
                continue
            batch[k] = jax.tree.map(lambda a: a[env, slot], v) if isinstance(v, Batch) else v[env, slot]
        if stack > 1:
            if "obs" in want:
                batch.obs = self._stacked(state, flat_idx, "obs", stack)
            if "obs_next" in state.data and want_obs_next:
                batch.obs_next = self._stacked(state, flat_idx, "obs_next", stack)
        if "obs_next" not in state.data and want_obs_next:
            # reconstruct obs_next = obs at next index (reference ignore_obs_next
            # path, buffer_base.py:557-598 — which frame-stacks obs at
            # next(index) so obs and obs_next have matching [B, stack, ...] shapes)
            nxt = self.next(state, flat_idx)
            if stack > 1:
                batch.obs_next = self._stacked(state, nxt, "obs", stack)
            else:
                nenv, nslot = self._split(nxt)
                src = state.data.obs
                batch.obs_next = jax.tree.map(lambda a: a[nenv, nslot], src) if isinstance(src, Batch) else src[nenv, nslot]
        return batch

    def _stacked(self, state: BufferState, flat_idx: jnp.ndarray, key: str, stack: int) -> jnp.ndarray:
        """Frame-stack gather as ONE [B*stack]-row gather.

        The prev-chain is [B] integer index math; materializing the whole
        chain first and gathering once replaces ``stack`` separate gather
        kernels with one. The chain is laid out sample-major ([B, stack])
        so the gather result needs only a reshape, not a transpose. On the
        dispatch-bound replay path (docs/03_benchmarks.md: 7 KB-row gathers
        at 2% of HBM bandwidth) kernel COUNT is the cost, not bytes.
        """
        idxs = [flat_idx]
        for _ in range(stack - 1):
            idxs.append(self.prev(state, idxs[-1]))
        idxs.reverse()  # oldest first, matching reference stack order
        chain = jnp.stack(idxs, axis=1)  # [B, stack]
        B, S = chain.shape
        env, slot = self._split(chain.reshape(-1))
        src = state.data[key]

        def g(a):
            rows = a[env, slot]  # ONE gather of [B*S] rows
            return rows.reshape((B, S) + a.shape[2:])

        return jax.tree.map(g, src) if isinstance(src, Batch) else g(src)

    def sample(
        self,
        state: BufferState,
        key: jax.Array,
        batch_size: int,
        drop_keys: tuple[str, ...] = (),
    ) -> tuple[Batch, jnp.ndarray]:
        idx = self.sample_indices(state, key, batch_size)
        return self.get(state, idx, drop_keys=drop_keys), idx

    # ------------------------------------------------------------------
    def n_step_gather(
        self, state: BufferState, flat_idx: jnp.ndarray, n: int
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Gather the n-step chain from each index.

        Returns (rewards [n, B], episode_end [n, B], terminal_idx [B]) where
        terminal_idx = next^{n-1}(idx), feeding
        :func:`tianshou_tpu.ops.returns.nstep_returns` exactly like the
        reference's ``compute_nstep_return`` (algorithm_base.py:721).
        """
        idxs = [flat_idx]
        for _ in range(n - 1):
            idxs.append(self.next(state, idxs[-1]))
        # one gather per field over the whole [n, B] chain (vs n per field)
        chain = jnp.stack(idxs)  # [n, B]
        env, slot = self._split(chain.reshape(-1))
        rews = state.data.rew[env, slot].reshape(chain.shape)
        ends = state.data.done[env, slot].reshape(chain.shape).astype(jnp.float32)
        return rews, ends, idxs[-1]

    # ------------------------------------------------------------------
    # host-level episode/merge utilities (reference buffer_base.py:171,336)
    # ------------------------------------------------------------------
    def get_buffer_indices(self, state: BufferState, start: int, stop: int) -> np.ndarray:
        """Flat indices of the transitions from ``start`` (inclusive) to
        ``stop`` (exclusive) within one env ring, in chronological order.

        The span may wrap the ring edge (``stop``'s slot numerically below
        ``start``'s), exactly like the reference's cross-edge episode fetch
        (buffer_base.py:171-250). Host-level: validates the span and raises
        on malformed input rather than clamping.
        """
        C = self.capacity
        env_s, slot_s = divmod(int(start), C)
        env_e, slot_e = divmod(int(stop), C)
        if env_s != env_e:
            raise ValueError(
                f"start={start} and stop={stop} lie in different env rings "
                f"({env_s} vs {env_e}); episodes never span envs"
            )
        if not 0 <= env_s < self.num_envs:
            raise ValueError(f"env {env_s} out of range [0, {self.num_envs})")
        length = (slot_e - slot_s) % C
        if length == 0 and start != stop:
            length = C  # full-ring episode
        if length == 0:
            raise ValueError(f"empty span: start == stop == {start}")
        size = int(state.size[env_s])
        if length > size:
            raise ValueError(
                f"span of length {length} exceeds the {size} stored entries "
                f"of env ring {env_s}"
            )
        slots = (slot_s + np.arange(length)) % C
        if size < C and (slots >= size).any():
            raise ValueError(
                f"span {start}:{stop} touches unwritten slots of env ring {env_s}"
            )
        return env_s * C + slots

    def chronological_indices(self, state: BufferState, env: int) -> np.ndarray:
        """Flat indices of env ring ``env``, oldest -> newest (host-level)."""
        size = int(state.size[env])
        full = size >= self.capacity
        oldest = int(state.cursor[env]) % self.capacity if full else 0
        slots = (oldest + np.arange(size)) % self.capacity
        return env * self.capacity + slots

    def update(self, state: BufferState, src: "ReplayBuffer", src_state: BufferState) -> BufferState:
        """Merge every stored transition of ``src`` (oldest -> newest, env by
        env) into this buffer — reference ``ReplayBuffer.update``
        (buffer_base.py:336). Like the reference (manager.py raises
        NotImplementedError), only a single-ring destination supports merge.
        Host-level utility: not for use inside jit.
        """
        if self.num_envs != 1:
            raise NotImplementedError(
                "update() merges into a single-ring ReplayBuffer only "
                "(reference ReplayBufferManager.update raises likewise)"
            )
        for env in range(src.num_envs):
            flat = src.chronological_indices(src_state, env)
            if len(flat) == 0:
                continue
            rows = src.get(src_state, jnp.asarray(flat), stack_num=1)
            # replay the rows through add() one at a time (ring semantics)
            def body(st, tr):
                st, _ = self.add(st, jax.tree.map(lambda a: a[None], tr))
                return st, None

            state, _ = jax.lax.scan(body, state, rows)
        return state

    # ------------------------------------------------------------------
    def num_stored(self, state: BufferState) -> jnp.ndarray:
        return state.size.sum()


def VectorReplayBuffer(total_size: int, buffer_num: int, **kwargs) -> ReplayBuffer:
    """Constructor matching the reference's ``VectorReplayBuffer`` signature
    (data/buffer/vecbuf.py:15): total capacity split across ``buffer_num``
    per-env rings."""
    return ReplayBuffer(total_size, num_envs=buffer_num, **kwargs)
