"""Unit battery for ``save_only_last_obs`` + ``ignore_obs_next`` storage modes.

The pixel-path memory features (reference buffer_base.py: store each frame
once, re-stack at sample time; drop obs_next and reconstruct from next(idx))
are exercised end-to-end by tests/test_image_pipeline.py; these unit cases
pin the storage/reconstruction semantics directly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import ReplayBuffer


def _tr(frame_stack, term=False):
    """One env, obs arrives frame-stacked [1, L] (1-D 'frames' for clarity)."""
    fs = jnp.asarray(frame_stack, jnp.float32)[None]
    return Batch(
        obs=fs,
        act=jnp.zeros(1, jnp.int32),
        rew=jnp.zeros(1, jnp.float32),
        terminated=jnp.asarray([term]),
        truncated=jnp.asarray([False]),
    )


def example(stack):
    return Batch(
        obs=jnp.zeros((), jnp.float32),
        act=jnp.int32(0),
        rew=jnp.float32(0),
        terminated=jnp.bool_(False),
        truncated=jnp.bool_(False),
    )


def test_only_newest_frame_is_stored():
    buf = ReplayBuffer(size=8, stack_num=3, save_only_last_obs=True, ignore_obs_next=True)
    state = buf.init(example(3))
    # env emits stacked obs [f_{t-2}, f_{t-1}, f_t]; ring must hold f_t only
    for t in range(4):
        stacked = [max(t - 2, 0), max(t - 1, 0), t]
        state, _ = buf.add(state, _tr(stacked))
    np.testing.assert_array_equal(np.asarray(state.data.obs[0, :4]), [0, 1, 2, 3])
    assert "obs_next" not in state.data


def test_get_restacks_from_single_frames():
    buf = ReplayBuffer(size=8, stack_num=3, save_only_last_obs=True, ignore_obs_next=True)
    state = buf.init(example(3))
    for t in range(5):
        stacked = [max(t - 2, 0), max(t - 1, 0), t]
        state, _ = buf.add(state, _tr(stacked, term=(t == 4)))
    got = buf.get(state, jnp.array([0, 2, 4]))
    # episode-start clamp repeats frame 0, matching what the env stacked
    np.testing.assert_array_equal(np.asarray(got.obs), [[0, 0, 0], [0, 1, 2], [2, 3, 4]])
    # obs_next = stack at next(idx), clamped at episode end
    np.testing.assert_array_equal(np.asarray(got.obs_next), [[0, 0, 1], [1, 2, 3], [2, 3, 4]])


def test_reconstruction_matches_full_storage():
    """The memory-optimized mode must sample bit-identically to a buffer
    that stores the full stacked obs (the reference's equivalence)."""
    lean = ReplayBuffer(size=16, stack_num=3, save_only_last_obs=True, ignore_obs_next=True)
    full = ReplayBuffer(size=16, stack_num=1)
    ls = lean.init(example(3))
    ex_full = Batch(
        obs=jnp.zeros(3), act=jnp.int32(0), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False),
        obs_next=jnp.zeros(3),
    )
    fs = full.init(ex_full)
    frames = [0]
    for t in range(10):
        term = t % 5 == 4
        stacked = [frames[max(len(frames) - 3, 0)], frames[max(len(frames) - 2, 0)], frames[-1]]
        nxt_frame = 0.0 if term else float(t + 1)
        nxt_stacked = stacked[1:] + [nxt_frame] if not term else [0.0, 0.0, 0.0]
        ls, _ = lean.add(ls, _tr(stacked, term))
        fs, _ = full.add(fs, Batch(
            obs=jnp.asarray(stacked, jnp.float32)[None],
            act=jnp.zeros(1, jnp.int32), rew=jnp.zeros(1),
            terminated=jnp.asarray([term]), truncated=jnp.asarray([False]),
            obs_next=jnp.asarray(nxt_stacked, jnp.float32)[None],
        ))
        frames = [0.0] if term else frames + [float(t + 1)]
    idx = jnp.arange(10)
    lean_got = lean.get(ls, idx)
    full_got = full.get(fs, idx, stack_num=1)
    np.testing.assert_array_equal(np.asarray(lean_got.obs), np.asarray(full_got.obs))


def test_memory_footprint_is_single_frame():
    buf = ReplayBuffer(size=4, stack_num=4, save_only_last_obs=True, ignore_obs_next=True)
    state = buf.init(Batch(
        obs=jnp.zeros((), jnp.float32), act=jnp.int32(0), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False),
    ))
    # ring stores [E=1, C=4] scalars — not [E, C, stack]
    assert state.data.obs.shape == (1, 4)
