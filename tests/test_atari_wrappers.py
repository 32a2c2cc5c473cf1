"""Atari wrapper-stack validation against a scripted fake ALE.

ALE itself is absent from this image, so each wrapper's contract
(reference env/atari/atari_wrapper.py: NoopResetEnv:57, MaxAndSkipEnv:90,
EpisodicLifeEnv:134, FireResetEnv:193, WarpFrame:213, ClipRewardEnv:263,
FrameStack:278, wrap_deepmind:335) is checked against a deterministic
scripted environment that mimics the ALE surface (5-tuple step,
``unwrapped.ale.lives()``, ``get_action_meanings()``, RGB frames): step
accounting, pooled frames, life-loss episode splitting, reward clipping,
and the composed DeepMind stack.
"""

import numpy as np
import pytest

from tianshou_tpu.env.atari import (
    ClipRewardEnv,
    ScaledFloatFrame,
    EpisodicLifeEnv,
    FireResetEnv,
    FrameStack,
    MaxAndSkipEnv,
    NoopResetEnv,
    WarpFrame,
    wrap_deepmind,
)


class _FakeALE:
    def __init__(self, outer):
        self._outer = outer

    def lives(self):
        return self._outer._lives


class FakeAtari:
    """Scripted ALE-like env: frame t is a constant image of value t%256;
    rewards/lives/dones follow user-provided scripts (dict step->value)."""

    def __init__(
        self,
        shape=(210, 160, 3),
        rewards=None,
        life_losses=(),
        done_at=None,
        meanings=("NOOP", "FIRE", "RIGHT", "LEFT"),
        episode_len=10_000,
    ):
        self.shape = shape
        self.rewards = rewards or {}
        self.life_losses = set(life_losses)
        self.done_at = done_at
        self.meanings = list(meanings)
        self.episode_len = episode_len
        self.t = 0
        self._lives = 3
        self.steps_taken = []  # actions received, across resets
        self.reset_count = 0
        self.ale = _FakeALE(self)
        self.unwrapped = self

    def get_action_meanings(self):
        return self.meanings

    def _frame(self):
        return np.full(self.shape, self.t % 256, np.uint8)

    def reset(self, **kw):
        self.t = 0
        self._lives = 3
        self.reset_count += 1
        return self._frame(), {}

    def step(self, a):
        self.steps_taken.append(int(a))
        self.t += 1
        if self.t in self.life_losses:
            self._lives -= 1
        term = (self.done_at is not None and self.t >= self.done_at) or self._lives <= 0
        trunc = self.t >= self.episode_len
        return self._frame(), float(self.rewards.get(self.t, 0.0)), term, trunc, {}


# ---------------------------------------------------------------- NoopReset
def test_noop_reset_steps_noops():
    env = FakeAtari()
    w = NoopResetEnv(env, noop_max=8)
    for _ in range(20):  # rng-driven: exercise the range repeatedly
        env.steps_taken.clear()
        w.reset()
        assert 1 <= len(env.steps_taken) <= 8
        assert all(a == 0 for a in env.steps_taken)


def test_noop_reset_reresets_on_done():
    # an env that dies during the noop burst must be reset again
    env = FakeAtari(done_at=1)
    w = NoopResetEnv(env, noop_max=5)
    obs, _ = w.reset()
    assert env.reset_count >= 2
    assert obs.shape == env.shape


# --------------------------------------------------------------- MaxAndSkip
def test_max_and_skip_pools_last_two_and_sums_reward():
    env = FakeAtari(rewards={1: 1.0, 2: 2.0, 3: 4.0, 4: 8.0})
    w = MaxAndSkipEnv(env, skip=4)
    env.reset()
    obs, r, term, trunc, _ = w.step(3)
    assert r == 15.0
    assert len(env.steps_taken) == 4
    # frames 3 and 4 pooled elementwise-max -> constant 4
    assert obs.max() == obs.min() == 4
    assert not term and not trunc


def test_max_and_skip_stops_at_done():
    env = FakeAtari(rewards={1: 1.0, 2: 1.0}, done_at=2)
    w = MaxAndSkipEnv(env, skip=4)
    env.reset()
    obs, r, term, _, _ = w.step(0)
    assert term
    assert r == 2.0
    assert len(env.steps_taken) == 2  # early break, no post-done stepping


# ------------------------------------------------------------- EpisodicLife
def test_episodic_life_splits_episodes_without_real_reset():
    env = FakeAtari(life_losses={3}, done_at=100)
    w = EpisodicLifeEnv(env)
    w.reset()
    resets_before = env.reset_count
    term = False
    steps = 0
    while not term:
        _, _, term, _, _ = w.step(0)
        steps += 1
    assert steps == 3  # life lost at t=3 -> fake terminal
    assert not w.was_real_done
    # reset after a fake terminal must NOT truly reset: it noop-steps on
    w.reset()
    assert env.reset_count == resets_before
    assert env.t == 4  # advanced by the one noop step


def test_episodic_life_real_done_truly_resets():
    env = FakeAtari(done_at=2)
    w = EpisodicLifeEnv(env)
    w.reset()
    term = False
    while not term:
        _, _, term, _, _ = w.step(0)
    assert w.was_real_done
    before = env.reset_count
    w.reset()
    assert env.reset_count == before + 1
    assert env.t == 0


# ---------------------------------------------------------------- FireReset
def test_fire_reset_presses_fire():
    env = FakeAtari()
    w = FireResetEnv(env)
    env.steps_taken.clear()
    w.reset()
    assert env.steps_taken == [1]


# ---------------------------------------------------------------- WarpFrame
def test_warp_frame_shape_dtype_and_grayscale():
    env = FakeAtari()
    w = WarpFrame(env)
    obs, _ = w.reset()
    assert obs.shape == (84, 84)
    assert obs.dtype == np.uint8
    # constant value v maps to v*(0.299+0.587+0.114)=v (within truncation)
    env.t = 100  # frame value 101 after the next step
    obs, *_ = w.step(0)
    assert obs.max() == obs.min()
    assert abs(int(obs[0, 0]) - 101) <= 1


def test_warp_frame_grayscale_weights():
    env = FakeAtari()
    w = WarpFrame(env)
    red = np.zeros((210, 160, 3), np.uint8)
    red[..., 0] = 200
    assert w._warp(red)[0, 0] == int(200 * 0.299)
    blue = np.zeros((210, 160, 3), np.uint8)
    blue[..., 2] = 200
    assert w._warp(blue)[0, 0] == int(200 * 0.114)


# --------------------------------------------------------------- ClipReward
def test_clip_reward_signs():
    env = FakeAtari(rewards={1: 7.5, 2: -3.0, 3: 0.0})
    w = ClipRewardEnv(env)
    env.reset()
    assert [w.step(0)[1] for _ in range(3)] == [1.0, -1.0, 0.0]


# ---------------------------------------------------------- ScaledFloatFrame
def test_scaled_float_frame():
    env = FakeAtari()
    w = ScaledFloatFrame(env)
    obs, _ = w.reset()
    assert obs.dtype == np.float32
    assert obs.max() <= 1.0 and obs.min() >= 0.0
    env.t = 254  # next frame value 255 -> exactly 1.0
    obs, *_ = w.step(0)
    assert obs.max() == 1.0


# --------------------------------------------------------------- FrameStack
def test_frame_stack_reset_fill_and_rolling():
    env = FakeAtari(shape=(4, 4, 3))
    w = FrameStack(WarpFrame(env), n_frames=4)
    obs, _ = w.reset()
    assert obs.shape == (84, 84, 4)
    assert (obs[..., 0] == obs[..., 3]).all()  # reset fills with copies
    for _ in range(4):
        obs, *_ = w.step(0)
    # after 4 steps the stack holds frames t=1..4 oldest-first
    vals = [int(obs[0, 0, i]) for i in range(4)]
    assert vals == sorted(vals)
    assert vals[-1] == env.t % 256


# ------------------------------------------------------------ composed stack
def test_wrap_deepmind_composed_contract():
    env = FakeAtari(rewards={5: 3.0}, life_losses={40}, done_at=200)
    w = wrap_deepmind(env, noop_max=2, max_and_skip=4, frame_stack=4)
    obs, _ = w.reset()
    assert obs.shape == (84, 84, 4) and obs.dtype == np.uint8
    obs, r, term, trunc, _ = w.step(0)
    assert r in (0.0, 1.0)  # clipped
    # roll to the scripted life loss: stack must emit a (fake) terminal
    saw_term = False
    for _ in range(30):
        obs, r, term, trunc, _ = w.step(0)
        if term:
            saw_term = True
            break
    assert saw_term
    # resuming after the fake terminal continues the same underlying life
    resets = env.reset_count
    obs, _ = w.reset()
    assert env.reset_count == resets
    assert obs.shape == (84, 84, 4)


def test_wrap_deepmind_skips_fire_when_absent():
    env = FakeAtari(meanings=("NOOP", "RIGHT", "LEFT"))
    w = wrap_deepmind(env, noop_max=2)
    layers = []
    x = w
    while hasattr(x, "env"):
        layers.append(type(x).__name__)
        x = x.env
    assert "FireResetEnv" not in layers
