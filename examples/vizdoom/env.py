"""ViZDoom environment layer — rebuild of the reference's
examples/vizdoom/env.py (``Env``:45, button combos :20-42,
``make_vizdoom_env``:136).

With the ``vizdoom`` package installed the scripts play the real Doom
scenarios through the host path (DoomGame + frameskip + health/killcount/
ammo reward shaping, exactly the reference's shaping rules). In this image
vizdoom is absent, so the fallback is :class:`SyntheticDoom` — a first-
person-style "turn toward the medikit and walk into it" game rendered at
the reference's (40, 60) resolution — and the full pixel pipeline trains
end-to-end on the accelerator with the same obs contract
([stack, 40, 60, 1] uint8) and the same action set (the 6 normal button
combinations).
"""

import sys as _sys
from pathlib import Path as _P

_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.env.core import Box, Discrete, Env, EnvStep

RES = (40, 60, 1)
STACK = 4


def normal_button_comb() -> list:
    """6 = {stay, forward} x {no-turn, left, right} (reference env.py:20)."""
    actions = []
    for fwd in ([0.0], [1.0]):
        for turn in ([0.0, 0.0], [0.0, 1.0], [1.0, 0.0]):
            actions.append(fwd + turn)
    return actions


def battle_button_comb() -> list:
    """108 battle-mode combos: attack x speed x strafe x move x turn (reference env.py:29)."""
    actions = []
    for attack in ([0.0], [1.0]):
        for speed in ([0.0], [1.0]):
            for strafe in ([0.0, 0.0], [0.0, 1.0], [1.0, 0.0]):
                for move in ([0.0, 0.0], [0.0, 1.0], [1.0, 0.0]):
                    for turn in ([0.0, 0.0], [0.0, 1.0], [1.0, 0.0]):
                        actions.append(move + strafe + turn + attack + speed)
    return actions


def _resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """cv2-free nearest-neighbour resize for the host adapter."""
    ri = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
    ci = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
    return img[ri][:, ci]


class VizdoomEnv:
    """Host adapter over vizdoom.DoomGame (reference env.py:45): frameskip,
    rolling [C, H, W] uint8 screen buffer, reward shaped from health /
    killcount / ammo deltas. Gated on the optional ``vizdoom`` package."""

    def __init__(self, cfg_path: str, frameskip: int = 4, res=(4, 40, 60), save_lmp: bool = False):
        try:
            import vizdoom as vzd
        except ImportError as e:  # pragma: no cover
            raise ImportError("vizdoom is not installed") from e
        self._vzd = vzd
        self.res = res
        self.skip = frameskip
        self.save_lmp = save_lmp
        self.health_setting = "battle" in cfg_path
        self.game = vzd.DoomGame()
        self.game.load_config(cfg_path)
        self.game.init()
        self.available_actions = (
            battle_button_comb() if "battle" in cfg_path else normal_button_comb()
        )
        self.observation_space = Box(low=0, high=255, shape=res, dtype=np.uint8)
        self.action_space = Discrete(len(self.available_actions))
        self.count = 0

    def _push_frame(self) -> None:
        state = self.game.get_state()
        if state is None:
            return
        frame = _resize_nearest(np.asarray(state.screen_buffer), self.res[-2], self.res[-1])
        self.obs_buffer[:-1] = self.obs_buffer[1:]
        self.obs_buffer[-1] = frame

    def _vars(self):
        gv = self._vzd.GameVariable
        return (self.game.get_game_variable(gv.HEALTH),
                self.game.get_game_variable(gv.KILLCOUNT),
                self.game.get_game_variable(gv.AMMO2))

    def reset(self, seed=None, **kwargs):
        if seed is not None:
            self.game.set_seed(seed)
        if self.save_lmp:
            self.game.new_episode(f"lmps/episode_{self.count}.lmp")
        else:
            self.game.new_episode()
        self.count += 1
        self.obs_buffer = np.zeros(self.res, np.uint8)
        self._push_frame()
        self.health, self.killcount, self.ammo2 = self._vars()
        return self.obs_buffer, {}

    def step(self, action: int):
        self.game.make_action(self.available_actions[int(action)], self.skip)
        self._push_frame()
        health, killcount, ammo2 = self._vars()
        reward = 20.0 * (killcount - self.killcount) + (ammo2 - self.ammo2)
        if self.health_setting or health > self.health:
            # positive-only health reward outside battle maps (env.py:104)
            reward += health - self.health
        self.health, self.killcount, self.ammo2 = health, killcount, ammo2
        dead = self.game.is_player_dead() or self.game.get_state() is None
        finished = self.game.is_episode_finished()
        terminated = bool(dead)
        truncated = bool(finished and not dead)
        return self.obs_buffer, float(reward), terminated, truncated, {}

    def render(self):
        pass

    def close(self):
        self.game.close()


class _DoomState(NamedTuple):
    heading: jnp.ndarray  # agent yaw, degrees-ish int [0, 36)
    target: jnp.ndarray   # medikit bearing, same units
    dist: jnp.ndarray     # distance to medikit [0, 30]
    t: jnp.ndarray


class SyntheticDoom(Env):
    """Device stand-in with the reference scenario's obs/action contract:
    a medikit column is rendered at its bearing relative to the agent's
    heading; turn (left/right) to center it, then move forward to collect
    (+1, like D1_basic's health pickups). Fixed 200-step horizon."""

    max_episode_steps = 200
    n_headings = 36

    def __init__(self) -> None:
        self.observation_space = Box(low=0, high=255, shape=RES, dtype=jnp.uint8)
        self.action_space = Discrete(len(normal_button_comb()))

    def _obs(self, s: _DoomState) -> jnp.ndarray:
        H, W, _ = RES
        rel = (s.target - s.heading) % self.n_headings  # bearing in [0, 36)
        # visible in a 180° FOV: columns map bearings [-9, +9] onto [0, W)
        signed = jnp.where(rel > self.n_headings // 2, rel - self.n_headings, rel)
        col_center = (W // 2 + signed * (W // (self.n_headings // 2))).astype(jnp.int32)
        # medikit apparent size grows as it gets closer
        half_w = (3 + (30 - s.dist) // 4).astype(jnp.int32)
        top = (H * s.dist / 60).astype(jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        visible = jnp.abs(signed) <= self.n_headings // 4
        img = (jnp.abs(cols - col_center) <= half_w) & (rows >= top) & visible
        # floor texture gives the net a horizon reference
        floor = (rows >= 3 * H // 4) & ((cols + rows) % 7 == 0)
        return ((img | floor).astype(jnp.uint8) * 255)[..., None]

    def reset(self, key):
        kt, kh = jax.random.split(key)
        s = _DoomState(
            heading=jax.random.randint(kh, (), 0, self.n_headings),
            target=jax.random.randint(kt, (), 0, self.n_headings),
            dist=jnp.int32(25),
            t=jnp.int32(0),
        )
        return s, self._obs(s)

    def step(self, state, action, key):
        # normal_button_comb order: [stay/fwd] x [none, right, left]
        fwd = action >= 3
        turn = jnp.where(action % 3 == 1, 1, jnp.where(action % 3 == 2, -1, 0))
        heading = (state.heading + turn) % self.n_headings
        rel = (state.target - heading) % self.n_headings
        signed = jnp.where(rel > self.n_headings // 2, rel - self.n_headings, rel)
        facing = jnp.abs(signed) <= 2
        dist = jnp.where(fwd & facing, state.dist - 1, state.dist)
        collected = dist <= 0
        rew = jnp.where(collected, 1.0, 0.0).astype(jnp.float32)
        kt, kd = jax.random.split(key)
        target = jnp.where(collected, jax.random.randint(kt, (), 0, self.n_headings), state.target)
        dist = jnp.where(collected, jnp.int32(25), dist)
        t = state.t + 1
        s = _DoomState(heading, target, dist, t)
        return EnvStep(
            state=s, obs=self._obs(s), reward=rew,
            terminated=jnp.bool_(False),
            truncated=t >= self.max_episode_steps,
            info=Batch(),
        )


def make_vizdoom_env(task: str = "D1_basic", frame_skip: int = 4, res=(STACK, *RES[:2]),
                     num_training_envs: int = 10, num_test_envs: int = 10, seed=None):
    """(env/envs/test_envs) — real DoomGame stacks when vizdoom is present,
    the synthetic device stand-in otherwise (reference env.py:136)."""
    try:
        import vizdoom  # noqa: F401

        from tianshou_tpu.env.venvs import SubprocVectorEnv

        cfg = str(_P(__file__).parent / "maps" / f"{task}.cfg")
        mk = lambda: VizdoomEnv(cfg, frameskip=frame_skip, res=res)  # noqa: E731
        env = mk()
        return env, SubprocVectorEnv([mk for _ in range(num_training_envs)]), \
            SubprocVectorEnv([mk for _ in range(num_test_envs)])
    except ImportError:
        from tianshou_tpu.env.core import VectorDeviceEnv
        from tianshou_tpu.env.wrappers import FrameStack

        env = FrameStack(SyntheticDoom(), STACK)
        return env, VectorDeviceEnv(env, num_training_envs), VectorDeviceEnv(env, num_test_envs)
