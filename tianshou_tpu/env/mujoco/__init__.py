"""Device MuJoCo-class benchmark environments (reference examples/mujoco)."""

from tianshou_tpu.env.mujoco.base import MujocoEnv, PhysState
from tianshou_tpu.env.mujoco.locomotion import Ant, HalfCheetah, Hopper, Reacher, Swimmer, Walker2d

__all__ = ["MujocoEnv", "PhysState", "HalfCheetah", "Hopper", "Walker2d", "Ant", "Swimmer", "Reacher"]
