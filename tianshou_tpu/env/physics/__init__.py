"""TPU-native articulated rigid-body physics.

A generalized-coordinate dynamics core built from JAX transforms: forward
kinematics is the only hand-written model function; velocities, mass
matrices, bias forces, and contact Jacobians all come from ``jvp``/``vjp``/
``grad`` of it. This replaces the MuJoCo dependency behind the reference's
benchmark suite (``/root/reference/examples/mujoco``) with a pure-XLA
program that vmaps over thousands of environments on chip.

Models are loaded from the Gymnasium MJCF assets (an MJCF subset parser in
:mod:`.mjcf`) so geometry, masses, gears, damping, and joint limits match
the benchmark environments exactly.
"""

from tianshou_tpu.env.physics.model import Model
from tianshou_tpu.env.physics.mjcf import load_mjcf
from tianshou_tpu.env.physics.dynamics import step, forward_kinematics, init_state

__all__ = ["Model", "load_mjcf", "step", "forward_kinematics", "init_state"]
