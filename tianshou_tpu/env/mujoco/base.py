"""Base class for device MuJoCo-class locomotion envs.

Task structure (observations, rewards, termination, reset noise, horizons)
mirrors the Gymnasium MuJoCo v4 envs the reference benchmarks against
(/root/reference/examples/mujoco/README.md); dynamics run on the
:mod:`tianshou_tpu.env.physics` core with models loaded from the same
asset XMLs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.env.core import Box, Env, EnvStep
from tianshou_tpu.env.physics import load_mjcf
from tianshou_tpu.env.physics import dynamics as dyn

__all__ = ["PhysState", "MujocoEnv"]


def _fused_auto_ok() -> bool:
    """Default gate for the fused Pallas physics path: single real TPU chip.

    Multi-device setups shard env batches over the mesh; a pallas_call is
    not auto-partitionable, so those must opt in explicitly (physics_mode=
    'fused') inside their own shard_map.
    """
    try:
        return jax.default_backend() in ("tpu", "axon") and jax.device_count() == 1
    except Exception:  # pragma: no cover
        return False


class PhysState(NamedTuple):
    q: jnp.ndarray
    qd: jnp.ndarray
    t: jnp.ndarray


class MujocoEnv(Env):
    xml: str = ""
    frame_skip: int = 5
    max_episode_steps = 1000
    # integrator substeps per model timestep; None = dynamics default
    # (contact-accurate dt <= 2ms). Set lower for ~2.4x throughput at
    # reduced high-speed contact fidelity (see dynamics.step docstring).
    substeps: int | None = None
    # APGD contact-solver iterations; None = model default (12).  The 3-D
    # free-joint tasks (Ant/Humanoid) set 30: their many-row contact QPs
    # measurably benefit (Ant parity 4.7% rel err @30 vs 6.5% @12), while
    # the planar tasks converge by 8 (scripts/physics_parity.py sweeps).
    contact_iterations: int | None = None
    # gym reset_noise_scale
    reset_noise_scale: float = 0.1
    reset_noise_kind: str = "uniform"  # qpos noise; qvel noise is scaled normal
    # geom-pair (self-collision) contact rows — real MuJoCo resolves these
    # (humanoid foot-vs-other-shin, forearm-vs-waist, ...); enabling adds
    # the pair rows to the contact QP (dynamics._contact_forces_constraint).
    # Off by default: plane-contact-only tasks ship 0 candidate pairs anyway
    # (their contype/conaffinity masks disable self-collision, matching
    # MuJoCo), and enabling is a measured fidelity decision per task.
    enable_pair_contacts: bool = False

    def __init__(self, max_episode_steps: int | None = None) -> None:
        if max_episode_steps is not None:
            self.max_episode_steps = max_episode_steps
        self.model = load_mjcf(self.xml)
        if self.contact_iterations is not None:
            self.model.contact_iterations = int(self.contact_iterations)
        if self.enable_pair_contacts:
            self.model.enable_pair_contacts = True
        # gym MujocoEnv action space == actuator ctrlrange (mujoco_env.py);
        # (-1, 1) for every benchmark asset except Humanoid's (-0.4, 0.4)
        self.action_space = Box(
            low=[a.ctrlrange[0] for a in self.model.actuators],
            high=[a.ctrlrange[1] for a in self.model.actuators],
        )
        obs_dim = int(np.asarray(
            self._obs(dyn.init_state(self.model)[0], jnp.zeros(self.model.nq, jnp.float32))
        ).shape[0])
        self.observation_space = Box(low=[-np.inf] * obs_dim, high=[np.inf] * obs_dim)

    # -- task hooks -----------------------------------------------------
    def _obs(self, q: jnp.ndarray, qd: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def _reward(self, q0, qd0, q1, qd1, action) -> jnp.ndarray:
        raise NotImplementedError

    def _terminated(self, q, qd) -> jnp.ndarray:
        return jnp.bool_(False)

    @property
    def dt(self) -> float:
        return self.model.timestep * self.frame_skip

    # -- Env protocol ---------------------------------------------------
    def reset(self, key: jax.Array):
        k1, k2 = jax.random.split(key)
        s = self.reset_noise_scale
        q0 = jnp.asarray(self.model.qpos0, jnp.float32)
        if self.reset_noise_kind == "uniform":
            q = q0 + jax.random.uniform(k1, (self.model.nq,), minval=-s, maxval=s)
            qd = s * jax.random.normal(k2, (self.model.nq,))
        else:  # both uniform (hopper/walker style)
            q = q0 + jax.random.uniform(k1, (self.model.nq,), minval=-s, maxval=s)
            qd = jax.random.uniform(k2, (self.model.nq,), minval=-s, maxval=s)
        st = PhysState(q.astype(jnp.float32), qd.astype(jnp.float32), jnp.int32(0))
        with jax.default_matmul_precision("float32"):
            obs = self._obs(st.q, st.qd)
        return st, obs

    def step(self, state: PhysState, action: jnp.ndarray, key: jax.Array) -> EnvStep:
        a = jnp.clip(
            action,
            jnp.asarray(self.action_space.low),
            jnp.asarray(self.action_space.high),
        )
        q1, qd1 = dyn.step(self.model, state.q, state.qd, a, frame_skip=self.frame_skip, substeps=self.substeps)
        t = state.t + 1
        new = PhysState(q1, qd1, t)
        # reward/obs hooks run FK/rotation matmuls too — keep them at true
        # fp32 like dynamics.step (TPU's default bf16 multiplicands corrupt
        # the physics-scale quantities; see dynamics.step)
        with jax.default_matmul_precision("float32"):
            rew = self._reward(state.q, state.qd, q1, qd1, a)
            terminated = self._terminated(q1, qd1)
            obs = self._obs(q1, qd1)
        return EnvStep(
            state=new,
            obs=obs,
            reward=jnp.float32(rew),
            terminated=terminated,
            truncated=(t >= self.max_episode_steps) & ~terminated,
            info=Batch(),
        )

    # -- natively-batched step (VectorDeviceEnv prefers this over
    #    vmap(step); same semantics, but the dynamics can run as ONE fused
    #    Pallas kernel instead of ~100 XLA kernel launches per substep) ----
    # 'auto' = fused on a single real TPU chip, XLA otherwise;
    # 'fused' / 'xla' force the respective path.
    physics_mode: str = "auto"
    # class-level kill switch while the fused kernel's on-chip parity is
    # being established per task (scripts/physics_fused_probe.py): tasks are
    # added to this allowlist once the probe shows fp32-roundoff parity AND
    # a speedup on real hardware. 'auto' consults it; 'fused' overrides.
    fused_allowlist: frozenset = frozenset()
    # tasks where the env-last XLA layout (batched.step_b) beats the vmapped
    # env-major step on chip (scripts/physics_fused_probe.py): planar
    # small-contact tasks win (HalfCheetah E=2048: 260k vs 231k steps/s,
    # E=8192: 276k vs 182k); big contact-QP tasks LOSE badly (Ant: 6.7k vs
    # 19.7k — the [nr,nr,E] A-matrix assembly materializes env-last) and
    # stay on the vmapped path.
    envlast_xla_allowlist: frozenset = frozenset({"HalfCheetah"})

    def _use_fused(self) -> bool:
        if self.physics_mode == "fused":
            return True
        if self.physics_mode == "xla":
            return False
        return type(self).__name__ in self.fused_allowlist and _fused_auto_ok()

    def batch_step(self, states: PhysState, actions: jnp.ndarray, keys: jax.Array) -> EnvStep:
        """states [E, nq]-leaves, actions [E, nu] -> batched EnvStep."""
        a = jnp.clip(
            actions,
            jnp.asarray(self.action_space.low),
            jnp.asarray(self.action_space.high),
        )
        if self._use_fused():
            from tianshou_tpu.ops.pallas.physics_fused import fused_step

            q1T, qd1T = fused_step(
                self.model, states.q.T, states.qd.T, a.T,
                frame_skip=self.frame_skip, substeps=self.substeps,
            )
            q1, qd1 = q1T.T, qd1T.T
        elif type(self).__name__ in self.envlast_xla_allowlist:
            # env-last XLA path (same math to fp32 roundoff,
            # tests/test_physics_batched.py; speedups in the allowlist note)
            from tianshou_tpu.env.physics import batched as B

            with jax.default_matmul_precision("float32"):
                q1T, qd1T = B.step_b(
                    self.model, states.q.T, states.qd.T, a.T,
                    frame_skip=self.frame_skip, substeps=self.substeps,
                )
            q1, qd1 = q1T.T, qd1T.T
        else:
            q1, qd1 = jax.vmap(
                lambda q, qd, c: dyn.step(
                    self.model, q, qd, c,
                    frame_skip=self.frame_skip, substeps=self.substeps,
                )
            )(states.q, states.qd, a)
        t = states.t + 1
        new = PhysState(q1, qd1, t)
        with jax.default_matmul_precision("float32"):
            rew = jax.vmap(self._reward)(states.q, states.qd, q1, qd1, a)
            terminated = jax.vmap(self._terminated)(q1, qd1)
            obs = jax.vmap(self._obs)(q1, qd1)
        return EnvStep(
            state=new,
            obs=obs,
            reward=rew.astype(jnp.float32),
            terminated=terminated,
            truncated=(t >= self.max_episode_steps) & ~terminated,
            info=Batch(),
        )
