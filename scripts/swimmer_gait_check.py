"""Swimmer thrust fidelity check, backend-agnostic (run it on the TPU via
the job queue, on CPU directly): rolls three scripted sinusoidal gaits for
1000 steps inside one lax.scan and prints the final x displacement next to
the real-MuJoCo value for the same gait (precomputed on CPU, hard-coded
below so the script needs no mujoco at runtime).

Context: per-step dynamics parity vs real MuJoCo is 0.7% on CPU, and a
host-trained SAC policy transfers to the device env at ~96% of its return
(scripts/policy_transfer.py) — but device-trained SAC capped at ~23 vs the
reference 44.4 before the fp32 matmul pin in dynamics.step. This script is
the cheap A/B: if the TPU displacements match the mujoco column, the
device physics is numerically sound on the accelerator.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

# real-MuJoCo x displacement after 1000 steps (frame_skip=4) of
# a*[sin(f t), sin(f t + p)], computed with mujoco 3.x on CPU
MUJOCO_X = {
    (1.0, 0.25, 2.0): 0.337,
    (0.8, 0.35, 1.5): 0.811,
    (1.0, 0.5, 2.5): 0.161,
}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tianshou_tpu.env import mujoco as dm
    from tianshou_tpu.env.mujoco.locomotion import PhysState

    env = dm.Swimmer()
    T = 1000
    print(f"backend={jax.default_backend()}")
    for (amp, freq, phase), x_mj in MUJOCO_X.items():
        t = np.arange(T)
        acts = np.clip(
            amp * np.stack([np.sin(freq * t), np.sin(freq * t + phase)], 1), -1, 1
        ).astype(np.float32)

        @jax.jit
        def roll(acts):
            st = PhysState(
                jnp.zeros(env.model.nq, jnp.float32),
                jnp.zeros(env.model.nq, jnp.float32),
                jnp.int32(0),
            )

            def body(st, a):
                out = env.step(st, a, jax.random.key(0))
                return out.state, None

            st, _ = jax.lax.scan(body, st, acts)
            return st.q[0]

        x_dev = float(roll(jnp.asarray(acts)))
        flag = "OK" if abs(x_dev - x_mj) < 0.15 * max(abs(x_mj), 0.2) else "MISMATCH"
        print(f"gait amp={amp} freq={freq} phase={phase}: "
              f"mujoco x={x_mj:.3f} device x={x_dev:.3f} [{flag}]")


if __name__ == "__main__":
    main()
