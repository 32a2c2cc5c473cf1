"""Geom-pair (self-collision) contact validation against REAL MuJoCo.

Small two-body scenes loaded into BOTH engines from the same MJCF string:
a free body dropped onto a static (jointless, world-welded) body. With
integrator=Euler and matched timesteps the trajectories must agree through
impact. Mirrors how the floor-contact solver was validated
(tests/test_physics_contact.py); reference behavior is mjData's own
constraint solve, not any reference-framework code.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

mujoco = pytest.importorskip("mujoco")

from tianshou_tpu.env.physics import dynamics as dyn
from tianshou_tpu.env.physics.mjcf import load_mjcf


def _scene(drop_geom: str, anchor_geom: str, drop_pos: str = "0.08 0 1.2") -> str:
    return f"""
<mujoco>
  <option timestep="0.002" integrator="Euler" gravity="0 0 -9.81"/>
  <worldbody>
    <geom type="plane" size="5 5 0.1" condim="3"/>
    <body name="anchor" pos="0 0 0.6">{anchor_geom}</body>
    <body name="ball" pos="{drop_pos}">
      <joint type="free"/>
      {drop_geom}
    </body>
  </worldbody>
</mujoco>
"""


def _rollout_mujoco(xml: str, steps: int) -> np.ndarray:
    m = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)
    out = []
    for _ in range(steps):
        mujoco.mj_step(m, d)
        out.append(d.qpos[:3].copy())
    return np.stack(out)


def _rollout_device(xml: str, steps: int) -> np.ndarray:
    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(xml)
        path = f.name
    try:
        model = load_mjcf(path)
    finally:
        os.unlink(path)
    model.enable_pair_contacts = True
    model.contact_iterations = 30
    q, qd = dyn.init_state(model)
    ctrl = jnp.zeros(max(len(model.actuators), 1))[:0] if not model.actuators else None
    step = jax.jit(
        lambda q, qd: dyn.step(model, q, qd, jnp.zeros(len(model.actuators)), substeps=1)
    )
    out = []
    for _ in range(steps):
        q, qd = step(q, qd)
        out.append(np.asarray(q[:3]))
    return np.stack(out)


def _compare(xml: str, steps: int = 300, tol: float = 0.03):
    mj = _rollout_mujoco(xml, steps)
    dv = _rollout_device(xml, steps)
    err = np.abs(mj - dv).max(axis=1)
    # positions agree through free fall, impact, and settling
    assert err.max() < tol, f"max |pos err| {err.max():.4f} over {steps} steps"
    return mj, dv


def test_sphere_on_static_sphere_frictionless():
    """condim-1 sphere dropped off-center onto a welded sphere: the pair
    row must deflect it exactly as MuJoCo's frictionless contact does."""
    xml = _scene(
        '<geom type="sphere" size="0.2" condim="1" mass="1"/>',
        '<geom type="sphere" size="0.3" condim="1" mass="1"/>',
    )
    mj, dv = _compare(xml, steps=250)
    # the impact really happened and deflected the ball sideways in BOTH
    assert abs(mj[-1][0]) > 0.15 and abs(dv[-1][0]) > 0.15


def test_capsule_cross_on_static_capsule():
    """Falling capsule crossed 90 degrees over a static capsule: contact at
    the segment-segment closest points (mid-capsule, not an endpoint)."""
    xml = _scene(
        '<geom type="capsule" fromto="-0.4 0 0 0.4 0 0" size="0.1" condim="1" mass="1"/>',
        '<geom type="capsule" fromto="0 -0.4 0 0 0.4 0" size="0.12" condim="1" mass="1"/>',
        drop_pos="0.05 0 1.0",
    )
    _compare(xml, steps=250)


def test_sphere_pair_with_friction_condim3():
    """condim-3 pair: the 4-facet pyramid rows must brake tangential slip
    the way MuJoCo's pyramidal cone does (default friction 1)."""
    xml = _scene(
        '<geom type="sphere" size="0.2" condim="3" mass="1"/>',
        '<geom type="sphere" size="0.3" condim="3" mass="1"/>',
    )
    _compare(xml, steps=250, tol=0.04)


def test_pair_tables_match_mujoco_filtering():
    """Humanoid candidate pairs follow MuJoCo's weld-aware filter: no
    same-weld (foot vs own shin) or parent-weld pairs, cross-limb kept."""
    m = load_mjcf("humanoid.xml")
    names = m.body_names
    pairs = {(names[a], names[b]) for a, b in zip(m.pair_body1, m.pair_body2)}
    sym = pairs | {(b, a) for a, b in pairs}
    assert ("right_foot", "left_shin") in sym
    assert ("right_foot", "right_shin") not in sym       # same weld
    assert ("right_thigh", "right_shin") not in sym      # parent
    assert ("right_foot", "left_foot") in sym
    assert ("lwaist", "right_lower_arm") in sym
    assert (m.pair_condim == 1).all()                    # humanoid geoms condim=1
    # masked-off self-collision stays off (MuJoCo contype/conaffinity)
    for task in ("ant.xml", "half_cheetah.xml", "walker2d.xml"):
        assert len(load_mjcf(task).pair_body1) == 0


def test_humanoid_steps_stably_with_pairs():
    """Full humanoid with 109 pair rows: steps are finite and the standing
    pose does not get launched by phantom contacts."""
    from tianshou_tpu.env.mujoco import Humanoid

    env = Humanoid()
    assert env.model.enable_pair_contacts and len(env.model.pair_body1) > 50
    st, obs = env.reset(jax.random.key(0))
    step = jax.jit(lambda s, a, k: env.step(s, a, k))
    s = st
    for i in range(10):
        out = step(s, jnp.zeros(len(env.model.actuators)), jax.random.key(i))
        s = out.state
    assert bool(jnp.isfinite(s.q).all()) and bool(jnp.isfinite(s.qd).all())
    # torso stays near standing height under zero control for 10 frames
    assert 1.0 < float(s.q[2]) < 1.6
