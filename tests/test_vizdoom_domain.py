"""ViZDoom example domain (reference examples/vizdoom/): button-combo
parity, the synthetic stand-in's mechanics and solvability, and the pixel
pipeline wiring through the device collector."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples" / "vizdoom"))

from env import (  # noqa: E402
    RES,
    STACK,
    SyntheticDoom,
    battle_button_comb,
    make_vizdoom_env,
    normal_button_comb,
)


def test_button_combos_match_reference_counts():
    # reference env.py:20-42: 6 normal combos, 108 battle combos
    normal = normal_button_comb()
    battle = battle_button_comb()
    assert len(normal) == 6 and all(len(a) == 3 for a in normal)
    assert len(battle) == 108 and all(len(a) == 8 for a in battle)
    assert len({tuple(a) for a in battle}) == 108  # all distinct


def test_synthetic_doom_mechanics():
    env = SyntheticDoom()
    key = jax.random.key(0)
    s, obs = env.reset(key)
    assert obs.shape == RES and obs.dtype == jnp.uint8

    # scripted optimal play: turn toward the medikit, then walk forward
    total = 0.0
    for i in range(120):
        rel = (int(s.target) - int(s.heading)) % env.n_headings
        signed = rel - env.n_headings if rel > env.n_headings // 2 else rel
        if abs(signed) <= 2:
            a = 3  # forward, no turn
        elif signed > 0:
            a = 1  # turn right
        else:
            a = 2  # turn left
        step = env.step(s, jnp.int32(a), jax.random.key(i))
        s = step.state
        total += float(step.reward)
    assert total >= 2.0, f"scripted play collected {total} medikits in 120 steps"


def test_synthetic_doom_through_device_collector():
    from tianshou_tpu.algorithm.modelfree.dqn import DQN
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
    from tianshou_tpu.data.batch import Batch
    from tianshou_tpu.data.buffer.base import VectorReplayBuffer
    from tianshou_tpu.data.collector import DeviceCollector
    from tianshou_tpu.models.atari import DQNet

    env, train_envs, _ = make_vizdoom_env(num_training_envs=4, num_test_envs=2)
    algo = DQN(
        model=DQNet(action_dim=env.action_space.n),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=1e-4),
        gamma=0.99, n_step_return_horizon=3, target_update_freq=100, eps_training=1.0,
    )
    key = jax.random.key(0)
    key, k = jax.random.split(key)
    ts = algo.init(k, jnp.zeros((STACK, *RES), jnp.uint8))
    buffer = VectorReplayBuffer(total_size=4 * 256, buffer_num=4,
                                stack_num=STACK, save_only_last_obs=True)
    buf_state = buffer.init(Batch(
        obs=jnp.zeros(RES, jnp.uint8), act=jnp.int32(0), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False),
        obs_next=jnp.zeros(RES, jnp.uint8),
    ))
    coll = DeviceCollector(train_envs, algo, buffer)
    cstate = coll.reset(key)
    key, kc, ku = jax.random.split(key, 3)
    cstate, buf_state, stats = coll.collect(ts, cstate, buf_state, kc, n_steps=64)
    assert int(buffer.num_stored(buf_state)) >= 64
    # one DQN update through the frame-stacked pixel sample path
    ts2, buf_state, s = algo.update(ts, buffer, buf_state, ku, 32)
    assert np.isfinite(float(s.loss))
