"""Gated learning tests on the device MuJoCo-class envs: short training
runs asserting clear learning progress (full reference-table protocol runs
are 1M steps on TPU — see examples/mujoco and BENCH records; these tests
keep the training path honest on CPU CI budgets).

Reference analogue: test/continuous thresholds (e.g. test_sac_with_il.py:86
trains Pendulum to -250); here the envs are the real benchmark tasks.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples" / "mujoco"))


def test_ppo_halfcheetah_learns():
    from mujoco_ppo import train

    r = train(
        task="HalfCheetah", epochs=2, epoch_num_steps=32_000, num_envs=64,
        rollout_len=64, batch_size=1024, test_episodes=4, verbose=False,
    )
    # random policy scores ~-300; PPO reaches > -40 within ~65k steps
    assert r.best_reward > -60, r.best_reward


def test_sac_hopper_learns():
    from mujoco_sac import train

    r = train(
        task="Hopper", epochs=3, epoch_num_steps=6000, num_envs=16,
        start_steps=2000, test_episodes=4, buffer_size=100_000, verbose=False,
    )
    # random policy scores ~20; SAC reaches >150 within ~20k steps
    assert r.best_reward > 120, r.best_reward
