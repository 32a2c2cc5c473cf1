"""PPO on device CartPole — high-level Experiment API (analogue of the
reference's examples/*_hl.py scripts)."""

import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[2]))  # run without install


from tianshou_tpu.env.classic.cartpole import CartPole
from tianshou_tpu.highlevel.config import ExperimentConfig, OnPolicyTrainingConfig
from tianshou_tpu.highlevel.experiment import PPOExperimentBuilder

if __name__ == "__main__":
    result = (
        PPOExperimentBuilder(
            lambda: CartPole(),
            ExperimentConfig(seed=0, watch=True),
            OnPolicyTrainingConfig(
                max_epochs=10, epoch_num_steps=10000,
                num_train_envs=16, num_test_envs=10,
                stop_threshold=195,
            ),
        )
        .build()
        .run("ppo_cartpole")
    )
    print(f"best_reward={result.best_reward:.1f}")
