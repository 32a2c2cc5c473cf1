"""PPO on device MuJoCo-class envs via the high-level API — rebuild of the
reference's examples/mujoco/mujoco_ppo_hl.py (PPOParams: clip 0.2, GAE 0.95,
advantage normalization)."""

from _hl import onpolicy_training_config, parse_args, run

from tianshou_tpu.highlevel.experiment import PPOExperimentBuilder
from tianshou_tpu.highlevel.params import PPOParams

if __name__ == "__main__":
    args = parse_args(num_envs=64)
    run(
        args,
        PPOExperimentBuilder,
        onpolicy_training_config(args),
        params=PPOParams(lr=3e-4, eps_clip=0.2, gae_lambda=0.95,
                         advantage_normalization=True, ent_coef=0.0),
    )
