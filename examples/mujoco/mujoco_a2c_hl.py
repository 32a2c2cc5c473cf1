"""A2C on device MuJoCo-class envs via the high-level API — rebuild of the
reference's examples/mujoco/mujoco_a2c_hl.py (A2CParams)."""

from _hl import onpolicy_training_config, parse_args, run

from tianshou_tpu.highlevel.experiment import A2CExperimentBuilder
from tianshou_tpu.highlevel.params import A2CParams

if __name__ == "__main__":
    args = parse_args(num_envs=64)
    run(
        args,
        A2CExperimentBuilder,
        onpolicy_training_config(args, collection_step_num_env_steps=80,
                                 update_step_num_repetitions=1),
        params=A2CParams(lr=7e-4, gae_lambda=0.95, vf_coef=0.5, ent_coef=0.01),
    )
