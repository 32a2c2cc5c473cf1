"""REINFORCE on device MuJoCo-class envs via the high-level API — rebuild of
the reference's examples/mujoco/mujoco_reinforce_hl.py (ReinforceParams with
return standardization)."""

from _hl import onpolicy_training_config, parse_args, run

from tianshou_tpu.highlevel.experiment import ReinforceExperimentBuilder
from tianshou_tpu.highlevel.params import ReinforceParams

if __name__ == "__main__":
    args = parse_args(num_envs=64)
    run(
        args,
        ReinforceExperimentBuilder,
        onpolicy_training_config(args, update_step_num_repetitions=1),
        params=ReinforceParams(lr=1e-3, return_standardization=True),
    )
