"""TRPO on device MuJoCo-class envs via the high-level API — rebuild of the
reference's examples/mujoco/mujoco_trpo_hl.py (TRPOParams)."""

from _hl import onpolicy_training_config, parse_args, run

from tianshou_tpu.highlevel.experiment import TRPOExperimentBuilder
from tianshou_tpu.highlevel.params import TRPOParams

if __name__ == "__main__":
    args = parse_args(num_envs=64)
    run(
        args,
        TRPOExperimentBuilder,
        onpolicy_training_config(args, update_step_num_repetitions=1),
        params=TRPOParams(lr=1e-3, max_kl=0.01, backtrack_coeff=0.8, max_backtracks=10),
    )
