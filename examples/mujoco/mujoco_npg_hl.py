"""NPG on device MuJoCo-class envs via the high-level API — rebuild of the
reference's examples/mujoco/mujoco_npg_hl.py (NPGParams)."""

from _hl import onpolicy_training_config, parse_args, run

from tianshou_tpu.highlevel.experiment import NPGExperimentBuilder
from tianshou_tpu.highlevel.params import NPGParams

if __name__ == "__main__":
    args = parse_args(num_envs=64)
    run(
        args,
        NPGExperimentBuilder,
        onpolicy_training_config(args, update_step_num_repetitions=1),
        params=NPGParams(lr=1e-3, actor_step_size=0.1, optim_critic_iters=20),
    )
