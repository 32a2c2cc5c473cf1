"""REDQ on device MuJoCo-class envs via the high-level API — rebuild of the
reference's examples/mujoco/mujoco_redq_hl.py (REDQParams: ensemble 10,
subset 2, actor delay 20)."""

from _hl import offpolicy_training_config, parse_args, run

from tianshou_tpu.highlevel.experiment import REDQExperimentBuilder
from tianshou_tpu.highlevel.module import ActorFactoryDefault, CriticFactoryDefault
from tianshou_tpu.highlevel.params import REDQParams

if __name__ == "__main__":
    args = parse_args()
    run(
        args,
        REDQExperimentBuilder,
        offpolicy_training_config(args, batch_size=256,
                                  update_step_num_gradient_steps_per_sample=1.0),
        params=REDQParams(actor_lr=1e-3, critic_lr=1e-3, ensemble_size=10,
                          subset_size=2, actor_delay=20),
        with_actor_factory=ActorFactoryDefault(hidden_sizes=(256, 256), conditioned_sigma=True),
        with_critic_factory=CriticFactoryDefault(hidden_sizes=(256, 256), use_action=True),
    )
