"""SAC on device MuJoCo-class envs via the declarative high-level API —
rebuild of the reference's examples/mujoco/mujoco_sac_hl.py (SACParams:
256x256 nets, lr 1e-3, alpha 0.2, tau 0.005, 10k random prefill)."""

from _hl import offpolicy_training_config, parse_args, run

from tianshou_tpu.highlevel.experiment import SACExperimentBuilder
from tianshou_tpu.highlevel.module import ActorFactoryDefault, CriticFactoryDefault
from tianshou_tpu.highlevel.params import SACParams

if __name__ == "__main__":
    args = parse_args()
    run(
        args,
        SACExperimentBuilder,
        offpolicy_training_config(args, batch_size=256,
                                  update_step_num_gradient_steps_per_sample=1.0),
        params=SACParams(actor_lr=1e-3, critic_lr=1e-3, alpha=0.2, tau=0.005),
        with_actor_factory=ActorFactoryDefault(hidden_sizes=(256, 256), conditioned_sigma=True),
        with_critic_factory=CriticFactoryDefault(hidden_sizes=(256, 256), use_action=True),
    )
