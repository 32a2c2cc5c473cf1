"""DDPG on device MuJoCo-class envs via the high-level API — rebuild of the
reference's examples/mujoco/mujoco_ddpg_hl.py (DDPGParams, sigma 0.1)."""

from _hl import offpolicy_training_config, parse_args, run

from tianshou_tpu.highlevel.experiment import DDPGExperimentBuilder
from tianshou_tpu.highlevel.module import ActorFactoryDefault, CriticFactoryDefault
from tianshou_tpu.highlevel.params import DDPGParams

if __name__ == "__main__":
    args = parse_args(start_steps=25_000)
    run(
        args,
        DDPGExperimentBuilder,
        offpolicy_training_config(args, batch_size=256,
                                  update_step_num_gradient_steps_per_sample=1.0),
        params=DDPGParams(actor_lr=1e-3, critic_lr=1e-3, exploration_noise=0.1),
        with_actor_factory=ActorFactoryDefault(hidden_sizes=(256, 256), continuous_deterministic=True),
        with_critic_factory=CriticFactoryDefault(hidden_sizes=(256, 256), use_action=True),
    )
