"""TD3 on device MuJoCo-class envs via the high-level API — rebuild of the
reference's examples/mujoco/mujoco_td3_hl.py (TD3Params: twin critics,
policy smoothing 0.2 clipped at 0.5, actor delay 2, sigma 0.1)."""

from _hl import offpolicy_training_config, parse_args, run

from tianshou_tpu.highlevel.experiment import TD3ExperimentBuilder
from tianshou_tpu.highlevel.module import ActorFactoryDefault, CriticFactoryDefault
from tianshou_tpu.highlevel.params import TD3Params

if __name__ == "__main__":
    args = parse_args(start_steps=25_000)
    run(
        args,
        TD3ExperimentBuilder,
        offpolicy_training_config(args, batch_size=256,
                                  update_step_num_gradient_steps_per_sample=1.0),
        params=TD3Params(actor_lr=3e-4, critic_lr=3e-4, exploration_noise=0.1,
                         policy_noise=0.2, noise_clip=0.5, update_actor_freq=2),
        with_actor_factory=ActorFactoryDefault(hidden_sizes=(256, 256), continuous_deterministic=True),
        with_critic_factory=CriticFactoryDefault(hidden_sizes=(256, 256), use_action=True),
    )
