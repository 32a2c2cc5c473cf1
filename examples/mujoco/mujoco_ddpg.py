"""DDPG on the device MuJoCo-class envs (reference examples/mujoco/mujoco_ddpg.py:
256x256 nets, lr 1e-3, gaussian exploration sigma 0.1, 25k random prefill).

    python examples/mujoco/mujoco_ddpg.py --task HalfCheetah
"""

from _runner import offpolicy_argparser, run_offpolicy


def make_algo(env):
    from tianshou_tpu.algorithm.modelfree.ddpg import DDPG
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
    from tianshou_tpu.exploration.noise import GaussianNoise
    from tianshou_tpu.models.continuous import ContinuousActorDeterministic, ContinuousCritic

    nu = env.action_space.shape[0]
    return DDPG(
        actor=ContinuousActorDeterministic(hidden_sizes=(256, 256), action_dim=nu),
        critic=ContinuousCritic(hidden_sizes=(256, 256)),
        action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=1e-3),
        critic_optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.99, tau=0.005, exploration_noise=GaussianNoise(sigma=0.1),
    )


if __name__ == "__main__":
    args = offpolicy_argparser(start_steps=25_000)
    run_offpolicy(make_algo, **{k.replace("-", "_"): v for k, v in vars(args.parse_args()).items()})
