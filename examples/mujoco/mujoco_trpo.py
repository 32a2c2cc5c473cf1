"""TRPO on the device MuJoCo-class envs (reference examples/mujoco/mujoco_trpo.py:
KL 0.01 line search, 64x64 nets).

    python examples/mujoco/mujoco_trpo.py --task HalfCheetah
"""

from _runner import make_train, onpolicy_argparser, run_onpolicy


def make_algo(env):
    from tianshou_tpu.algorithm.modelfree.trpo import TRPO
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
    from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, ContinuousCritic

    nu = env.action_space.shape[0]
    return TRPO(
        actor=ContinuousActorProbabilistic(hidden_sizes=(64, 64), action_dim=nu, ppo_init=True),
        critic=ContinuousCritic(hidden_sizes=(64, 64), use_action=False, ppo_init=True),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.99, gae_lambda=0.95,
        max_kl=0.01, backtrack_coeff=0.8, max_backtracks=10, optim_critic_iters=20,
        action_bound_method="clip", deterministic_eval=True,
    )


# reference cadence: ONE trust-region step per 1024 collected steps over 16
# envs (collection_step_num_env_steps=1024, reference mujoco_trpo.py:40)
train = make_train(make_algo, rollout_len=64, batch_size=16384, repeat=1, num_envs=16)


if __name__ == "__main__":
    args = onpolicy_argparser(rollout_len=64, batch_size=16384, repeat=1, num_envs=16)
    run_onpolicy(make_algo, **{k.replace("-", "_"): v for k, v in vars(args.parse_args()).items()})
