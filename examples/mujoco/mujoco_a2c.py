"""A2C on the device MuJoCo-class envs (reference examples/mujoco/mujoco_a2c.py:
64x64 nets, GAE 0.95, vf_coef 0.25, obs normalization).

    python examples/mujoco/mujoco_a2c.py --task Walker2d
"""

from _runner import make_train, onpolicy_argparser, run_onpolicy


def make_algo(env):
    from tianshou_tpu.algorithm.modelfree.a2c import A2C
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
    from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, ContinuousCritic

    nu = env.action_space.shape[0]
    return A2C(
        actor=ContinuousActorProbabilistic(hidden_sizes=(64, 64), action_dim=nu, ppo_init=True),
        critic=ContinuousCritic(hidden_sizes=(64, 64), use_action=False, ppo_init=True),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=7e-4, max_grad_norm=0.5),
        gamma=0.99, gae_lambda=0.95, vf_coef=0.25, ent_coef=0.001,
        action_bound_method="clip", deterministic_eval=True,
    )


# reference cadence: one full-batch update per 80 collected steps over 16
# envs (collection_step_num_env_steps=80, reference mujoco_a2c.py:38)
train = make_train(make_algo, rollout_len=5, batch_size=4096, repeat=1, num_envs=16)


if __name__ == "__main__":
    args = onpolicy_argparser(rollout_len=5, batch_size=4096, repeat=1, num_envs=16)
    run_onpolicy(make_algo, **{k.replace("-", "_"): v for k, v in vars(args.parse_args()).items()})
