"""REINFORCE on the device MuJoCo-class envs (reference
examples/mujoco/mujoco_reinforce.py: 64x64 nets, lr 1e-3 w/ linear decay,
discounted MC returns with standardization).

    python examples/mujoco/mujoco_reinforce.py --task Hopper
"""

from _runner import make_train, onpolicy_argparser, run_onpolicy


def make_algo(env):
    from tianshou_tpu.algorithm.modelfree.reinforce import Reinforce
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
    from tianshou_tpu.models.continuous import ContinuousActorProbabilistic

    nu = env.action_space.shape[0]
    return Reinforce(
        actor=ContinuousActorProbabilistic(hidden_sizes=(64, 64), action_dim=nu, ppo_init=True),
        action_space=env.action_space,
        optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.99, return_standardization=True,
        action_bound_method="tanh", deterministic_eval=True,
    )


# reference protocol: ONE full-batch gradient step per 2048 collected steps
# (collection_step_num_env_steps=2048, update_step_num_repetitions=1,
# reference mujoco_reinforce.py:37-38) — 16 envs x 128-step rollouts keeps
# both the update cadence AND long MC-return segments (REINFORCE has no
# critic, so the rollout cut zero-bootstraps; the old 256-env x 256-step
# config did 100x fewer updates and never learned)
train = make_train(make_algo, num_envs=16, rollout_len=128, batch_size=2048, repeat=1)


if __name__ == "__main__":
    args = onpolicy_argparser(num_envs=16, rollout_len=128, batch_size=2048, repeat=1)
    run_onpolicy(make_algo, **{k.replace("-", "_"): v for k, v in vars(args.parse_args()).items()})
