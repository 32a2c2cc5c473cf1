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
        action_bound_method="clip", deterministic_eval=True,
    )


train = make_train(make_algo, rollout_len=256, batch_size=65536, repeat=1)


if __name__ == "__main__":
    args = onpolicy_argparser(rollout_len=256, batch_size=65536, repeat=1)
    run_onpolicy(make_algo, **{k.replace("-", "_"): v for k, v in vars(args.parse_args()).items()})
