"""REDQ on the device MuJoCo-class envs (reference examples/mujoco/mujoco_redq.py:
ensemble 10, subset 2, UTD 20, auto alpha).

    python examples/mujoco/mujoco_redq.py --task Ant
"""

from _runner import offpolicy_argparser, run_offpolicy


def make_algo(env):
    from tianshou_tpu.algorithm.modelfree.redq import REDQ
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
    from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, EnsembleCritic

    nu = env.action_space.shape[0]
    return REDQ(
        actor=ContinuousActorProbabilistic(hidden_sizes=(256, 256), action_dim=nu, conditioned_sigma=True),
        critic=EnsembleCritic(hidden_sizes=(256, 256), ensemble_size=10),
        action_space=env.action_space,
        policy_optim=AdamOptimizerFactory(lr=1e-3),
        critic_optim=AdamOptimizerFactory(lr=1e-3),
        gamma=0.99, tau=0.005,
        ensemble_size=10, subset_size=2, alpha="auto", actor_delay=20,
    )


if __name__ == "__main__":
    args = offpolicy_argparser(start_steps=10_000)
    run_offpolicy(make_algo, **{k.replace("-", "_"): v for k, v in vars(args.parse_args()).items()})
