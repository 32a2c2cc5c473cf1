"""Discrete SAC on Atari pixels — rebuild of the reference's
examples/atari/atari_sac.py (CNN actor logits + per-action Q critic,
auto-alpha)."""

from _runner import n_actions, parse_args, run_offpolicy

from tianshou_tpu.algorithm.modelfree.discrete_sac import DiscreteSAC
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.env.core import Discrete
from tianshou_tpu.models.atari import DQNet

if __name__ == "__main__":
    args = parse_args(lr=1e-4)
    n = n_actions(args)
    algo = DiscreteSAC(
        actor=DQNet(action_dim=n),    # logits head
        critic=DQNet(action_dim=n),   # per-action Q head
        action_space=Discrete(n),
        policy_optim=AdamOptimizerFactory(lr=args.lr),
        critic_optim=AdamOptimizerFactory(lr=args.lr),
        alpha="auto", gamma=0.99, tau=0.005, n_step_return_horizon=3,
    )
    run_offpolicy(args, algo)
