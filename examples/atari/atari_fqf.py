"""FQF on Atari pixels — rebuild of the reference's examples/atari/atari_fqf.py
(32 learned fractions, entropy coef 10, RMSProp fraction optimizer)."""

from _runner import n_actions, parse_args, run_offpolicy

from tianshou_tpu.algorithm.modelfree.fqf import FQF
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.env.core import Discrete
from tianshou_tpu.models.atari import ImplicitQuantileAtariNet

if __name__ == "__main__":
    args = parse_args(lr=5e-5)
    n = n_actions(args)
    algo = FQF(
        model=ImplicitQuantileAtariNet(action_dim=n),
        action_space=Discrete(n),
        optim=AdamOptimizerFactory(lr=args.lr),
        num_fractions=32, ent_coef=10.0,
        gamma=0.99, n_step_return_horizon=3, target_update_freq=500,
        eps_training=1.0, eps_inference=0.005,
    )
    run_offpolicy(args, algo)
