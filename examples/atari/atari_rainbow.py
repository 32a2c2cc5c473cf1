"""Rainbow on Atari pixels — rebuild of the reference's
examples/atari/atari_rainbow.py (noisy dueling C51 + PER + n-step 3)."""

from _runner import n_actions, parse_args, run_offpolicy

from tianshou_tpu.algorithm.modelfree.c51 import RainbowDQN
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.env.core import Discrete
from tianshou_tpu.models.atari import RainbowAtariNet

if __name__ == "__main__":
    args = parse_args(lr=6.25e-5)
    n = n_actions(args)
    algo = RainbowDQN(
        model=RainbowAtariNet(action_dim=n, num_atoms=51),
        action_space=Discrete(n),
        optim=AdamOptimizerFactory(lr=args.lr),
        num_atoms=51, v_min=-10.0, v_max=10.0,
        gamma=0.99, n_step_return_horizon=3, target_update_freq=500,
        eps_training=1.0, eps_inference=0.005,
    )
    run_offpolicy(args, algo)
