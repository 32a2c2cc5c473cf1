"""PPO on Atari pixels — rebuild of the reference's examples/atari/atari_ppo.py
(shared-trunk-style CNN actor + value critic, clip 0.1, GAE 0.95)."""

from _runner import PixelCritic, n_actions, parse_args, run_onpolicy

from tianshou_tpu.algorithm.modelfree.ppo import PPO
from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.env.core import Discrete
from tianshou_tpu.models.atari import DQNet

if __name__ == "__main__":
    args = parse_args(lr=2.5e-4, num_envs=16, batch_size=256)
    n = n_actions(args)
    algo = PPO(
        actor=DQNet(action_dim=n),   # NatureCNN -> logits
        critic=PixelCritic(),
        action_space=Discrete(n),
        optim=AdamOptimizerFactory(lr=args.lr),
        eps_clip=0.1, gae_lambda=0.95, ent_coef=0.01, vf_coef=0.5,
        advantage_normalization=True,
    )
    run_onpolicy(args, algo)
