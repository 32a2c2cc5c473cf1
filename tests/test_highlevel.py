"""High-level Experiment/Builder smoke + convergence tests (reference
test/highlevel/test_experiment_builder.py builds every builder and runs a
couple of epochs)."""

import os

import pytest

from tianshou_tpu.env.classic.cartpole import CartPole
from tianshou_tpu.env.classic.pendulum import Pendulum
from tianshou_tpu.highlevel.config import (
    ExperimentConfig,
    OffPolicyTrainingConfig,
    OnPolicyTrainingConfig,
)
from tianshou_tpu.highlevel.experiment import (
    A2CExperimentBuilder,
    C51ExperimentBuilder,
    DDPGExperimentBuilder,
    DiscreteSACExperimentBuilder,
    DQNExperimentBuilder,
    IQNExperimentBuilder,
    NPGExperimentBuilder,
    PPOExperimentBuilder,
    REDQExperimentBuilder,
    ReinforceExperimentBuilder,
    SACExperimentBuilder,
    TD3ExperimentBuilder,
    TRPOExperimentBuilder,
    Experiment,
)


def test_dqn_builder_trains_to_threshold(tmp_path):
    result = (
        DQNExperimentBuilder(
            lambda: CartPole(),
            ExperimentConfig(seed=0, persistence_base_dir=str(tmp_path)),
            OffPolicyTrainingConfig(
                max_epochs=12, epoch_num_steps=5000, buffer_size=20000,
                num_train_envs=10, num_test_envs=10, start_timesteps=1000,
                stop_threshold=195,
            ),
        )
        .with_dqn_params(gamma=0.97, n_step_return_horizon=3, target_update_freq=320, eps_training=0.3)
        .build()
        .run("dqn_cartpole")
    )
    assert result.best_reward >= 195
    # persistence side effects
    assert os.path.exists(tmp_path / "dqn_cartpole" / "experiment.pkl")
    assert os.path.isdir(tmp_path / "dqn_cartpole" / "best")
    exp2 = Experiment.from_directory(str(tmp_path / "dqn_cartpole"))
    assert isinstance(exp2, Experiment)  # runnable, not a metadata dict


def test_ppo_builder_trains(tmp_path):
    result = (
        PPOExperimentBuilder(
            lambda: CartPole(),
            ExperimentConfig(seed=0, persistence_base_dir=str(tmp_path), persistence_enabled=False),
            OnPolicyTrainingConfig(max_epochs=10, epoch_num_steps=10000, num_train_envs=16, stop_threshold=195),
        )
        .build()
        .run("ppo_cartpole")
    )
    assert result.best_reward >= 195


@pytest.mark.parametrize(
    "builder_cls,training",
    [
        (A2CExperimentBuilder, OnPolicyTrainingConfig(max_epochs=1, epoch_num_steps=2048)),
        (ReinforceExperimentBuilder, OnPolicyTrainingConfig(max_epochs=1, epoch_num_steps=2048)),
    ],
)
def test_onpolicy_builders_smoke(builder_cls, training, tmp_path):
    cfg = ExperimentConfig(seed=0, persistence_base_dir=str(tmp_path), persistence_enabled=False)
    result = builder_cls(lambda: CartPole(), cfg, training).build().run("smoke")
    assert result.env_step > 0


@pytest.mark.parametrize("builder_cls", [SACExperimentBuilder, TD3ExperimentBuilder, DDPGExperimentBuilder, REDQExperimentBuilder])
def test_continuous_builders_smoke(builder_cls, tmp_path):
    cfg = ExperimentConfig(seed=0, persistence_base_dir=str(tmp_path), persistence_enabled=False)
    training = OffPolicyTrainingConfig(
        max_epochs=1, epoch_num_steps=600, buffer_size=5000, num_train_envs=4,
        num_test_envs=4, test_step_num_episodes=2, start_timesteps=200,
        start_timesteps_random=False, collection_step_num_env_steps=25,
    )
    result = builder_cls(lambda: Pendulum(), cfg, training).build().run("smoke")
    assert result.env_step > 0


@pytest.mark.parametrize(
    "builder_cls",
    [C51ExperimentBuilder, IQNExperimentBuilder, DiscreteSACExperimentBuilder],
)
def test_discrete_builders_smoke(builder_cls, tmp_path):
    cfg = ExperimentConfig(seed=0, persistence_base_dir=str(tmp_path), persistence_enabled=False)
    training = OffPolicyTrainingConfig(
        max_epochs=1, epoch_num_steps=600, buffer_size=5000, num_train_envs=4,
        num_test_envs=4, test_step_num_episodes=2, start_timesteps=200,
        collection_step_num_env_steps=25,
    )
    result = builder_cls(lambda: CartPole(), cfg, training).build().run("smoke")
    assert result.env_step > 0


@pytest.mark.parametrize("builder_cls", [NPGExperimentBuilder, TRPOExperimentBuilder])
def test_trust_region_builders_smoke(builder_cls, tmp_path):
    cfg = ExperimentConfig(seed=0, persistence_base_dir=str(tmp_path), persistence_enabled=False)
    training = OnPolicyTrainingConfig(
        max_epochs=1, epoch_num_steps=2048, num_train_envs=8, num_test_envs=4,
        test_step_num_episodes=2, batch_size=1024, update_step_num_repetitions=1,
    )
    result = builder_cls(lambda: CartPole(), cfg, training).build().run("smoke")
    assert result.env_step > 0


def test_offline_builders_smoke(pendulum_data, tmp_path):
    """Offline builders train from a provided dataset (reference offline
    highlevel variants)."""
    from tianshou_tpu.highlevel.config import OfflineTrainingConfig
    from tianshou_tpu.highlevel.experiment import (
        BCQExperimentBuilder,
        CQLExperimentBuilder,
        TD3BCExperimentBuilder,
    )

    env, buffer, buf_state = pendulum_data
    for builder_cls in (TD3BCExperimentBuilder, CQLExperimentBuilder, BCQExperimentBuilder):
        cfg = ExperimentConfig(seed=0, persistence_base_dir=str(tmp_path), persistence_enabled=False)
        training = OfflineTrainingConfig(
            max_epochs=1, update_step_num_gradient_steps_per_epoch=30,
            batch_size=64, num_test_envs=4, test_step_num_episodes=2,
        )
        res = (
            builder_cls(lambda: env, cfg, training)
            .with_dataset(buffer, buf_state)
            .build()
            .run(f"offline_{builder_cls.__name__}")
        )
        assert res.gradient_step == 30


def test_gym_host_path_builder():
    """High-level DQN over a registered Gymnasium task through the host
    path (reference EnvFactoryRegistered + VectorEnvType)."""
    from tianshou_tpu.highlevel.env import GymEnvFactory, VectorEnvType

    factory = GymEnvFactory("CartPole-v1", venv_type=VectorEnvType.DUMMY)
    result = (
        DQNExperimentBuilder(
            factory,
            ExperimentConfig(seed=0, persistence_enabled=False),
            OffPolicyTrainingConfig(
                max_epochs=12, epoch_num_steps=5000, buffer_size=20000,
                num_train_envs=10, num_test_envs=10, start_timesteps=1000,
                stop_threshold=195,
            ),
        )
        .with_dqn_params(gamma=0.97, n_step_return_horizon=3, target_update_freq=320, eps_training=0.3)
        .build()
        .run("dqn_gym_cartpole")
    )
    assert result.best_reward >= 195


# ---------------------------------------------------------------------------
# round 2: typed Params + transformer chains, new builders, host on-policy,
# resumable from_directory, ICM wrapping, PER via buffer factory
# ---------------------------------------------------------------------------


def _small_offp():
    return OffPolicyTrainingConfig(
        max_epochs=1, epoch_num_steps=400, buffer_size=2000, num_train_envs=4,
        num_test_envs=4, start_timesteps=100, test_step_num_episodes=2, batch_size=32,
    )


def test_typed_params_builders_smoke():
    """Every typed Params dataclass resolves through its transformer chain
    (reference algorithm_params.py:19-830) and builds a training run."""
    from tianshou_tpu.highlevel.experiment import (
        FQFExperimentBuilder,
        QRDQNExperimentBuilder,
        RainbowExperimentBuilder,
    )
    from tianshou_tpu.highlevel.params import (
        DQNParams,
        FQFParams,
        LRSchedulerFactoryLinear,
        PPOParams,
        QRDQNParams,
        RainbowParams,
    )

    cases = [
        (DQNExperimentBuilder, DQNParams(lr=1e-3, eps_training=0.3, target_update_freq=100, n_step_return_horizon=3)),
        (QRDQNExperimentBuilder, QRDQNParams(num_quantiles=32, eps_training=0.3)),
        (FQFExperimentBuilder, FQFParams(num_fractions=16, eps_training=0.3)),
        (RainbowExperimentBuilder, RainbowParams(num_atoms=21, v_min=0, v_max=200, eps_training=0.3)),
    ]
    for Builder, P in cases:
        r = (
            Builder(lambda: CartPole(), ExperimentConfig(seed=0, persistence_enabled=False), _small_offp())
            .with_dqn_params(P)
            .build()
            .run("typed")
        )
        assert r.env_step > 0, Builder.__name__

    otc = OnPolicyTrainingConfig(
        max_epochs=1, epoch_num_steps=256, num_train_envs=4, num_test_envs=4,
        test_step_num_episodes=2, batch_size=64, collection_step_num_env_steps=32,
    )
    r = (
        PPOExperimentBuilder(lambda: CartPole(), ExperimentConfig(seed=0, persistence_enabled=False), otc)
        .with_params(PPOParams(lr=3e-4, lr_scheduler=LRSchedulerFactoryLinear(), max_grad_norm=0.5))
        .build()
        .run("typed_ppo")
    )
    assert r.env_step > 0


def test_host_onpolicy_builder():
    """Reference experiment.py host trainers cover on-policy too."""
    from tianshou_tpu.highlevel.env import GymEnvFactory

    otc = OnPolicyTrainingConfig(
        max_epochs=1, epoch_num_steps=256, num_train_envs=4, num_test_envs=2,
        test_step_num_episodes=2, batch_size=64, collection_step_num_env_steps=32,
    )
    r = PPOExperimentBuilder(
        GymEnvFactory("CartPole-v1"), ExperimentConfig(seed=0, persistence_enabled=False), otc
    ).build().run("host_onpolicy")
    assert r.env_step >= 256


def test_from_directory_returns_runnable_experiment(tmp_path):
    """from_directory rebuilds the whole experiment (reference
    experiment.py:243-249), not a metadata dict."""
    from tianshou_tpu.highlevel.experiment import Experiment

    cfg = ExperimentConfig(seed=0, persistence_enabled=True, persistence_base_dir=str(tmp_path))
    exp = (
        DQNExperimentBuilder(lambda: CartPole(), cfg, _small_offp())
        .with_dqn_params(eps_training=0.3)
        .build()
    )
    exp.run("run1")
    exp2 = Experiment.from_directory(str(tmp_path / "run1"))
    assert isinstance(exp2, Experiment)
    r2 = exp2.run("run2")
    assert r2.env_step > 0


def test_icm_and_per_through_builder():
    from tianshou_tpu.data.buffer.prio import PrioritizedVectorReplayBuffer

    r = (
        DQNExperimentBuilder(lambda: CartPole(), ExperimentConfig(seed=0, persistence_enabled=False), _small_offp())
        .with_dqn_params(eps_training=0.3)
        .with_icm(feature_dim=16)
        .build()
        .run("icm")
    )
    assert r.env_step > 0
    r = (
        DQNExperimentBuilder(lambda: CartPole(), ExperimentConfig(seed=0, persistence_enabled=False), _small_offp())
        .with_dqn_params(eps_training=0.3)
        .with_buffer_factory(lambda n: PrioritizedVectorReplayBuffer(2000, n, alpha=0.6, beta=0.4))
        .build()
        .run("per")
    )
    assert r.env_step > 0


def test_bdqn_and_gail_builders():
    import numpy as np

    from tianshou_tpu.env.classic.pendulum import Pendulum
    from tianshou_tpu.env.wrappers import ContinuousToDiscrete
    from tianshou_tpu.highlevel.experiment import BDQNExperimentBuilder, GAILExperimentBuilder

    r = (
        BDQNExperimentBuilder(
            lambda: ContinuousToDiscrete(Pendulum(), 5),
            ExperimentConfig(seed=0, persistence_enabled=False),
            _small_offp(),
        )
        .with_dqn_params(eps_training=0.3, target_update_freq=100)
        .build()
        .run("bdqn")
    )
    assert r.env_step > 0

    otc = OnPolicyTrainingConfig(
        max_epochs=1, epoch_num_steps=256, num_train_envs=4, num_test_envs=4,
        test_step_num_episodes=2, batch_size=64, collection_step_num_env_steps=32,
    )
    expert_obs = np.random.randn(256, 3).astype(np.float32)
    expert_act = np.random.uniform(-1, 1, (256, 1)).astype(np.float32)
    r = (
        GAILExperimentBuilder(lambda: Pendulum(), ExperimentConfig(seed=0, persistence_enabled=False), otc)
        .with_expert_data(expert_obs, expert_act)
        .build()
        .run("gail")
    )
    assert r.env_step > 0


def test_trainer_callbacks_and_logger_factory(tmp_path):
    """Epoch callbacks drive hparams; LoggerFactoryDefault writes TB files
    (reference highlevel/trainer.py:85-150, highlevel/logger.py:36)."""
    from tianshou_tpu.env.classic.cartpole import CartPole
    from tianshou_tpu.highlevel.config import ExperimentConfig, OffPolicyTrainingConfig
    from tianshou_tpu.highlevel.experiment import DQNExperimentBuilder
    from tianshou_tpu.highlevel.logger import LoggerFactoryDefault
    from tianshou_tpu.highlevel.trainer import (
        EpochStopCallbackRewardThreshold,
        EpochTestCallbackDQNSetEps,
        EpochTrainCallbackDQNEpsLinearDecay,
    )

    result = (
        DQNExperimentBuilder(
            lambda: CartPole(),
            ExperimentConfig(seed=0, persistence_base_dir=str(tmp_path), persistence_enabled=False),
            OffPolicyTrainingConfig(
                max_epochs=2, epoch_num_steps=1000, num_train_envs=8, num_test_envs=4,
                buffer_size=5000, test_step_num_episodes=4,
            ),
        )
        .with_epoch_train_callback(EpochTrainCallbackDQNEpsLinearDecay(1.0, 0.1, 5000))
        .with_epoch_test_callback(EpochTestCallbackDQNSetEps(0.0))
        .with_epoch_stop_callback(EpochStopCallbackRewardThreshold(threshold=10_000))
        .with_logger_factory(LoggerFactoryDefault(log_dir=str(tmp_path / "tb")))
        .build()
        .run("cb_test")
    )
    assert result.env_step >= 2000
    tb_dir = tmp_path / "tb" / "cb_test"
    assert tb_dir.exists() and any(tb_dir.iterdir())


def test_random_actor_and_dict_obs_net():
    import jax
    import jax.numpy as jnp

    from tianshou_tpu.data.batch import Batch
    from tianshou_tpu.models.mlp import MLP, DictObsNet, RandomActor, flatten_dict_obs

    ra = RandomActor(action_dim=3)
    params = ra.init(jax.random.key(0), jnp.zeros((2, 4)))
    logits = ra.apply(params, jnp.zeros((2, 4)))
    assert logits.shape == (2, 3) and float(jnp.abs(logits).sum()) == 0.0

    obs = Batch(pos=jnp.ones((5, 2)), vel=jnp.zeros((5, 3, 1)))
    flat = flatten_dict_obs(obs)
    assert flat.shape == (5, 5)
    net = DictObsNet(net=MLP((8,), 2))
    p = net.init(jax.random.key(0), obs)
    out = jax.jit(lambda o: net.apply(p, o))(obs)
    assert out.shape == (5, 2)


def test_discrete_offline_and_bc_builders_smoke(tmp_path):
    """The BC + discrete offline trio builders train from a gathered
    discrete dataset (VERDICT r2 item 8)."""
    import jax
    import jax.numpy as jnp

    from tianshou_tpu.algorithm.modelfree.dqn import DQN
    from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
    from tianshou_tpu.data.batch import Batch
    from tianshou_tpu.data.buffer.base import VectorReplayBuffer
    from tianshou_tpu.data.collector import DeviceCollector
    from tianshou_tpu.env.core import VectorDeviceEnv
    from tianshou_tpu.highlevel.config import OfflineTrainingConfig
    from tianshou_tpu.highlevel.experiment import (
        DiscreteBCQExperimentBuilder,
        DiscreteCQLExperimentBuilder,
        DiscreteCRRExperimentBuilder,
        ImitationLearningExperimentBuilder,
    )
    from tianshou_tpu.models.mlp import Net

    env = CartPole()
    # gather a small random dataset on the device path
    algo = DQN(model=Net(hidden_sizes=(32,), output_dim=2), action_space=env.action_space,
               optim=AdamOptimizerFactory(lr=1e-3), eps_training=1.0)
    key = jax.random.key(0)
    ts = algo.init(key, jnp.zeros(env.observation_space.shape))
    buffer = VectorReplayBuffer(total_size=4000, buffer_num=8)
    bs = buffer.init(Batch(
        obs=jnp.zeros(env.observation_space.shape), act=jnp.int32(0), rew=jnp.float32(0),
        terminated=jnp.bool_(False), truncated=jnp.bool_(False),
        obs_next=jnp.zeros(env.observation_space.shape),
    ))
    coll = DeviceCollector(VectorDeviceEnv(env, 8), algo, buffer)
    cstate = coll.reset(jax.random.key(1))
    cstate, bs, _ = coll.collect(ts, cstate, bs, jax.random.key(2), 50, random=True)

    for builder_cls in (ImitationLearningExperimentBuilder, DiscreteBCQExperimentBuilder,
                        DiscreteCQLExperimentBuilder, DiscreteCRRExperimentBuilder):
        cfg = ExperimentConfig(seed=0, persistence_base_dir=str(tmp_path), persistence_enabled=False)
        training = OfflineTrainingConfig(
            max_epochs=1, update_step_num_gradient_steps_per_epoch=20,
            batch_size=64, num_test_envs=4, test_step_num_episodes=2,
        )
        res = (
            builder_cls(lambda: env, cfg, training)
            .with_dataset(buffer, bs)
            .build()
            .run(f"offline_{builder_cls.__name__}")
        )
        assert res.gradient_step == 20, builder_cls.__name__


def test_marl_builder_selfplay_smoke():
    """MARL self-play through the declarative surface: builds per-agent
    masked DQNs, trains a few epochs of tic-tac-toe, returns stats."""
    from tianshou_tpu.env.tictactoe import TicTacToeEnv
    from tianshou_tpu.highlevel.experiment import MARLExperimentBuilder

    res = (
        MARLExperimentBuilder(
            TicTacToeEnv,
            n_agents=2,
            config=ExperimentConfig(seed=0, persistence_enabled=False),
            training=OffPolicyTrainingConfig(
                max_epochs=2, epoch_num_steps=600, buffer_size=8000,
                num_train_envs=4, num_test_envs=4, test_step_num_episodes=4,
                batch_size=64, collection_step_num_env_steps=16,
                update_step_num_gradient_steps_per_sample=0.25,
                start_timesteps=128,
            ),
        )
        .build()
        .run("marl_ttt")
    )
    assert res.env_step >= 128 + 2 * 600
    assert res.gradient_step > 0
