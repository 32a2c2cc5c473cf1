"""Declarative Experiment / ExperimentBuilder API.

Rebuild of reference ``highlevel/experiment.py`` (``Experiment:170``,
``ExperimentBuilder:510`` + per-algorithm builders :1105-1500) and
``highlevel/algorithm.py`` (``AlgorithmFactory:110``: buffer+collector
creation :123-166, trainer assembly :207-302). The factory stack targets the
device path: envs are pure-JAX :class:`Env` specs vectorized on chip.

Usage (mirrors the reference's builder chain)::

    result = (
        DQNExperimentBuilder(lambda: CartPole(), ExperimentConfig(seed=0),
                             OffPolicyTrainingConfig(max_epochs=5))
        .with_model_factory(QNetFactoryDefault(hidden_sizes=(64, 64)))
        .with_dqn_params(gamma=0.97, target_update_freq=320, eps_training=0.3)
        .build()
        .run("dqn_cartpole")
    )
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from collections.abc import Callable
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tianshou_tpu.algorithm.optim import AdamOptimizerFactory
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import VectorReplayBuffer
from tianshou_tpu.data.collector import DeviceCollector
from tianshou_tpu.env.core import Box, Discrete, Env, VectorDeviceEnv
from tianshou_tpu.highlevel.config import (
    ExperimentConfig,
    OffPolicyTrainingConfig,
    OnPolicyTrainingConfig,
)
from tianshou_tpu.highlevel.module import ActorFactoryDefault, CriticFactoryDefault, QNetFactoryDefault
from tianshou_tpu.trainer.trainer import (
    OffPolicyTrainer,
    OffPolicyTrainerParams,
    OnPolicyTrainer,
    OnPolicyTrainerParams,
    TrainResult,
)
from tianshou_tpu.utils.logger.base import LazyLogger
from tianshou_tpu.utils.persistence import save_train_state

__all__ = [
    "Experiment",
    "ExperimentBuilder",
    "DQNExperimentBuilder",
    "PPOExperimentBuilder",
    "A2CExperimentBuilder",
    "ReinforceExperimentBuilder",
    "SACExperimentBuilder",
    "TD3ExperimentBuilder",
    "DDPGExperimentBuilder",
    "REDQExperimentBuilder",
    "NPGExperimentBuilder",
    "TRPOExperimentBuilder",
    "C51ExperimentBuilder",
    "IQNExperimentBuilder",
    "DiscreteSACExperimentBuilder",
    "CQLExperimentBuilder",
    "TD3BCExperimentBuilder",
    "BCQExperimentBuilder",
]


def _obs_example(env: Env):
    if isinstance(env.observation_space, Box):
        return jnp.zeros(env.observation_space.shape)
    return jnp.zeros(env.observation_space.shape or (1,))


@dataclasses.dataclass
class Experiment:
    """A fully-specified, runnable experiment (reference experiment.py:170)."""

    config: ExperimentConfig
    training: Any
    env_factory: Callable[[], Env]
    algo_factory: Callable[[Env], Any]
    logger_factory: Callable[[str], Any] | None = None
    offline_dataset: Any = None  # (buffer, buf_state) for offline builders

    def run(self, run_name: str = "experiment") -> TrainResult:
        from tianshou_tpu.highlevel.env import GymEnvFactory

        if isinstance(self.env_factory, GymEnvFactory):
            return self._run_host(run_name)
        cfg, tc = self.config, self.training
        key = jax.random.key(cfg.seed)
        np.random.seed(cfg.seed)
        env = self.env_factory()
        algo = self.algo_factory(env)
        key, k_init = jax.random.split(key)
        ts = algo.init(k_init, _obs_example(env))

        train_envs = VectorDeviceEnv(env, tc.num_train_envs)
        test_envs = VectorDeviceEnv(env, tc.num_test_envs)
        logger = self.logger_factory(run_name) if self.logger_factory else LazyLogger()

        persist_dir = os.path.join(cfg.persistence_base_dir, run_name)
        save_best = None
        if cfg.persistence_enabled:
            os.makedirs(persist_dir, exist_ok=True)

            def save_best(best_ts):
                save_train_state(os.path.join(persist_dir, "best"), best_ts)

        stop_fn = None
        if tc.stop_threshold is not None:
            stop_fn = lambda r: r >= tc.stop_threshold  # noqa: E731

        if self.offline_dataset is not None:
            from tianshou_tpu.trainer.trainer import OfflineTrainer, OfflineTrainerParams

            buffer, buf_state = self.offline_dataset
            ecol = DeviceCollector(test_envs, algo, None)
            params = OfflineTrainerParams(
                max_epochs=tc.max_epochs,
                update_step_num_gradient_steps_per_epoch=getattr(
                    tc, "update_step_num_gradient_steps_per_epoch", 500
                ),
                batch_size=getattr(tc, "batch_size", 128),
                test_step_num_episodes=tc.test_step_num_episodes,
                stop_fn=stop_fn,
                save_best_fn=save_best,
                logger=logger,
                verbose=False,
            )
            result = OfflineTrainer(algo, buffer, ecol, params).run(ts, buf_state, key)
        elif isinstance(tc, OnPolicyTrainingConfig):
            tcol = DeviceCollector(train_envs, algo, None)
            ecol = DeviceCollector(test_envs, algo, None)
            params = OnPolicyTrainerParams(
                max_epochs=tc.max_epochs,
                epoch_num_steps=tc.epoch_num_steps,
                test_step_num_episodes=tc.test_step_num_episodes,
                batch_size=tc.batch_size,
                collection_step_num_env_steps=tc.collection_step_num_env_steps,
                update_step_num_repetitions=tc.update_step_num_repetitions,
                stop_fn=stop_fn,
                save_best_fn=save_best,
                logger=logger,
                verbose=False,
            )
            result = OnPolicyTrainer(algo, tcol, ecol, params).run(ts, key)
        else:
            buffer = VectorReplayBuffer(
                total_size=tc.buffer_size,
                buffer_num=tc.num_train_envs,
                stack_num=tc.replay_buffer_stack_num,
            )
            example = Batch(
                obs=_obs_example(env),
                act=jnp.int32(0) if isinstance(env.action_space, Discrete) else jnp.zeros(env.action_space.shape),
                rew=jnp.float32(0),
                terminated=jnp.bool_(False),
                truncated=jnp.bool_(False),
                obs_next=_obs_example(env),
            )
            buf_state = buffer.init(example)
            tcol = DeviceCollector(train_envs, algo, buffer)
            ecol = DeviceCollector(test_envs, algo, None)
            params = OffPolicyTrainerParams(
                max_epochs=tc.max_epochs,
                epoch_num_steps=tc.epoch_num_steps,
                test_step_num_episodes=tc.test_step_num_episodes,
                batch_size=tc.batch_size,
                collection_step_num_env_steps=tc.collection_step_num_env_steps,
                update_per_step=tc.update_step_num_gradient_steps_per_sample,
                start_steps=tc.start_timesteps,
                start_random=tc.start_timesteps_random,
                stop_fn=stop_fn,
                save_best_fn=save_best,
                logger=logger,
                verbose=False,
            )
            result = OffPolicyTrainer(algo, tcol, ecol, buffer, params).run(ts, buf_state, key)

        if cfg.persistence_enabled:
            with open(os.path.join(persist_dir, "experiment.pkl"), "wb") as f:
                pickle.dump({"config": cfg, "training": tc, "run_name": run_name}, f)
        if cfg.watch:
            key, kw = jax.random.split(key)
            watch_col = DeviceCollector(test_envs, algo, None)
            stats = watch_col.collect_episodes(result.train_state, kw, cfg.watch_num_episodes, training=False)
            print(f"watch: mean return {stats.returns.mean():.2f} over {len(stats.returns)} episodes")
        return result

    def _run_host(self, run_name: str) -> TrainResult:
        """Host path for registered Gymnasium tasks (off-policy only):
        HostCollector + HostOffPolicyTrainer, updates jitted on device."""
        import types

        from tianshou_tpu.data.host_collector import HostCollector
        from tianshou_tpu.trainer.trainer import HostOffPolicyTrainer

        cfg, tc = self.config, self.training
        assert isinstance(tc, OffPolicyTrainingConfig), "host path supports off-policy configs"
        key = jax.random.key(cfg.seed)
        np.random.seed(cfg.seed)
        obs_space, act_space = self.env_factory.spaces()
        env_like = types.SimpleNamespace(observation_space=obs_space, action_space=act_space)
        algo = self.algo_factory(env_like)
        key, k_init = jax.random.split(key)
        ts = algo.init(k_init, jnp.zeros(obs_space.shape))

        buffer = VectorReplayBuffer(
            total_size=tc.buffer_size, buffer_num=tc.num_train_envs,
            stack_num=tc.replay_buffer_stack_num,
        )
        example = Batch(
            obs=jnp.zeros(obs_space.shape),
            act=jnp.int32(0) if isinstance(act_space, Discrete) else jnp.zeros(act_space.shape),
            rew=jnp.float32(0),
            terminated=jnp.bool_(False),
            truncated=jnp.bool_(False),
            obs_next=jnp.zeros(obs_space.shape),
        )
        buf_state = buffer.init(example)
        tcol = HostCollector(self.env_factory.create_venv(tc.num_train_envs), algo, buffer)
        ecol = HostCollector(self.env_factory.create_venv(tc.num_test_envs), algo, None)
        logger = self.logger_factory(run_name) if self.logger_factory else LazyLogger()
        stop_fn = (lambda r: r >= tc.stop_threshold) if tc.stop_threshold is not None else None
        params = OffPolicyTrainerParams(
            max_epochs=tc.max_epochs,
            epoch_num_steps=tc.epoch_num_steps,
            test_step_num_episodes=tc.test_step_num_episodes,
            batch_size=tc.batch_size,
            collection_step_num_env_steps=tc.collection_step_num_env_steps,
            update_per_step=tc.update_step_num_gradient_steps_per_sample,
            start_steps=tc.start_timesteps,
            start_random=tc.start_timesteps_random,
            stop_fn=stop_fn,
            logger=logger,
            verbose=False,
            seed=cfg.seed,
        )
        return HostOffPolicyTrainer(algo, tcol, ecol, buffer, params).run(ts, buf_state, key)

    @staticmethod
    def from_directory(path: str) -> dict:
        with open(os.path.join(path, "experiment.pkl"), "rb") as f:
            return pickle.load(f)


class ExperimentBuilder:
    """Fluent builder base (reference experiment.py:510)."""

    def __init__(self, env_factory: Callable[[], Env], config: ExperimentConfig | None = None, training=None) -> None:
        self._env_factory = env_factory
        self._config = config or ExperimentConfig()
        self._training = training
        self._logger_factory: Callable | None = None
        self._optim_factory = AdamOptimizerFactory
        self._params: dict = {}

    def with_logger_factory(self, factory) -> "ExperimentBuilder":
        self._logger_factory = factory
        return self

    def with_optim_factory(self, factory) -> "ExperimentBuilder":
        self._optim_factory = factory
        return self

    def _make_algo(self, env: Env):
        raise NotImplementedError

    def build(self) -> Experiment:
        return Experiment(
            config=self._config,
            training=self._training,
            env_factory=self._env_factory,
            algo_factory=self._make_algo,
            logger_factory=self._logger_factory,
        )


class DQNExperimentBuilder(ExperimentBuilder):
    def __init__(self, env_factory, config=None, training=None) -> None:
        super().__init__(env_factory, config, training or OffPolicyTrainingConfig())
        self._model_factory = QNetFactoryDefault()
        self._lr = 1e-3

    def with_model_factory(self, f) -> "DQNExperimentBuilder":
        self._model_factory = f
        return self

    def with_dqn_params(self, **kwargs) -> "DQNExperimentBuilder":
        self._params.update(kwargs)
        return self

    def _make_algo(self, env: Env):
        from tianshou_tpu.algorithm.modelfree.dqn import DQN

        return DQN(
            model=self._model_factory.create(env.observation_space, env.action_space),
            action_space=env.action_space,
            optim=self._optim_factory(lr=self._params.pop("lr", self._lr)) if callable(self._optim_factory) else self._optim_factory,
            **self._params,
        )


class _ActorCriticBuilder(ExperimentBuilder):
    def __init__(self, env_factory, config=None, training=None) -> None:
        super().__init__(env_factory, config, training or OnPolicyTrainingConfig())
        self._actor_factory = ActorFactoryDefault()
        self._critic_factory = CriticFactoryDefault()
        self._lr = 3e-4

    def with_actor_factory(self, f):
        self._actor_factory = f
        return self

    def with_critic_factory(self, f):
        self._critic_factory = f
        return self

    def with_params(self, **kwargs):
        self._params.update(kwargs)
        return self


class PPOExperimentBuilder(_ActorCriticBuilder):
    def _make_algo(self, env: Env):
        from tianshou_tpu.algorithm.modelfree.ppo import PPO

        return PPO(
            actor=self._actor_factory.create(env.observation_space, env.action_space),
            critic=self._critic_factory.create(env.observation_space, env.action_space),
            action_space=env.action_space,
            optim=AdamOptimizerFactory(lr=self._params.pop("lr", self._lr), max_grad_norm=0.5),
            deterministic_eval=True,
            **self._params,
        )


class A2CExperimentBuilder(_ActorCriticBuilder):
    def _make_algo(self, env: Env):
        from tianshou_tpu.algorithm.modelfree.a2c import A2C

        return A2C(
            actor=self._actor_factory.create(env.observation_space, env.action_space),
            critic=self._critic_factory.create(env.observation_space, env.action_space),
            action_space=env.action_space,
            optim=AdamOptimizerFactory(lr=self._params.pop("lr", 7e-4), max_grad_norm=0.5),
            deterministic_eval=True,
            **self._params,
        )


class ReinforceExperimentBuilder(_ActorCriticBuilder):
    def _make_algo(self, env: Env):
        from tianshou_tpu.algorithm.modelfree.reinforce import Reinforce

        return Reinforce(
            actor=self._actor_factory.create(env.observation_space, env.action_space),
            action_space=env.action_space,
            optim=AdamOptimizerFactory(lr=self._params.pop("lr", 1e-3)),
            deterministic_eval=True,
            **self._params,
        )


class _ContinuousOffPolicyBuilder(ExperimentBuilder):
    def __init__(self, env_factory, config=None, training=None) -> None:
        super().__init__(env_factory, config, training or OffPolicyTrainingConfig())
        self._actor_factory = ActorFactoryDefault()
        self._critic_factory = CriticFactoryDefault(use_action=True)

    def with_actor_factory(self, f):
        self._actor_factory = f
        return self

    def with_critic_factory(self, f):
        self._critic_factory = f
        return self

    def with_params(self, **kwargs):
        self._params.update(kwargs)
        return self


class SACExperimentBuilder(_ContinuousOffPolicyBuilder):
    def _make_algo(self, env: Env):
        from tianshou_tpu.algorithm.modelfree.sac import SAC

        self._actor_factory.conditioned_sigma = True
        return SAC(
            actor=self._actor_factory.create(env.observation_space, env.action_space),
            critic=self._critic_factory.create(env.observation_space, env.action_space),
            action_space=env.action_space,
            policy_optim=AdamOptimizerFactory(lr=self._params.pop("actor_lr", 3e-4)),
            critic_optim=AdamOptimizerFactory(lr=self._params.pop("critic_lr", 3e-4)),
            **self._params,
        )


class TD3ExperimentBuilder(_ContinuousOffPolicyBuilder):
    def _make_algo(self, env: Env):
        from tianshou_tpu.algorithm.modelfree.td3 import TD3

        self._actor_factory.continuous_deterministic = True
        return TD3(
            actor=self._actor_factory.create(env.observation_space, env.action_space),
            critic=self._critic_factory.create(env.observation_space, env.action_space),
            action_space=env.action_space,
            policy_optim=AdamOptimizerFactory(lr=self._params.pop("actor_lr", 3e-4)),
            critic_optim=AdamOptimizerFactory(lr=self._params.pop("critic_lr", 3e-4)),
            **self._params,
        )


class DDPGExperimentBuilder(_ContinuousOffPolicyBuilder):
    def _make_algo(self, env: Env):
        from tianshou_tpu.algorithm.modelfree.ddpg import DDPG

        self._actor_factory.continuous_deterministic = True
        return DDPG(
            actor=self._actor_factory.create(env.observation_space, env.action_space),
            critic=self._critic_factory.create(env.observation_space, env.action_space),
            action_space=env.action_space,
            policy_optim=AdamOptimizerFactory(lr=self._params.pop("actor_lr", 1e-3)),
            critic_optim=AdamOptimizerFactory(lr=self._params.pop("critic_lr", 1e-3)),
            **self._params,
        )


class REDQExperimentBuilder(_ContinuousOffPolicyBuilder):
    def _make_algo(self, env: Env):
        from tianshou_tpu.algorithm.modelfree.redq import REDQ
        from tianshou_tpu.models.continuous import EnsembleCritic

        self._actor_factory.conditioned_sigma = True
        ensemble = self._params.pop("ensemble_size", 10)
        return REDQ(
            actor=self._actor_factory.create(env.observation_space, env.action_space),
            critic=EnsembleCritic(ensemble_size=ensemble, hidden_sizes=tuple(self._critic_factory.hidden_sizes)),
            action_space=env.action_space,
            policy_optim=AdamOptimizerFactory(lr=self._params.pop("actor_lr", 3e-4)),
            critic_optim=AdamOptimizerFactory(lr=self._params.pop("critic_lr", 3e-4)),
            ensemble_size=ensemble,
            **self._params,
        )


class NPGExperimentBuilder(_ActorCriticBuilder):
    def _make_algo(self, env: Env):
        from tianshou_tpu.algorithm.modelfree.npg import NPG

        return NPG(
            actor=self._actor_factory.create(env.observation_space, env.action_space),
            critic=self._critic_factory.create(env.observation_space, env.action_space),
            action_space=env.action_space,
            optim=AdamOptimizerFactory(lr=self._params.pop("lr", 1e-3)),
            deterministic_eval=True,
            **self._params,
        )


class TRPOExperimentBuilder(_ActorCriticBuilder):
    def _make_algo(self, env: Env):
        from tianshou_tpu.algorithm.modelfree.trpo import TRPO

        return TRPO(
            actor=self._actor_factory.create(env.observation_space, env.action_space),
            critic=self._critic_factory.create(env.observation_space, env.action_space),
            action_space=env.action_space,
            optim=AdamOptimizerFactory(lr=self._params.pop("lr", 1e-3)),
            deterministic_eval=True,
            **self._params,
        )


class C51ExperimentBuilder(DQNExperimentBuilder):
    def __init__(self, env_factory, config=None, training=None) -> None:
        super().__init__(env_factory, config, training)
        self._model_factory = QNetFactoryDefault(num_atoms=51, softmax=True)

    def _make_algo(self, env: Env):
        from tianshou_tpu.algorithm.modelfree.c51 import C51

        num_atoms = self._params.pop("num_atoms", self._model_factory.num_atoms)
        self._model_factory.num_atoms = num_atoms
        self._model_factory.softmax = True
        return C51(
            model=self._model_factory.create(env.observation_space, env.action_space),
            action_space=env.action_space,
            optim=AdamOptimizerFactory(lr=self._params.pop("lr", 1e-3)),
            num_atoms=num_atoms,
            **self._params,
        )


class IQNExperimentBuilder(DQNExperimentBuilder):
    def _make_algo(self, env: Env):
        from tianshou_tpu.algorithm.modelfree.iqn import IQN
        from tianshou_tpu.models.discrete import ImplicitQuantileNetwork

        return IQN(
            model=ImplicitQuantileNetwork(
                hidden_sizes=tuple(self._model_factory.hidden_sizes),
                action_dim=env.action_space.n,
            ),
            action_space=env.action_space,
            optim=AdamOptimizerFactory(lr=self._params.pop("lr", 1e-3)),
            **self._params,
        )


class _OfflineBuilder(ExperimentBuilder):
    """Offline builders train from a fixed dataset (reference
    highlevel/experiment.py offline variants). Provide the dataset as a
    device buffer state via ``with_dataset(buffer, buf_state)``."""

    def __init__(self, env_factory, config=None, training=None) -> None:
        from tianshou_tpu.highlevel.config import TrainingConfig

        super().__init__(env_factory, config, training or TrainingConfig())
        self._dataset = None

    def with_dataset(self, buffer, buf_state) -> "_OfflineBuilder":
        self._dataset = (buffer, buf_state)
        return self

    def with_params(self, **kwargs):
        self._params.update(kwargs)
        return self

    def build(self) -> "Experiment":
        assert self._dataset is not None, "call with_dataset(buffer, buf_state) first"
        exp = super().build()
        exp.offline_dataset = self._dataset
        return exp


class CQLExperimentBuilder(_OfflineBuilder):
    def _make_algo(self, env: Env):
        from tianshou_tpu.algorithm.imitation.cql import CQL
        from tianshou_tpu.models.continuous import ContinuousActorProbabilistic, ContinuousCritic

        dim = int(env.action_space.shape[0])
        return CQL(
            actor=ContinuousActorProbabilistic(hidden_sizes=(128, 128), action_dim=dim, conditioned_sigma=True),
            critic=ContinuousCritic(hidden_sizes=(128, 128)),
            action_space=env.action_space,
            policy_optim=AdamOptimizerFactory(lr=self._params.pop("actor_lr", 3e-4)),
            critic_optim=AdamOptimizerFactory(lr=self._params.pop("critic_lr", 3e-4)),
            **self._params,
        )


class TD3BCExperimentBuilder(_OfflineBuilder):
    def _make_algo(self, env: Env):
        from tianshou_tpu.algorithm.imitation.td3_bc import TD3BC
        from tianshou_tpu.models.continuous import ContinuousActorDeterministic, ContinuousCritic

        dim = int(env.action_space.shape[0])
        return TD3BC(
            actor=ContinuousActorDeterministic(hidden_sizes=(128, 128), action_dim=dim),
            critic=ContinuousCritic(hidden_sizes=(128, 128)),
            action_space=env.action_space,
            policy_optim=AdamOptimizerFactory(lr=self._params.pop("actor_lr", 3e-4)),
            critic_optim=AdamOptimizerFactory(lr=self._params.pop("critic_lr", 3e-4)),
            **self._params,
        )


class BCQExperimentBuilder(_OfflineBuilder):
    def _make_algo(self, env: Env):
        from tianshou_tpu.algorithm.imitation.bcq import BCQ
        from tianshou_tpu.models.continuous import ContinuousCritic, Perturbation, VAE

        dim = int(env.action_space.shape[0])
        return BCQ(
            actor_perturbation=Perturbation(hidden_sizes=(64, 64), action_dim=dim),
            critic=ContinuousCritic(hidden_sizes=(64, 64)),
            vae=VAE(encoder_hidden=(64,), decoder_hidden=(64,), action_dim=dim, latent_dim=2 * dim),
            action_space=env.action_space,
            **self._params,
        )


class DiscreteSACExperimentBuilder(ExperimentBuilder):
    def __init__(self, env_factory, config=None, training=None) -> None:
        super().__init__(env_factory, config, training or OffPolicyTrainingConfig())
        self._hidden = (64, 64)

    def with_params(self, **kwargs):
        self._params.update(kwargs)
        return self

    def _make_algo(self, env: Env):
        from tianshou_tpu.algorithm.modelfree.discrete_sac import DiscreteSAC
        from tianshou_tpu.models.discrete import DiscreteActor, DiscreteCritic

        n = env.action_space.n
        return DiscreteSAC(
            actor=DiscreteActor(hidden_sizes=self._hidden, action_dim=n),
            critic=DiscreteCritic(hidden_sizes=self._hidden, last_size=n),
            action_space=env.action_space,
            policy_optim=AdamOptimizerFactory(lr=self._params.pop("actor_lr", 5e-4)),
            critic_optim=AdamOptimizerFactory(lr=self._params.pop("critic_lr", 5e-4)),
            **self._params,
        )
