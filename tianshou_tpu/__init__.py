"""tianshou_tpu: a TPU-native deep RL framework (JAX/XLA/Pallas/pjit).

A ground-up rebuild of the capability surface of thu-ml/tianshou v2 where the
collect->update loop is a single jitted program: pure-function vectorized
environments stepped inside ``lax.scan``, device-resident replay buffers,
functional Algorithm/Policy updates with optax, and scaling via
``jax.sharding`` meshes instead of subprocess pipes.
"""

__version__ = "0.1.0"

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.data.buffer.base import ReplayBuffer, VectorReplayBuffer
from tianshou_tpu.data.buffer.her import HERReplayBuffer, HERVectorReplayBuffer
from tianshou_tpu.data.buffer.prio import PrioritizedReplayBuffer, PrioritizedVectorReplayBuffer
from tianshou_tpu.data.collector import CollectStats, DeviceCollector
from tianshou_tpu.env.core import Box, Discrete, Env, MultiDiscrete, VectorDeviceEnv
from tianshou_tpu.trainer.trainer import (
    OfflineTrainer,
    OfflineTrainerParams,
    OffPolicyTrainer,
    OffPolicyTrainerParams,
    OnPolicyTrainer,
    OnPolicyTrainerParams,
)

__all__ = [
    "Batch",
    "Box",
    "CollectStats",
    "DeviceCollector",
    "Discrete",
    "Env",
    "HERReplayBuffer",
    "HERVectorReplayBuffer",
    "MultiDiscrete",
    "OfflineTrainer",
    "OfflineTrainerParams",
    "OffPolicyTrainer",
    "OffPolicyTrainerParams",
    "OnPolicyTrainer",
    "OnPolicyTrainerParams",
    "PrioritizedReplayBuffer",
    "PrioritizedVectorReplayBuffer",
    "ReplayBuffer",
    "VectorDeviceEnv",
    "VectorReplayBuffer",
    "__version__",
]
