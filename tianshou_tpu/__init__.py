"""tianshou_tpu: a TPU-native deep RL framework (JAX/XLA/Pallas/pjit).

A ground-up rebuild of the capability surface of thu-ml/tianshou v2 where the
collect->update loop is a single jitted program: pure-function vectorized
environments stepped inside ``lax.scan``, device-resident replay buffers,
functional Algorithm/Policy updates with optax, and scaling via
``jax.sharding`` meshes instead of subprocess pipes.
"""

__version__ = "0.1.0"

from tianshou_tpu.data.batch import Batch

__all__ = ["Batch", "__version__"]
