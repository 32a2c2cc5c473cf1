"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (no TPU needed);
bench.py and __graft_entry__.entry run on real hardware instead.

Note: the environment's sitecustomize force-registers the remote TPU backend
via ``jax.config.update("jax_platforms", "axon,cpu")``, so an env var is not
enough — we must update the config again before any backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must not run over the TPU tunnel"
assert jax.device_count() == 8


@pytest.fixture
def rng():
    return np.random.default_rng(0)
