"""Typed batch protocols (reference: tianshou/data/types.py:14-135).

The reference defines 15 structural ``BatchProtocol`` subclasses documenting
the keys each pipeline stage produces/consumes. The carrier here is always
:class:`~tianshou_tpu.data.batch.Batch` (a pytree of jnp arrays), so the
protocols are ``typing.Protocol`` classes used for static annotation plus
runtime key validation (``validate_keys``, called by ``ReplayBuffer.init``
and the ENABLE_VALIDATION trainer checks).
"""

from __future__ import annotations

from typing import Any, Protocol, runtime_checkable

import jax.numpy as jnp

from tianshou_tpu.data.batch import Batch

Arr = jnp.ndarray

__all__ = [
    "ObsBatchProtocol",
    "RolloutBatchProtocol",
    "BatchWithReturnsProtocol",
    "PrioBatchProtocol",
    "RecurrentStateBatch",
    "ActBatchProtocol",
    "ActStateBatchProtocol",
    "ModelOutputBatchProtocol",
    "FQFBatchProtocol",
    "BatchWithAdvantagesProtocol",
    "DistBatchProtocol",
    "DistLogProbBatchProtocol",
    "LogpOldProtocol",
    "QuantileRegressionBatchProtocol",
    "ImitationBatchProtocol",
    "ROLLOUT_KEYS",
    "RETURNS_KEYS",
    "ADVANTAGE_KEYS",
    "PRIO_KEYS",
    "LOGP_OLD_KEYS",
    "validate_keys",
]


@runtime_checkable
class ObsBatchProtocol(Protocol):
    """Observations a policy can turn into actions (reference types.py:14)."""

    obs: Arr | Batch


class RolloutBatchProtocol(ObsBatchProtocol, Protocol):
    """One stored transition / the outcome of sampling a buffer (:27)."""

    obs_next: Arr | Batch
    act: Arr
    rew: Arr
    terminated: Arr
    truncated: Arr


class BatchWithReturnsProtocol(RolloutBatchProtocol, Protocol):
    """Rollout plus bootstrapped/MC returns (:39)."""

    returns: Arr


class PrioBatchProtocol(RolloutBatchProtocol, Protocol):
    """Rollout plus PER importance weights (:45)."""

    weight: Arr


class RecurrentStateBatch(Protocol):
    """RNN carry: hidden and cell state (:52)."""

    hidden: Arr
    cell: Arr


class ActBatchProtocol(Protocol):
    """Just an action (:59) — e.g. RandomActionPolicy output."""

    act: Arr


class ActStateBatchProtocol(ActBatchProtocol, Protocol):
    """Action plus recurrent carry, possibly None (:65)."""

    state: Any


class ModelOutputBatchProtocol(ActStateBatchProtocol, Protocol):
    """Action, state and raw model logits (:73)."""

    logits: Arr


class FQFBatchProtocol(ModelOutputBatchProtocol, Protocol):
    """FQF model outputs: fractions + quantile values at taus (:79)."""

    fractions: Arr
    quantiles_tau: Arr


class BatchWithAdvantagesProtocol(BatchWithReturnsProtocol, Protocol):
    """Returns plus GAE advantages and value estimates (:86)."""

    adv: Arr
    v_s: Arr


class DistBatchProtocol(ModelOutputBatchProtocol, Protocol):
    """Carries distribution parameters for the taken actions (:96).

    JAX note: distributions are (params, fn) pairs rather than objects;
    the stored field is the parameter pytree.
    """

    dist_params: Arr | Batch


class DistLogProbBatchProtocol(DistBatchProtocol, Protocol):
    """Distribution params plus log-prob of the taken action (:105)."""

    log_prob: Arr


class LogpOldProtocol(BatchWithAdvantagesProtocol, Protocol):
    """Advantages plus behavior-policy log-probs for PPO ratios (:111)."""

    logp_old: Arr


class QuantileRegressionBatchProtocol(ModelOutputBatchProtocol, Protocol):
    """Sampled taus for IQN/QRDQN-style quantile regression (:120)."""

    taus: Arr


class ImitationBatchProtocol(ModelOutputBatchProtocol, Protocol):
    """Imitation heads: q values + imitation logits (:129)."""

    q_value: Arr
    imitation_logits: Arr


# ---------------------------------------------------------------------------
# runtime key contracts (reserved keys: reference buffer_base.py:41)
# ---------------------------------------------------------------------------

ROLLOUT_KEYS = ("obs", "act", "rew", "terminated", "truncated", "done", "obs_next")
RETURNS_KEYS = ROLLOUT_KEYS + ("returns",)
ADVANTAGE_KEYS = RETURNS_KEYS + ("adv", "v_s")
PRIO_KEYS = ROLLOUT_KEYS + ("weight",)
LOGP_OLD_KEYS = ADVANTAGE_KEYS + ("logp_old",)

# keys a transition example must provide to allocate buffer storage
# ("done" and "obs_next" are derived/optional at init time)
TRANSITION_EXAMPLE_KEYS = ("obs", "act", "rew", "terminated", "truncated")


def validate_keys(batch: Batch, required: tuple[str, ...]) -> None:
    """Raise KeyError if ``batch`` lacks any of ``required`` top-level keys."""
    missing = [k for k in required if k not in batch]
    if missing:
        raise KeyError(f"batch is missing required keys {missing}; has {list(batch.keys())}")
