"""Typed rollout schemas (reference: tianshou/data/types.py:14-135).

The reference defines 15 ``BatchProtocol`` subclasses documenting the keys an
algorithm expects. Here the same contracts are expressed as key-set constants
plus a ``validate_keys`` helper; the carrier is always :class:`Batch` (a
pytree), so static typing is structural rather than nominal.
"""

from __future__ import annotations

from tianshou_tpu.data.batch import Batch

# Keys every transition stored in a replay buffer carries
# (reference buffer_base.py:41 reserved keys).
ROLLOUT_KEYS = ("obs", "act", "rew", "terminated", "truncated", "done", "obs_next")

# Optional keys produced by specific pipelines.
RETURNS_KEYS = ROLLOUT_KEYS + ("returns",)
ADVANTAGE_KEYS = RETURNS_KEYS + ("adv", "v_s", "v_s_")
PRIO_KEYS = ROLLOUT_KEYS + ("weight",)
LOGP_OLD_KEYS = ADVANTAGE_KEYS + ("logp_old",)


def validate_keys(batch: Batch, required: tuple[str, ...]) -> None:
    missing = [k for k in required if k not in batch]
    if missing:
        raise KeyError(f"batch is missing required keys {missing}; has {list(batch.keys())}")
