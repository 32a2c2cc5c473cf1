"""Algorithm/Policy base abstractions.

Rebuild of the reference's two-level split (``tianshou/algorithm/
algorithm_base.py``): ``Policy`` (:159) selects actions, ``Algorithm`` (:434)
owns the update rule. Here both are *static* objects whose methods are pure
functions over an explicit :class:`TrainState` pytree, so the whole
collect->update loop jit-compiles into one XLA program:

- ``Policy.forward(ts, obs, key)``          <- Policy.forward
- ``Policy.map_action``                     <- algorithm_base.py:254 (clip/scale)
- ``Algorithm.init(key, ...) -> TrainState``<- nn.Module + optimizer ctor
- ``Algorithm.preprocess / update_step``    <- _preprocess_batch/_update_with_batch
- target nets = ``target_params`` copy + ``optax.incremental_update``
  (<- LaggedNetwork mixins, algorithm_base.py:375-427)

Mutable runtime knobs (epsilon, beta, alpha) live in ``TrainState.hparams``
(a Batch of scalars) because the trainer anneals them between jitted steps.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from tianshou_tpu.data.batch import Batch
from tianshou_tpu.env.core import Box, Discrete, Space

__all__ = ["TrainState", "Algorithm", "OnPolicyAlgorithm", "OffPolicyAlgorithm", "OfflineAlgorithm", "polyak_update"]


@struct.dataclass
class TrainState:
    """All mutable algorithm state as one pytree."""

    params: Any                 # dict[str, flax params]
    target_params: Any          # dict[str, flax params] (may be empty dict)
    opt_state: Any              # dict[str, optax state]
    hparams: Any                # Batch of dynamic scalars (eps, alpha, ...)
    extra: Any                  # algorithm-specific carried state
    step: jnp.ndarray           # gradient-step counter


class ActOut(NamedTuple):
    act: jnp.ndarray        # raw policy output (pre map_action)
    state: Any              # recurrent state (None if stateless)
    info: Any               # Batch: logits/logp/dist params as needed


def polyak_update(target: Any, online: Any, tau: float) -> Any:
    """theta_target <- tau * theta + (1 - tau) * theta_target
    (reference utils/lagged_network.py:polyak_parameter_update)."""
    return optax.incremental_update(online, target, tau)


def tree_copy(tree: Any) -> Any:
    """Materialize fresh buffers (target nets must not alias online params,
    or buffer donation sees the same buffer twice)."""
    return jax.tree.map(jnp.copy, tree)


def batch_obs_example(obs_example: Any) -> Any:
    """Add a leading batch dim to a single-obs example (array or pytree,
    e.g. goal-structured Batch observations)."""
    return jax.tree.map(lambda x: jnp.asarray(x)[None], obs_example)


class Algorithm:
    """Base for all algorithms. Subclasses define the four pure methods and
    declare their nets in ``init``.

    Static config (nets, gamma, spaces) lives on ``self``; everything that
    changes during training lives in :class:`TrainState`.
    """

    def __init__(
        self,
        action_space: Space,
        observation_space: Space | None = None,
        action_scaling: bool = False,
        action_bound_method: str | None = "clip",  # "clip" | "tanh" | None
        gamma: float = 0.99,
        optim: optax.GradientTransformation | None = None,
        lr_schedule: optax.Schedule | None = None,
    ) -> None:
        self.action_space = action_space
        self.observation_space = observation_space
        self.action_scaling = action_scaling
        self.action_bound_method = action_bound_method
        self.gamma = gamma
        self.optim = optim if optim is not None else optax.adam(1e-3)
        self.lr_schedule = lr_schedule
        from tianshou_tpu.env.core import MultiDiscrete

        self.is_discrete = isinstance(action_space, (Discrete, MultiDiscrete))

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------
    def init(self, key: jax.Array, obs_example: jnp.ndarray) -> TrainState:
        raise NotImplementedError

    # ------------------------------------------------------------------
    # acting
    # ------------------------------------------------------------------
    def forward(
        self,
        ts: TrainState,
        obs: jnp.ndarray,
        key: jax.Array,
        state: Any = None,
        deterministic: bool = False,
    ) -> ActOut:
        raise NotImplementedError

    def exploration_noise(
        self, ts: TrainState, act: jnp.ndarray, obs: jnp.ndarray, key: jax.Array, training: bool = True
    ) -> jnp.ndarray:
        """Exploration hook (reference Policy.add_exploration_noise :354).

        Called by collectors in BOTH train and eval mode; ``training`` is a
        static flag letting eps-greedy policies pick ``eps_training`` vs
        ``eps_inference`` (reference dqn.py:158 via is_within_training_step).
        """
        return act

    def init_policy_state(self, num_envs: int) -> Any:
        """Initial recurrent state for the collector carry (None if
        stateless); reset on episode end (reference collector.py:1103)."""
        return None

    def reset_policy_state(self, num_envs: int, key: jax.Array) -> Any:
        """State installed for envs whose episode just finished. Default =
        the zero initial state (recurrent carry reset, reference
        collector.py:1103); stochastic-exploration policies (gSDE) override
        to resample their noise state with ``key``."""
        return self.init_policy_state(num_envs)

    def refresh_policy_state(self, state: Any, num_envs: int, key: jax.Array) -> Any:
        """Hook run once at the start of every collect chunk. Default
        identity; gSDE policies resample the exploration-noise matrix here
        (the per-rollout resample cadence of arXiv:2005.05719)."""
        return state

    def map_action(self, act: jnp.ndarray) -> jnp.ndarray:
        """Map raw policy output into env action space
        (reference Policy.map_action algorithm_base.py:254)."""
        if self.is_discrete:
            return act
        if self.action_bound_method == "clip":
            act = jnp.clip(act, -1.0, 1.0)
        elif self.action_bound_method == "tanh":
            act = jnp.tanh(act)
        if self.action_scaling and isinstance(self.action_space, Box):
            low = jnp.asarray(self.action_space.low_arr)
            high = jnp.asarray(self.action_space.high_arr)
            act = low + (high - low) * (act + 1.0) / 2.0
        return act

    def map_action_inverse(self, act: jnp.ndarray) -> jnp.ndarray:
        """Inverse of map_action for real env actions (reference :289)."""
        if self.is_discrete:
            return act
        if self.action_scaling and isinstance(self.action_space, Box):
            low = jnp.asarray(self.action_space.low_arr)
            high = jnp.asarray(self.action_space.high_arr)
            act = 2.0 * (act - low) / (high - low) - 1.0
        if self.action_bound_method == "tanh":
            eps = 1e-6
            act = jnp.arctanh(jnp.clip(act, -1 + eps, 1 - eps))
        return act

    def compute_action(self, ts: TrainState, obs: np.ndarray, key: jax.Array | None = None) -> np.ndarray:
        """Single-observation inference helper (reference :317)."""
        if key is None:
            key = jax.random.key(0)
        obs_b = jnp.asarray(obs)[None]
        out = self.forward(ts, obs_b, key, deterministic=True)
        act = self.map_action(out.act)[0]
        return np.asarray(act)

    # ------------------------------------------------------------------
    # learning
    # ------------------------------------------------------------------
    #: buffer fields to skip when sampling inside :meth:`update` — set by
    #: algorithms whose preprocess/update_step provably never read them
    #: (e.g. the DQN family drops ``obs_next`` when n_step>1: targets come
    #: from the n-step terminal row, not the sampled row)
    update_sample_drop_keys: tuple[str, ...] = ()

    def preprocess(self, ts: TrainState, buffer, buf_state, batch: Batch, indices: jnp.ndarray, key: jax.Array) -> Batch:
        """Compute targets before the gradient step (n-step / GAE)."""
        return batch

    def update_step(self, ts: TrainState, batch: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        """One gradient step; returns (new_ts, loss stats Batch)."""
        raise NotImplementedError

    def postprocess(self, ts: TrainState, buffer, buf_state, batch: Batch, indices: jnp.ndarray, stats: Batch):
        """Write back per-sample info (PER priorities). Returns buf_state."""
        return buf_state

    def update(
        self,
        ts: TrainState,
        buffer,
        buf_state,
        key: jax.Array,
        batch_size: int,
    ) -> tuple[TrainState, Any, Batch]:
        """sample -> preprocess -> update_step -> postprocess, all pure
        (reference Algorithm._update orchestration, algorithm_base.py:586)."""
        k1, k2, k3 = jax.random.split(key, 3)
        # skip gathering fields the update never consumes (e.g. the DQN
        # family's sampled obs_next when n_step>1 — the frame-stacked pixel
        # gather is half the update cost, scripts/mfu_probe.py); HER buffers
        # keep the full batch since relabeling reads obs_next
        drop = self.update_sample_drop_keys
        if getattr(buffer, "relabels_on_sample", False):
            drop = ()
        batch, indices = buffer.sample(buf_state, k1, batch_size, drop_keys=drop)
        batch = self.preprocess(ts, buffer, buf_state, batch, indices, k2)
        ts, stats = self.update_step(ts, batch, k3)
        buf_state = self.postprocess(ts, buffer, buf_state, batch, indices, stats)
        return ts, buf_state, stats

    # ------------------------------------------------------------------
    # shared helpers
    # ------------------------------------------------------------------
    def _init_opt(self, params: Any) -> Any:
        return self.optim.init(params)

    def _apply_grads(
        self, optim: optax.GradientTransformation, params: Any, grads: Any, opt_state: Any
    ) -> tuple[Any, Any]:
        updates, opt_state = optim.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    @property
    def action_dim(self) -> int:
        if isinstance(self.action_space, Discrete):
            return self.action_space.n
        return int(np.prod(self.action_space.shape))

    def _nstep_terminal(self, buffer, buf_state, batch: Batch, indices: jnp.ndarray):
        """n-step reward chain + the terminal row's (obs_next, terminated).

        For n_step==1 the terminal row IS the sampled row, so the already-
        gathered batch is reused instead of re-gathering (on pixel rings a
        frame-stacked obs_next gather is the single most expensive kernel
        of the update). For n_step>1 only the two consumed fields are
        fetched (reference gathers whole transitions, algorithm_base.py:721
        — cheap there because numba reads row-wise from host RAM).

        Lives on the Algorithm base: offline Q-learners (e.g. DiscreteBCQ)
        compute the same bootstrapped targets from a static buffer.
        """
        base_state = buf_state.base if hasattr(buf_state, "base") else buf_state
        rews, ends, term_idx = buffer.n_step_gather(base_state, indices, self.n_step)
        if self.n_step == 1 and "obs_next" in batch:
            return rews, ends, batch.obs_next, batch.terminated
        terminal = buffer.get(buf_state, term_idx, keys=("obs_next", "terminated"))
        return rews, ends, terminal.obs_next, terminal.terminated


class OnPolicyAlgorithm(Algorithm):
    """Updates from full fresh rollouts (reference :828)."""

    run_mode = "on_policy"


class OffPolicyAlgorithm(Algorithm):
    """Updates from replayed minibatches (reference :868).

    Subclasses that define ``_target_q(ts, obs_next, key)`` get n-step
    bootstrapped targets for free via :meth:`preprocess` (the analogue of
    ``Algorithm.compute_nstep_return``, algorithm_base.py:721).
    """

    run_mode = "off_policy"
    n_step: int = 1

    def _target_q(self, ts: TrainState, obs_next: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        raise NotImplementedError

    def preprocess(self, ts, buffer, buf_state, batch: Batch, indices: jnp.ndarray, key: jax.Array) -> Batch:
        from tianshou_tpu.ops.returns import nstep_returns, value_mask

        if getattr(buffer, "relabels_on_sample", False):
            # HER: goals/rewards were rewritten at sample time. The buffer
            # attaches its relabel plan (her_new_goal/her_relabel) so the
            # n-step chain can be relabeled CONSISTENTLY with the sampled
            # batch — matching the reference, which rewrites the buffer in
            # place before compute_nstep_return (her.py:100 +
            # algorithm_base.py:721).
            new_goal = batch.pop("her_new_goal", None)
            relabel = batch.pop("her_relabel", None)
            if self.n_step == 1 or new_goal is None:
                # 1-step bootstrap straight off the relabeled batch
                tq = self._target_q(ts, batch.obs_next, key)
                mask = value_mask(batch.terminated.astype(jnp.float32))
                tq = tq * mask.reshape(mask.shape + (1,) * (tq.ndim - 1))
                rew = batch.rew.reshape(batch.rew.shape + (1,) * (tq.ndim - 1))
                batch.returns = (rew + self.gamma * tq).reshape(tq.shape) if tq.ndim > 1 else batch.rew + self.gamma * tq
                return batch
            base_state = buf_state.base if hasattr(buf_state, "base") else buf_state
            rews, ends, term_idx = buffer.n_step_gather_relabeled(
                base_state, indices, self.n_step, new_goal, relabel
            )
            terminal = buffer.get(buf_state, term_idx, keys=("obs_next", "terminated"))
            terminal.obs_next = terminal.obs_next.copy()
            terminal.obs_next.desired_goal = buffer._splice(
                new_goal, terminal.obs_next.desired_goal, relabel
            )
            tq = self._target_q(ts, terminal.obs_next, key)
            mask = value_mask(terminal.terminated.astype(jnp.float32))
            tq = tq * mask.reshape(mask.shape + (1,) * (tq.ndim - 1))
            batch.returns = nstep_returns(rews, ends, tq, self.gamma)
            return batch

        rews, ends, obs_next_t, terminated_t = self._nstep_terminal(buffer, buf_state, batch, indices)
        tq = self._target_q(ts, obs_next_t, key)
        mask = value_mask(terminated_t.astype(jnp.float32))
        tq = tq * mask.reshape(mask.shape + (1,) * (tq.ndim - 1))
        batch.returns = nstep_returns(rews, ends, tq, self.gamma)
        return batch


class OfflineAlgorithm(Algorithm):
    """Updates from a fixed dataset (reference :906)."""

    run_mode = "offline"
