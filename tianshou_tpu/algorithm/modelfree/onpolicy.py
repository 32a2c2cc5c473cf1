"""Shared on-policy actor(-critic) machinery.

Rebuild of the reference's ``ProbabilisticActorPolicy`` (modelfree/
reinforce.py:68) + ``ActorCriticOnPolicyAlgorithm`` (modelfree/a2c.py:32):
distribution construction from actor output, GAE over the rollout, and the
repeat x minibatch update loop (trainer.py:1106, batch.py:1199 split) — all
fused into a single jitted ``update_rollout`` with nested ``lax.scan``:
outer scan over repeats, inner scan over shuffled minibatches.

The rollout never enters a replay buffer: time-major [T, E] arrays from the
collector feed GAE directly (SURVEY.md §7 design translation, row 3).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tianshou_tpu.algorithm.base import ActOut, OnPolicyAlgorithm, TrainState
from tianshou_tpu.data.batch import Batch
from tianshou_tpu.env.core import Discrete, Space
from tianshou_tpu.models.distributions import Categorical, Normal
from tianshou_tpu.ops.returns import gae_advantages

__all__ = ["OnPolicyActorCritic"]


class OnPolicyActorCritic(OnPolicyAlgorithm):
    def __init__(
        self,
        actor: nn.Module,
        critic: nn.Module | None,
        action_space: Space,
        optim: optax.GradientTransformation | None = None,
        gamma: float = 0.99,
        gae_lambda: float = 0.95,
        return_standardization: bool = False,
        advantage_normalization: bool = False,
        ent_coef: float = 0.0,
        vf_coef: float = 0.5,
        deterministic_eval: bool = False,
        sde_sample_freq: int = 4,
        **kwargs: Any,
    ) -> None:
        kwargs.setdefault("action_scaling", not isinstance(action_space, Discrete))
        super().__init__(action_space=action_space, gamma=gamma, optim=optim, **kwargs)
        self.actor = actor
        self.critic = critic
        self.gae_lambda = gae_lambda
        self.return_standardization = return_standardization
        self.advantage_normalization = advantage_normalization
        self.ent_coef = ent_coef
        self.vf_coef = vf_coef
        self.deterministic_eval = deterministic_eval
        # gSDE noise-resample cadence in env steps (paper arXiv:2005.05719:
        # PPO needs periodic resampling — a rollout-frozen eps collapses the
        # per-update noise diversity to num_envs draws)
        self.sde_sample_freq = sde_sample_freq

    # ------------------------------------------------------------------
    def init(self, key: jax.Array, obs_example: jnp.ndarray) -> TrainState:
        from tianshou_tpu.algorithm.base import batch_obs_example
        obs = batch_obs_example(obs_example)
        k1, k2 = jax.random.split(key)
        params = {"actor": self.actor.init(k1, obs)}
        if self.critic is not None:
            params["critic"] = self.critic.init(k2, obs)
        extra = Batch()
        if self.return_standardization:
            # running return statistics (reference A2C ret_rms, a2c.py:112;
            # reinforce.py DiscountedReturnComputation)
            extra = Batch(
                ret_mean=jnp.float32(0.0),
                ret_var=jnp.float32(1.0),
                ret_count=jnp.float32(1e-4),
            )
        return TrainState(
            params=params,
            target_params={},
            opt_state=self.optim.init(params),
            hparams=Batch(),
            extra=extra,
            step=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    @property
    def _sde(self) -> bool:
        """gSDE actor (arXiv:2005.05719): actor returns (mu, sigma(s), feat)
        and the collector carries a per-env exploration-noise matrix."""
        return bool(getattr(self.actor, "sde", False))

    def _dist(self, params: Any, obs: jnp.ndarray):
        out = self.actor.apply(params["actor"], obs)
        if self.is_discrete:
            return Categorical(logits=out)
        if self._sde:
            mu, sigma, _feat = out
        else:
            mu, sigma = out
        return Normal(loc=mu, scale=sigma)

    def _value(self, params: Any, obs: jnp.ndarray) -> jnp.ndarray:
        v = self.critic.apply(params["critic"], obs)
        return v.reshape(v.shape[0])

    def forward(self, ts: TrainState, obs: jnp.ndarray, key: jax.Array, state=None, deterministic: bool = False) -> ActOut:
        if self._sde and not self.is_discrete:
            mu, sigma, feat = self.actor.apply(ts.params["actor"], obs)
            if deterministic and self.deterministic_eval:
                act = mu
            elif state is None:
                # no carried noise (single-shot inference): iid sample from
                # the marginal — identical in distribution to one SDE step
                act = Normal(loc=mu, scale=sigma).sample(key)
            else:
                # resample eps every sde_sample_freq steps (per-step key is
                # already unique along the scan), then
                # act = mu + feat^T (eps * exp(log_sigma)): marginally
                # N(mu, sigma(s)^2) with eps ~ N(0,1) held between resamples
                E = state.eps.shape[0]
                fresh = self._sde_eps(E, jax.random.fold_in(key, 0x5DE))
                resample = (state.count % self.sde_sample_freq) == 0
                eps = jnp.where(resample.reshape(E, 1, 1), fresh, state.eps)
                log_sigma = ts.params["actor"]["params"]["log_sigma_mat"]
                sig_mat = jnp.exp(jnp.clip(log_sigma, -20.0, 2.0))
                act = mu + jnp.einsum("bf,bfa,fa->ba", feat, eps, sig_mat)
                state = Batch(eps=eps, count=state.count + 1)
            return ActOut(act=act, state=state, info=Batch())
        dist = self._dist(ts.params, obs)
        if deterministic and self.deterministic_eval:
            act = dist.mode()
        else:
            act = dist.sample(key)
        if self.is_discrete:
            act = act.astype(jnp.int32)
        return ActOut(act=act, state=state, info=Batch())

    # ------------------------------------------------------------------
    # gSDE exploration-noise state (collector carry hooks, base.py):
    # Batch(eps [E, F, A] standard normal, count [E] steps since resample)
    def _sde_eps(self, num_envs: int, key: jax.Array) -> jnp.ndarray:
        F, A = self.actor.hidden_sizes[-1], self.actor.action_dim
        return jax.random.normal(key, (num_envs, F, A))

    def _sde_noise(self, num_envs: int, key: jax.Array) -> Batch:
        return Batch(
            eps=self._sde_eps(num_envs, key),
            count=jnp.zeros(num_envs, jnp.int32),
        )

    def init_policy_state(self, num_envs: int):
        if not self._sde:
            return super().init_policy_state(num_envs)
        # fixed-key init: immediately resampled at count==0 in forward, so
        # only determinism of reset() matters
        return self._sde_noise(num_envs, jax.random.key(0))

    def reset_policy_state(self, num_envs: int, key: jax.Array):
        if not self._sde:
            return super().reset_policy_state(num_envs, key)
        # episode end: restart the resample schedule (eps itself is drawn
        # fresh at the next forward since count resets to 0)
        return self._sde_noise(num_envs, key)

    def refresh_policy_state(self, state, num_envs: int, key: jax.Array):
        if not self._sde or state is None:
            return state
        return self._sde_noise(num_envs, key)

    # ------------------------------------------------------------------
    def process_rollout(self, ts: TrainState, rollout: Batch, key: jax.Array) -> Batch:
        """Time-major rollout [T, E] -> flat training batch with targets.

        GAE mirrors reference ``_add_returns_and_advantages`` (a2c.py:115)
        incl. truncation-aware bootstrapping; the rollout boundary cuts the
        advantage chain like the reference's unfinished-index handling
        (algorithm_base.py:676-690).
        """
        T, E = rollout.rew.shape

        def flat(x):  # merge the [T, E] leading axes (works for Batch obs too)
            return jax.tree.map(lambda a: a.reshape((T * E,) + a.shape[2:]), x)

        obs_flat = flat(rollout.obs)
        obs_next_flat = flat(rollout.obs_next)
        term = rollout.terminated.astype(jnp.float32)
        trunc = rollout.truncated.astype(jnp.float32)
        end = jnp.maximum(term, trunc).at[-1].set(1.0)  # cut chain at boundary

        batch = Batch(
            obs=obs_flat,
            act=flat(rollout.act),
            rew=rollout.rew.reshape(T * E),
        )
        if self.critic is not None:
            v_s = self._value(ts.params, obs_flat).reshape(T, E)
            v_s_ = self._value(ts.params, obs_next_flat).reshape(T, E)
            if self.return_standardization:
                # reference return scaling (a2c.py:115-152): the critic is
                # trained in RUNNING-std-scaled space (no mean subtraction,
                # matching OpenAI baselines); un-scale values for GAE so
                # deltas are consistent with raw rewards, then re-scale the
                # targets. Stats update happens in update_rollout via
                # batch.unnorm_returns.
                scale = jnp.sqrt(ts.extra.ret_var + 1e-8)
                adv = gae_advantages(
                    rollout.rew, v_s * scale, v_s_ * scale, term, end,
                    self.gamma, self.gae_lambda,
                )
                unnorm = adv + v_s * scale
                batch.v_s = v_s.reshape(T * E)
                batch.adv = adv.reshape(T * E)
                batch.returns = (unnorm / scale).reshape(T * E)
                batch.unnorm_returns = unnorm.reshape(T * E)
            else:
                adv = gae_advantages(rollout.rew, v_s, v_s_, term, end, self.gamma, self.gae_lambda)
                batch.v_s = v_s.reshape(T * E)
                batch.adv = adv.reshape(T * E)
                batch.returns = (adv + v_s).reshape(T * E)
        else:
            from tianshou_tpu.ops.returns import mc_return_to_go

            ret = mc_return_to_go(rollout.rew, self.gamma, end)
            batch.returns = ret.reshape(T * E)
            batch.adv = batch.returns
            if self.return_standardization:
                # REINFORCE standardizes with the running statistics
                # (reference reinforce.py:249 DiscountedReturnComputation)
                r = batch.returns
                std = jnp.sqrt(ts.extra.ret_var + 1e-8)
                batch.unnorm_returns = r
                batch.returns = (r - ts.extra.ret_mean) / std
                batch.adv = batch.returns
        # old log-probs + dist params for ratio/KL methods
        # (reference ppo.py:157 logp_old; npg.py dist_old)
        dist = self._dist(ts.params, batch.obs)
        batch.logp_old = dist.log_prob(batch.act)
        if self.is_discrete:
            batch.dist_old = Batch(logits=dist.logits)
        else:
            batch.dist_old = Batch(loc=dist.loc, scale=dist.scale)
        return batch

    def _dist_from_batch(self, b: Batch):
        if self.is_discrete:
            return Categorical(logits=b.logits)
        return Normal(loc=b.loc, scale=b.scale)

    # ------------------------------------------------------------------
    def loss_minibatch(self, params: Any, mb: Batch, key: jax.Array) -> tuple[jnp.ndarray, Batch]:
        """Override per algorithm; returns (scalar loss, stats Batch)."""
        raise NotImplementedError

    def _update_minibatch(self, ts: TrainState, mb: Batch, key: jax.Array) -> tuple[TrainState, Batch]:
        """One minibatch update; default = gradient step on loss_minibatch.
        NPG/TRPO override with natural-gradient steps."""
        (loss, stats), grads = jax.value_and_grad(self.loss_minibatch, has_aux=True)(
            ts.params, mb, key
        )
        new_params, new_opt = self._apply_grads(self.optim, ts.params, grads, ts.opt_state)
        ts = ts.replace(params=new_params, opt_state=new_opt, step=ts.step + 1)
        return ts, stats

    def update_return_stats(self, ts: TrainState, batch: Batch) -> TrainState:
        """Parallel-Welford merge of the rollout's unnormalized returns
        into the running statistics (reference ret_rms.update, a2c.py:149);
        pops ``unnorm_returns`` off the batch."""
        if "unnorm_returns" not in batch:
            return ts
        x = batch.pop("unnorm_returns")
        m, v, c = ts.extra.ret_mean, ts.extra.ret_var, ts.extra.ret_count
        bm, bv, bc = x.mean(), x.var(), jnp.float32(x.shape[0])
        delta = bm - m
        tot = c + bc
        new_mean = m + delta * bc / tot
        m2 = v * c + bv * bc + delta * delta * c * bc / tot
        extra = ts.extra.copy()
        extra.ret_mean, extra.ret_var, extra.ret_count = new_mean, m2 / tot, tot
        return ts.replace(extra=extra)

    def update_rollout(
        self, ts: TrainState, rollout: Batch, key: jax.Array, repeat: int, batch_size: int
    ) -> tuple[TrainState, Batch]:
        """repeat x shuffled minibatches, one jitted program
        (reference OnPolicyAlgorithm.update + PPO._update_with_batch)."""
        k_proc, k_loop = jax.random.split(key)
        batch = self.process_rollout(ts, rollout, k_proc)
        ts = self.update_return_stats(ts, batch)
        return self.run_minibatch_updates(ts, batch, k_loop, repeat, batch_size)

    def run_minibatch_updates(
        self, ts: TrainState, batch: Batch, k_loop: jax.Array, repeat: int, batch_size: int
    ) -> tuple[TrainState, Batch]:
        """The repeat x minibatch loop over an already-processed batch
        (exposed so dispatchers like MARL can mask between processing and
        updating)."""
        N = batch.rew.shape[0]
        n_mb = max(1, N // batch_size)
        mb_size = N // n_mb

        def repeat_body(carry, rkey):
            ts = carry
            k_perm, k_mb = jax.random.split(rkey)
            perm = jax.random.permutation(k_perm, N)[: n_mb * mb_size].reshape(n_mb, mb_size)

            def mb_body(ts, inp):
                idx, k = inp
                mb = batch[idx]
                if self.advantage_normalization:
                    mb.adv = (mb.adv - mb.adv.mean()) / (mb.adv.std() + 1e-8)
                return self._update_minibatch(ts, mb, k)

            ts, stats = jax.lax.scan(mb_body, ts, (perm, jax.random.split(k_mb, n_mb)))
            return ts, stats

        ts, stats = jax.lax.scan(repeat_body, ts, jax.random.split(k_loop, repeat))
        mean_stats = jax.tree.map(lambda x: x.mean(), stats)
        mean_stats.n_grad_steps = jnp.int32(repeat * n_mb)
        return ts, mean_stats
