"""PPO (proximal policy optimization, arXiv:1707.06347).

Rebuild of reference ``modelfree/ppo.py:16``: clipped surrogate ratio, dual
clip, value clip, per-minibatch advantage normalization, entropy bonus.
``logp_old`` is computed once from the pre-update params
(reference ppo.py:157) inside the jitted ``update_rollout``."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tianshou_tpu.algorithm.modelfree.a2c import A2C
from tianshou_tpu.data.batch import Batch

__all__ = ["PPO"]


class PPO(A2C):
    def __init__(
        self,
        actor,
        critic,
        action_space,
        optim=None,
        eps_clip: float = 0.2,
        dual_clip: float | None = None,
        value_clip: bool = False,
        advantage_normalization: bool = True,
        recompute_advantage: bool = False,
        target_kl: float | None = None,
        **kwargs,
    ) -> None:
        super().__init__(
            actor=actor, critic=critic, action_space=action_space, optim=optim,
            advantage_normalization=advantage_normalization, **kwargs,
        )
        assert dual_clip is None or dual_clip > 1.0
        self.eps_clip = eps_clip
        self.dual_clip = dual_clip
        self.value_clip = value_clip
        self.recompute_advantage = recompute_advantage
        # KL guard: once a minibatch's approx_kl exceeds 1.5*target_kl, the
        # remaining minibatch updates of this rollout become no-ops (the
        # standard early-stop that prevents late-training policy collapse;
        # jit-compatible via masked updates instead of a break)
        self.target_kl = target_kl

    def update_rollout(self, ts, rollout, key, repeat: int, batch_size: int):
        """With ``recompute_advantage`` (reference ppo.py:152-177), GAE is
        recomputed with the freshly-updated critic before every repeat pass;
        otherwise defer to the single-process base implementation."""
        if not self.recompute_advantage:
            return super().update_rollout(ts, rollout, key, repeat, batch_size)
        import jax

        from tianshou_tpu.data.batch import Batch as _B

        key, k_first = jax.random.split(key)
        batch = self.process_rollout(ts, rollout, k_first)
        ts = self.update_return_stats(ts, batch)
        stats = None
        stopped = jnp.bool_(False)
        for r in range(repeat):
            key, k_proc, k_loop = jax.random.split(key, 3)
            if r > 0:
                # fresh critic -> fresh v_s/adv/returns, but logp_old /
                # dist_old stay from the COLLECTION-time policy (reference
                # ppo.py:152-177 recomputes only the advantage quantities)
                fresh = self.process_rollout(ts, rollout, k_proc)
                ts = self.update_return_stats(ts, fresh)
                batch.v_s = fresh.v_s
                batch.adv = fresh.adv
                batch.returns = fresh.returns
            if self.target_kl is None:
                ts, stats = self.run_minibatch_updates(ts, batch, k_loop, 1, batch_size)
            else:
                ts, stats, stopped = self._kl_guarded_updates(
                    ts, batch, k_loop, 1, batch_size, stopped
                )
        return ts, stats if stats is not None else _B()

    def run_minibatch_updates(self, ts, batch, k_loop, repeat: int, batch_size: int):
        if self.target_kl is None:
            return super().run_minibatch_updates(ts, batch, k_loop, repeat, batch_size)
        ts, stats, _ = self._kl_guarded_updates(
            ts, batch, k_loop, repeat, batch_size, jnp.bool_(False)
        )
        return ts, stats

    def _kl_guarded_updates(self, ts, batch, k_loop, repeat: int, batch_size: int, stopped):
        """Like the base repeat x minibatch loop, but with the target-KL
        early stop threaded through the scan carries: once tripped, later
        minibatch updates leave the train state unchanged."""
        N = batch.rew.shape[0]
        n_mb = max(1, N // batch_size)
        mb_size = N // n_mb
        threshold = 1.5 * self.target_kl

        def repeat_body(carry, rkey):
            ts, stopped = carry
            k_perm, k_mb = jax.random.split(rkey)
            perm = jax.random.permutation(k_perm, N)[: n_mb * mb_size].reshape(n_mb, mb_size)

            def mb_body(carry, inp):
                ts, stopped = carry
                idx, k = inp
                mb = batch[idx]
                if self.advantage_normalization:
                    mb.adv = (mb.adv - mb.adv.mean()) / (mb.adv.std() + 1e-8)
                new_ts, stats = self._update_minibatch(ts, mb, k)
                trip = stopped | (stats.approx_kl > threshold)
                ts = jax.tree.map(lambda a, b: jnp.where(trip, a, b), ts, new_ts)
                stats.kl_stop = trip.astype(jnp.float32)
                return (ts, trip), stats

            (ts, stopped), stats = jax.lax.scan(mb_body, (ts, stopped), (perm, jax.random.split(k_mb, n_mb)))
            return (ts, stopped), stats

        (ts, stopped), stats = jax.lax.scan(repeat_body, (ts, stopped), jax.random.split(k_loop, repeat))
        mean_stats = jax.tree.map(lambda x: x.mean(), stats)
        mean_stats.n_grad_steps = jnp.int32(repeat * n_mb)
        return ts, mean_stats, stopped

    def loss_minibatch(self, params, mb: Batch, key: jax.Array):
        dist = self._dist(params, mb.obs)
        logp = dist.log_prob(mb.act)
        ratio = jnp.exp(logp - mb.logp_old)
        surr1 = ratio * mb.adv
        surr2 = jnp.clip(ratio, 1.0 - self.eps_clip, 1.0 + self.eps_clip) * mb.adv
        if self.dual_clip is not None:
            clip1 = jnp.minimum(surr1, surr2)
            clip2 = jnp.maximum(clip1, self.dual_clip * mb.adv)
            clip_loss = -jnp.where(mb.adv < 0, clip2, clip1).mean()
        else:
            clip_loss = -jnp.minimum(surr1, surr2).mean()
        v = self._value(params, mb.obs)
        if self.value_clip:
            v_clip = mb.v_s + jnp.clip(v - mb.v_s, -self.eps_clip, self.eps_clip)
            vf1 = (mb.returns - v) ** 2
            vf2 = (mb.returns - v_clip) ** 2
            vf_loss = jnp.maximum(vf1, vf2).mean()
        else:
            vf_loss = ((mb.returns - v) ** 2).mean()
        ent = dist.entropy().mean()
        loss = clip_loss + self.vf_coef * vf_loss - self.ent_coef * ent
        return loss, Batch(
            loss=loss, clip_loss=clip_loss, vf_loss=vf_loss, entropy=ent,
            approx_kl=(mb.logp_old - logp).mean(),
        )
