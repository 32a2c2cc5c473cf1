"""Optimizer factories (reference tianshou/algorithm/optim.py).

The reference wraps torch optimizers in factories (``AdamOptimizerFactory:89``
etc.) and composes gradient clipping inside ``Algorithm.Optimizer.step``
(algorithm_base.py:484-500: clip-by-norm BEFORE the optimizer update). Here a
factory returns an ``optax.GradientTransformation`` chain with the same
ordering, plus the linear LR decay used across the reference's examples
(``LRSchedulerFactoryLinear`` optim.py:22).
"""

from __future__ import annotations

import optax

__all__ = ["AdamOptimizerFactory", "RMSpropOptimizerFactory", "SGDOptimizerFactory", "linear_lr_schedule"]


def _with_clip(tx: optax.GradientTransformation, max_grad_norm: float | None) -> optax.GradientTransformation:
    if max_grad_norm is None:
        return tx
    return optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)


def linear_lr_schedule(lr: float, total_updates: int) -> optax.Schedule:
    """lr * (1 - t/total): reference LRSchedulerFactoryLinear (optim.py:22)."""
    return optax.linear_schedule(lr, 0.0, total_updates)


def AdamOptimizerFactory(
    lr: float | optax.Schedule = 1e-3,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    max_grad_norm: float | None = None,
) -> optax.GradientTransformation:
    """torch.optim.Adam-equivalent defaults (reference optim.py:89)."""
    if weight_decay:
        tx = optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
    else:
        tx = optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    return _with_clip(tx, max_grad_norm)


def RMSpropOptimizerFactory(
    lr: float | optax.Schedule = 1e-2,
    alpha: float = 0.99,
    eps: float = 1e-8,
    max_grad_norm: float | None = None,
) -> optax.GradientTransformation:
    """torch.optim.RMSprop-equivalent (reference optim.py:113)."""
    return _with_clip(optax.rmsprop(lr, decay=alpha, eps=eps), max_grad_norm)


def SGDOptimizerFactory(
    lr: float | optax.Schedule = 1e-2,
    momentum: float = 0.0,
    max_grad_norm: float | None = None,
) -> optax.GradientTransformation:
    return _with_clip(optax.sgd(lr, momentum=momentum), max_grad_norm)
