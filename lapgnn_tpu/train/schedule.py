"""Optimizer and LR schedule factory.

Matches the reference recipe: AdamW + linear-warmup cosine decay + global
grad-norm clip 1.0 (``/root/reference/gnn/train_one_gnn.py:101-124,344-376``),
built on optax.
"""

from __future__ import annotations

import optax

__all__ = ["warmup_cosine", "make_optimizer"]


def warmup_cosine(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    min_lr: float = 0.0,
) -> optax.Schedule:
    """Linear warmup to ``base_lr`` then cosine decay to ``min_lr``
    (WarmupCosineScheduler, train_one_gnn.py:101-124)."""
    warmup_steps = max(1, warmup_steps)
    total_steps = max(warmup_steps + 1, total_steps)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=base_lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=min_lr,
    )


def make_optimizer(
    lr: float | optax.Schedule,
    weight_decay: float = 1e-4,
    grad_clip: float = 1.0,
) -> optax.GradientTransformation:
    """AdamW with global-norm clipping (train_one_gnn.py:344-352, 253)."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr, weight_decay=weight_decay),
    )
