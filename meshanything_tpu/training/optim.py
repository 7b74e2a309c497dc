"""Optimizer factory for full-scale training.

The reference releases no training code (README.md:123 open TODO); this
encodes the recipe measured to actually work at 350M on this hardware
(training/synthetic_grammar.py full_scale_probe):

  * global-norm clipping 1.0 — without it, any lr that learns
    (>= 2e-4 at 350M) reaches loss ~1.2 within 50 steps and then
    explodes;
  * linear warmup into cosine decay — cold-starting adamw at full lr
    on a 350M init throws the first steps' huge normalized updates at
    random features;
  * adamw b2=0.95, eps=1e-8 — the standard large-transformer moments
    (b2=0.99/eps=1e-6 was measurably more plateau-prone on the probe).

The train-step donation pattern matters as much as the optimizer:
jit with donate_argnums on the TrainState, or params + both adam
moments exist twice per step (~12 GB at 350M — OOMs a v5e).
"""
from __future__ import annotations

from typing import Optional

import optax


def make_optimizer(
    lr: float = 5e-4,
    *,
    steps: Optional[int] = None,
    warmup_steps: Optional[int] = None,
    clip_norm: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.95,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
    end_lr_fraction: float = 0.1,
) -> optax.GradientTransformation:
    """clip + warmup-cosine + adamw, the measured-stable 350M recipe.

    steps: total schedule length. None = constant lr after warmup
    (open-ended training); warmup defaults to min(50, steps//10).
    """
    if warmup_steps is None:
        warmup_steps = min(50, max((steps or 500) // 10, 1))
    if steps is None:
        schedule = optax.linear_schedule(0.0, lr, warmup_steps)
    else:
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr, warmup_steps=warmup_steps,
            decay_steps=max(steps, 2), end_value=lr * end_lr_fraction)
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(schedule, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay),
    )
