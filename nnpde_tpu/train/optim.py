"""Optimizer construction: Adam with optional learning-rate schedules.

The reference uses constant-lr Adam everywhere (lr=1e-3, Poisson_ND.py:177).
Schedules are a framework addition that matters for the variance-limited
methods (DRM's Monte-Carlo energy gradient, WAN's minimax): cosine decay
lets the iterates settle instead of diffusing at the noise floor.
"""

from __future__ import annotations

import optax


def make_optimizer(
    lr: float,
    *,
    schedule: str = "constant",
    total_steps: int = 0,
    final_scale: float = 0.01,
    warmup: int = 0,
) -> optax.GradientTransformation:
    """schedule in {constant, cosine, exponential}; warmup (if any) applies
    uniformly as a linear ramp before the named schedule."""
    if schedule == "constant":
        sched = optax.constant_schedule(lr)
    elif schedule == "cosine":
        sched = optax.cosine_decay_schedule(
            lr, decay_steps=max(total_steps - warmup, 1), alpha=final_scale
        )
    elif schedule == "exponential":
        sched = optax.exponential_decay(
            lr, transition_steps=max(total_steps - warmup, 1),
            decay_rate=final_scale,
        )
    else:
        raise ValueError(f"Unknown lr schedule {schedule!r}")
    if warmup > 0:
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup), sched], [warmup]
        )
    return optax.adam(sched)
