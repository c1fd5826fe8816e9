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


def make_wan_optimizers(
    lr: float,
    *,
    v_lr: float | None = None,
    schedule: str = "constant",
    epochs: int,
    v_steps: int,
    **kw,
):
    """Consistent (primal, critic) optimizer pair for fit_wan.

    The critic takes ``v_steps`` inner updates per epoch, so its schedule
    horizon must be ``epochs * v_steps`` — sizing it ``epochs`` decays the
    critic lr v_steps-times too fast and de-synchronises the minimax
    annealing (the round-1 ``fixedcritic`` regression, ACCEPTANCE.json).
    This helper is the one place that invariant lives; WAN call sites
    should build their optimizers here.

    ``v_lr``: two-timescale GDA — a faster critic (e.g. 2-4x; the KH
    reference uses 2x, KH_1D.py:336) measurably lowers the 2D WAN floor
    (artifacts/wan_floor_screen.json).
    """
    u_opt = make_optimizer(lr, schedule=schedule, total_steps=epochs, **kw)
    v_opt = make_optimizer(
        v_lr if v_lr is not None else lr,
        schedule=schedule, total_steps=epochs * v_steps, **kw,
    )
    return u_opt, v_opt
