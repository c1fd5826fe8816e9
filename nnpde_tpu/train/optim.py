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
    decay_steps: int = 0,
) -> optax.GradientTransformation:
    """schedule in {constant, cosine, exponential}; warmup (if any) applies
    uniformly as a linear ramp before the named schedule.

    ``decay_steps`` (cosine/exponential): decay horizon when shorter than
    ``total_steps`` — past it the lr HOLDS at ``final_scale * lr``
    (optax's cosine semantics).  Motivated by the 2D WAN minimax: all the
    accuracy gain happens in the decayed-lr regime, but stretching one
    cosine over a 2x horizon keeps the lr high too long and REGRESSES
    (artifacts/wan_floor_screen.json eg_twotime_60k vs eg_twotime), and
    restarting a fresh schedule from the best iterate also regresses
    (staged_* rows) — decay fast, then hold."""
    horizon = decay_steps if decay_steps > 0 else total_steps
    if schedule == "constant":
        sched = optax.constant_schedule(lr)
    elif schedule == "cosine":
        sched = optax.cosine_decay_schedule(
            lr, decay_steps=max(horizon - warmup, 1), alpha=final_scale
        )
    elif schedule == "exponential":
        sched = optax.exponential_decay(
            lr, transition_steps=max(horizon - warmup, 1),
            decay_rate=final_scale, end_value=final_scale * lr,
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
    decay_steps: int = 0,
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
    u_opt = make_optimizer(lr, schedule=schedule, total_steps=epochs,
                           decay_steps=decay_steps, **kw)
    v_opt = make_optimizer(
        v_lr if v_lr is not None else lr,
        schedule=schedule, total_steps=epochs * v_steps,
        decay_steps=decay_steps * v_steps, **kw,
    )
    return u_opt, v_opt
