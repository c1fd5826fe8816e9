"""L-BFGS: post-Adam polish and the from-scratch mode.

The reference uses ``torch.optim.LBFGS(..., line_search_fn='strong_wolfe')``
two ways: an optional closure step after/alongside Adam
(IPW_1D_PINN_DRM.py:143,182-201; IPW_2D.py:169-170,271-312) and — in QHO-1D —
*replacing* Adam entirely (QHO_1D_PINN_DRM.py:437-439).  :func:`lbfgs_polish`
is the former, :func:`lbfgs_fit` the latter (with the framework's device-side
best-metric tracking, which torch LBFGS runs never had).

Implemented with ``optax.lbfgs`` (zoom linesearch satisfying the strong
Wolfe conditions) driven by ``optax.value_and_grad_from_state`` so cached
line-search evaluations are reused, iterated under ``lax.while_loop`` with a
gradient-norm stopping rule.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax


def lbfgs_polish(
    loss_fn: Callable,          # (params,) -> scalar
    params,
    *,
    max_iter: int = 200,
    tol: float = 1e-10,
    memory_size: int = 100,
):
    """Run L-BFGS to (local) convergence; returns (params, final_loss)."""
    opt = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    def step(carry):
        params, state, _ = carry
        with jax.default_matmul_precision("highest"):
            value, grad = value_and_grad(params, state=state)
            updates, state = opt.update(
                grad, state, params, value=value, grad=grad, value_fn=loss_fn
            )
            params = optax.apply_updates(params, updates)
        return params, state, value

    def cond(carry):
        _, state, _ = carry
        count = optax.tree.get(state, "count")
        grad = optax.tree.get(state, "grad")
        gnorm = optax.global_norm(grad)
        # the freshly-initialised state caches a ZERO gradient — the norm
        # test must not fire before the first real step
        return (count < max_iter) & ((count == 0) | (gnorm > tol))

    init = (params, opt.init(params), jnp.asarray(jnp.inf))
    params, state, _ = jax.lax.while_loop(cond, step, init)
    # report the loss AT the returned iterate (the loop's carried value is
    # evaluated at the pre-update parameters)
    with jax.default_matmul_precision("highest"):
        value = loss_fn(params)
    return params, value


def lbfgs_fit(
    loss_fn: Callable,          # (params,) -> scalar
    eval_fn: Callable,          # (params,) -> scalar (lower = better)
    params,
    *,
    max_iter: int,
    tol: float = 1e-10,
    memory_size: int = 100,
    chunk: int = 200,
):
    """L-BFGS *instead of* Adam (QHO_1D_PINN_DRM.py:437-439), with per-step
    eval + device-resident best-iterate tracking like :func:`trainer.fit`.

    Returns a ``FitResult`` whose history has ``total``/``l2`` curves, one
    entry per L-BFGS iteration (each iteration may cost several function
    evaluations inside the zoom linesearch).  Once the gradient norm falls
    under ``tol`` the remaining iterations are no-ops (``lax.cond``), so a
    generous ``max_iter`` only pays compile time.
    """
    from .trainer import FitResult, tree_where

    opt = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    def real_step(params, state):
        value, grad = value_and_grad(params, state=state)
        updates, state = opt.update(
            grad, state, params, value=value, grad=grad, value_fn=loss_fn
        )
        return optax.apply_updates(params, updates), state, value

    def step(carry, it):
        params, state, done, best_m, best_p, best_e = carry
        with jax.default_matmul_precision("highest"):
            params, state, value = jax.lax.cond(
                done,
                lambda p, s: (p, s, loss_fn(p)),
                real_step,
                params, state,
            )
            m = eval_fn(params)
        gnorm = optax.global_norm(optax.tree.get(state, "grad"))
        count = optax.tree.get(state, "count")
        done = done | ((count > 0) & (gnorm <= tol))
        improved = m < best_m
        best_p = tree_where(improved, params, best_p)
        best_m = jnp.where(improved, m, best_m)
        best_e = jnp.where(improved, it, best_e)
        return (params, state, done, best_m, best_p, best_e), {
            "total": value, "l2": m,
        }

    scan = jax.jit(lambda carry, xs: jax.lax.scan(step, carry, xs))
    carry = (
        params, opt.init(params), jnp.asarray(False),
        jnp.asarray(jnp.inf, jnp.float32), params, jnp.asarray(-1, jnp.int32),
    )
    import time as _time

    t0 = _time.time()
    parts = []
    for start in range(0, max_iter, chunk):
        n = min(chunk, max_iter - start)
        carry, hist = scan(carry, jnp.arange(start, start + n))
        parts.append(hist)
    jax.block_until_ready(carry)
    elapsed = _time.time() - t0
    params, _, _, best_m, best_p, best_e = carry
    history = {
        k: np.concatenate([np.asarray(p[k]) for p in parts]) for k in parts[0]
    } if parts else {}
    return FitResult(
        params=params,
        best_params=best_p,
        best_metric=float(best_m),
        best_epoch=int(best_e),
        history=history,
        carry=carry,
        timing={"elapsed_s": elapsed,
                "steps_per_s": max_iter / elapsed if elapsed > 0 else float("nan")},
    )
