"""L-BFGS polish after Adam, matching the reference's optional
``torch.optim.LBFGS(..., line_search_fn='strong_wolfe')`` closure step
(IPW_1D_PINN_DRM.py:143,182-201; IPW_2D.py:169-170,271-312;
QHO_1D_PINN_DRM.py:438-439 where it replaces Adam entirely).

Implemented with ``optax.lbfgs`` (zoom linesearch satisfying the strong
Wolfe conditions) driven by ``optax.value_and_grad_from_state`` so cached
line-search evaluations are reused, iterated under ``lax.while_loop`` with a
gradient-norm stopping rule.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
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
