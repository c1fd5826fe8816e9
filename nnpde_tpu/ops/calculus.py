"""Per-point differential operators via forward-over-reverse autodiff.

The reference computes Laplacians with a Python loop of second-order
``torch.autograd.grad`` calls, one reverse pass per coordinate
(``/root/reference/Poisson_Equations/Poisson_ND.py:61-71``).  Here the
Hessian trace is formed as d JVPs of the gradient (forward-over-reverse),
vmapped over coordinate directions and over the collocation batch, and the
whole thing is one XLA-fused program.  For the MLP hot path prefer the
analytically fused propagation in :mod:`nnpde_tpu.ops.fwdlap`; this module is
the fully general fallback (arbitrary scalar fields) and the correctness
oracle the fused path is tested against.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def value_and_grad_x(u_fn):
    """``u_fn: (d,) -> scalar``  ->  ``x -> (u, grad (d,))``."""
    return jax.value_and_grad(u_fn)


def batched_value_and_grad_x(u_fn):
    """Batched: ``(N, d) -> (u (N,), grad (N, d))``."""
    return jax.vmap(jax.value_and_grad(u_fn))


def value_grad_lap(u_fn):
    """``u_fn: (d,) -> scalar``  ->  ``x -> (u, grad (d,), laplacian)``.

    Laplacian = trace of the Hessian, computed as d forward-mode directional
    derivatives of the reverse-mode gradient (one JVP per basis vector,
    vmapped so XLA sees a single batched program).
    """
    grad_fn = jax.grad(u_fn)

    def f(x):
        d = x.shape[-1]
        eye = jnp.eye(d, dtype=x.dtype)
        g_rep, dg = jax.vmap(lambda e: jax.jvp(grad_fn, (x,), (e,)))(eye)
        lap = jnp.trace(dg)
        return u_fn(x), g_rep[0], lap

    return f


def batched_value_grad_lap(u_fn):
    """Batched: ``(N, d) -> (u (N,), grad (N, d), lap (N,))``."""
    return jax.vmap(value_grad_lap(u_fn))
