"""Closed-form compactly-supported bump test function for WAN.

The reference builds ``w(x) = prod_i exp(1/(t_i^2-1))/I1`` with masked
``torch.where`` and then differentiates it with autograd, patching the NaNs
that the dead branch produces with ``nan_to_num``
(``/root/reference/Schrodinger_Equations/Infinite_Potential_Well/IPW_1D_WAN.py:31-59``,
``Poisson_Equations/Poisson_ND.py:74-88``).  Here the derivative is analytic —

    d/dt exp(1/(t^2-1)) = exp(1/(t^2-1)) * (-2t / (t^2-1)^2)

— evaluated on a clamped |t| so the exponent never overflows, and masked to
zero outside the support.  No autograd through a discontinuity, no NaNs.
"""

from __future__ import annotations

import jax.numpy as jnp

# Reference normalisation constant for the 1D bump integral
# (IPW_1D_WAN.py:34, Poisson_ND.py:78).
BUMP_I1 = 0.210987

# Keep |t| strictly inside the support so 1/(t^2-1) stays finite in f32.
_T_CLAMP = 1.0 - 1e-6


def bump_w_1d_jet(t):
    """(w, dw/dt, d2w/dt2) of the unit bump on t in (-1, 1), zero outside."""
    mask = jnp.abs(t) < 1.0
    tc = jnp.clip(t, -_T_CLAMP, _T_CLAMP)
    q = tc * tc - 1.0                       # in [-1, -1e-6)
    w = jnp.exp(1.0 / q) / BUMP_I1
    # d/dt [1/q] = -2t/q^2 ;  w' = w * (-2t/q^2)
    a = -2.0 * tc / (q * q)
    dw = w * a
    # w'' = w * (a^2 + a') with a' = (-2 q^2 + 2t * 2q * 2t)/q^4 = (-2q + 8t^2)/q^3
    a1 = (-2.0 * q + 8.0 * tc * tc) / (q * q * q)
    d2w = w * (a * a + a1)
    zero = jnp.zeros_like(t)
    return (
        jnp.where(mask, w, zero),
        jnp.where(mask, dw, zero),
        jnp.where(mask, d2w, zero),
    )


def bump_w(X, lo, hi):
    """N-D product bump on the box ``[lo, hi]^d`` and its gradient.

    Matches the reference semantics (product over dims of the 1D bump with
    ``t = (x - center)/h``), returning ``(w (N,), dw (N, d))``.
    """
    X = jnp.atleast_2d(X)
    h = (hi - lo) / 2.0
    center = (hi + lo) / 2.0
    t = (X - center) / h
    w1, dw1, _ = bump_w_1d_jet(t)           # (N, d) each; dw1 is d/dt
    dw1 = dw1 / h                            # chain rule to d/dx
    w = jnp.prod(w1, axis=1)
    # exclusive products for the gradient (safe at interior zeros)
    from .fwdlap import exclusive_products

    dw = dw1 * exclusive_products(w1)
    return w, dw


def bump_grid(lo: float, hi: float, d: int, k: int, overlap: float = 0.5):
    """Centres and half-widths of a k^d grid of localised bumps on the box
    [lo, hi]^d with fractional overlap between neighbours.

    Returns ``(centers (k^d, d), half_width scalar)``.  Used by the
    multi-test-function WAN (a framework extension beyond the reference's
    single global bump — one weak residual per localised test function).
    """
    import itertools

    cell = (hi - lo) / k
    h = cell * (1.0 + overlap) / 2.0
    marks = [lo + cell * (i + 0.5) for i in range(k)]
    centers = jnp.asarray(list(itertools.product(marks, repeat=d)),
                          jnp.float32)
    return centers, float(h)


def bump_w_multi(X, centers, half_width: float):
    """Localised bumps: ``w (K, N)``, ``dw (K, N, d)`` for K centres.

    Each bump is the product 1D bump on ``|x - c| < half_width`` per
    dimension (same profile as :func:`bump_w`, translated and scaled).
    """
    import jax

    from .fwdlap import exclusive_products

    X = jnp.atleast_2d(X)

    def one_center(c):
        t = (X - c[None, :]) / half_width
        w1, dw1, _ = bump_w_1d_jet(t)
        dw1 = dw1 / half_width
        w = jnp.prod(w1, axis=1)
        dw = dw1 * exclusive_products(w1)
        return w, dw

    w, dw = jax.vmap(one_center)(centers)
    return w, dw
