"""Monte-Carlo / grid quadrature helpers (device-side, psum-safe means).

Mirrors the reference's grid-average integrals (``integral_mean`` /
``inner_product`` / ``normalize``,
``/root/reference/Schrodinger_Equations/Kramers_Henneberger/KH_1D.py:127-135``)
and the sign-ambiguous eigenfunction metric
(``IPW_1D_WAN.py:213-216``).  All reductions are plain ``jnp.mean`` so that
under ``jit`` + batch sharding XLA lowers them to psum-reduced means,
bit-matching an unsharded run.
"""

from __future__ import annotations

import jax.numpy as jnp


def integral_mean(f, volume):
    """``volume * mean(f)`` — grid-average approximation of the integral."""
    return volume * jnp.mean(f)


def inner_product(u, v, volume):
    """Approximate L2 inner product ``<u, v>`` over a domain of given volume."""
    return integral_mean(u * v, volume)


def normalize_l2(u, volume, eps=1e-12):
    """Normalise ``u`` to unit L2 norm under the grid-average quadrature."""
    return u / jnp.sqrt(integral_mean(u * u, volume) + eps)


def sign_aware_mse(u, v):
    """``min(mean((u-v)^2), mean((u+v)^2))`` — eigenfunction gauge-free MSE."""
    return jnp.minimum(jnp.mean((u - v) ** 2), jnp.mean((u + v) ** 2))


def trapezoid_weights(n, dtype=jnp.float32):
    """Composite trapezoid weights on a uniform grid of ``n`` points (unit dx)."""
    w = jnp.ones((n,), dtype)
    return w.at[0].set(0.5).at[-1].set(0.5)
