"""N-D Poisson problem physics: manufactured prod-sin solution and RHS.

Mirrors ``/root/reference/Poisson_Equations/Poisson_ND.py:49-58``:
``u*(x) = prod_i sin(k_i pi x_i / L)`` on ``[0, L]^d`` with
``-lap u* = f = sum_i (k_i pi / L)^2 u*``.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp


def exact_u_prod_sin(X, L: float, ks: Sequence[int]):
    """X (N, d) -> u* (N,)."""
    vals = jnp.stack(
        [jnp.sin(k * jnp.pi * X[..., i] / L) for i, k in enumerate(ks)], axis=-1
    )
    return jnp.prod(vals, axis=-1)


def rhs_f_for_u_sin(X, L: float, ks: Sequence[int]):
    """Manufactured RHS for ``-lap u = f``."""
    s = sum((k * math.pi / L) ** 2 for k in ks)
    return s * exact_u_prod_sin(X, L, ks)


def exact_u_prod_cos(X, L: float, ks: Sequence[int]):
    """``u*(x) = prod_i cos(k_i pi x_i / L)`` — zero-Neumann manufactured
    solution (du*/dn = 0 on every face for integer k, and mean zero).

    The reference README advertises Neumann support (README.md:23) but
    Poisson_ND.py implements only Dirichlet (SURVEY.md §2.3 defect list);
    this family completes the capability.
    """
    vals = jnp.stack(
        [jnp.cos(k * jnp.pi * X[..., i] / L) for i, k in enumerate(ks)], axis=-1
    )
    return jnp.prod(vals, axis=-1)


def rhs_f_for_u_cos(X, L: float, ks: Sequence[int]):
    s = sum((k * math.pi / L) ** 2 for k in ks)
    return s * exact_u_prod_cos(X, L, ks)
