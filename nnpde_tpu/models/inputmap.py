"""Elementwise input feature maps with analytic jets — hard Neumann BCs.

The reference enforces Dirichlet BCs hard by MULTIPLYING the net by a
vanishing trial factor (``Poisson_ND.py:378-384``); its Neumann support is
README-only (``/root/reference/README.md:23``).  An output factor cannot
hard-enforce a *derivative* condition, but an INPUT map can: compose
``u(x) = g(z(x))`` with elementwise features ``z_i(x_i)`` whose derivative
vanishes on the boundary.  By the chain rule

    du/dx_i = (dg/dz_i) * z_i'(x_i)  = 0   wherever z_i' = 0,

for EVERY network g — zero normal derivative on all faces, exactly, with
no penalty term and nothing for the optimiser to trade off.

:class:`CosineInputMap` uses ``z_i = cos(pi (x_i - lo)/(hi - lo))``:
``z_i'`` vanishes at both faces, the map is a diffeomorphism of the open
box onto (-1, 1)^d (so no information is lost), and for the zero-Neumann
manufactured family ``u* = prod_i cos(k pi x_i / L)`` the exact solution
becomes a polynomial in the features (a Chebyshev-like basis) — measured
to turn the failing soft-Neumann 5D DRM row (1.2e-2 at 20k epochs) into a
passing one.

Jets: the forward-Laplacian recurrence only needs the seed
``(z, z', z'')`` per coordinate (:func:`nnpde_tpu.ops.fwdlap.mlp_fwdlap`
``input_jet=``) because elementwise maps have a DIAGONAL Jacobian:
lap_x u = sum_i [ g_{z_i z_i} (z_i')^2 + g_{z_i} z_i'' ] is exactly what
the recurrence propagates when seeded with (diag(z') as the Jacobian
rows, z'' as the Laplacian stream).
"""

from __future__ import annotations

import jax.numpy as jnp


class CosineInputMap:
    """``z_i = cos(pi (x_i - lo) / (hi - lo))`` per coordinate.

    ``z' = -w sin(w (x - lo))`` with ``w = pi/(hi - lo)`` vanishes at
    ``x = lo`` and ``x = hi`` — hard zero-Neumann on the box faces.
    """

    def __init__(self, dim: int, lo: float = 0.0, hi: float = 1.0):
        if hi <= lo:
            raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
        self.dim = int(dim)
        self.lo = float(lo)
        self.w = jnp.pi / (float(hi) - float(lo))

    def value(self, X):
        """Features for (..., d) inputs (elementwise, shape-preserving)."""
        return jnp.cos(self.w * (X - self.lo))

    def jet(self, X):
        """(z, z', z'') each shaped like ``X`` — the fwdlap input seed."""
        t = self.w * (X - self.lo)
        z = jnp.cos(t)
        z1 = -self.w * jnp.sin(t)
        z2 = -(self.w**2) * z
        return z, z1, z2
