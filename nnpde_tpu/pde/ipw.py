"""Infinite potential well physics (1D and 2D separable eigenstates).

Mirrors ``IPW_1D_PINN_DRM.py:21-22`` (psi_n), ``IPW_1D_WAN.py:26-29``
(energies), ``IPW_2D.py:69-71`` (2D product states with coefficient 2/L),
and the analytic node positions ``k L / n`` used by the FN technique
(``IPW_1D_PINN_DRM.py:40-42``, ``IPW_2D.py:97-108``).
Units: hbar = m = 1.
"""

from __future__ import annotations

import math
from typing import List

import jax.numpy as jnp


def psi_1d(n: int, x, L: float):
    """sqrt(2/L) sin(n pi x / L) on [0, L]."""
    return jnp.sqrt(2.0 / L) * jnp.sin(n * jnp.pi * x / L)


def energy_1d(n: int, L: float) -> float:
    return (n * math.pi) ** 2 / (2.0 * L**2)


def psi_2d(nx: int, ny: int, x, y, L: float):
    """(2/L) sin(nx pi x/L) sin(ny pi y/L) — reference IPW_2D.py:69-71."""
    return (2.0 / L) * jnp.sin(nx * jnp.pi * x / L) * jnp.sin(ny * jnp.pi * y / L)


def energy_2d(nx: int, ny: int, L: float) -> float:
    return energy_1d(nx, L) + energy_1d(ny, L)


def nodes(n: int, L: float) -> List[float]:
    """Interior node positions of psi_n: k L / n, k = 1..n-1."""
    return [k * L / n for k in range(1, n)]


def psi_3d(nx: int, ny: int, nz: int, x, y, z, L: float):
    """Normalised 3D box eigenstate: product of 1D states (separable
    potential — the 2D construction of IPW_2D.py:69-71 one dimension up)."""
    return psi_1d(nx, x, L) * psi_1d(ny, y, L) * psi_1d(nz, z, L)


def energy_3d(nx: int, ny: int, nz: int, L: float) -> float:
    return energy_1d(nx, L) + energy_1d(ny, L) + energy_1d(nz, L)
