"""Quantum harmonic oscillator physics (omega = sqrt(2), hbar = m = 1).

Mirrors ``QHO_1D_PINN_DRM.py:25-53`` (Hermite recurrence, exact states,
potential, energies) and the analytic node tables used by the FN technique
(``QHO_1D_PINN_DRM.py:114-133``, ``QHO_2D.py:116-143``).  Nodes are computed
from numpy Hermite roots instead of hard-coded tables — identical values for
n <= 5 and valid for any n.
"""

from __future__ import annotations

import math
from typing import List

import jax.numpy as jnp
import numpy as np

OMEGA = math.sqrt(2.0)


def phys_hermite(n: int, z):
    """Physicists' Hermite polynomial H_n(z) by the standard recurrence
    (static n, unrolled at trace time)."""
    if n == 0:
        return jnp.ones_like(z)
    if n == 1:
        return 2.0 * z
    h_nm2 = jnp.ones_like(z)
    h_nm1 = 2.0 * z
    for k in range(2, n + 1):
        h_n = 2.0 * z * h_nm1 - 2.0 * (k - 1) * h_nm2
        h_nm2, h_nm1 = h_nm1, h_n
    return h_nm1


def psi_1d(n: int, x, omega: float = OMEGA):
    """Normalised QHO eigenstate psi_n(x)."""
    hn = phys_hermite(n, math.sqrt(omega) * x)
    norm = (omega / math.pi) ** 0.25 / math.sqrt(2.0**n * math.factorial(n))
    return norm * hn * jnp.exp(-omega * x * x / 2.0)


def psi_2d(nx: int, ny: int, x, y, omega: float = OMEGA):
    return psi_1d(nx, x, omega) * psi_1d(ny, y, omega)


def potential_1d(x, omega: float = OMEGA):
    return 0.5 * omega**2 * x * x


def potential_2d(x, y, omega: float = OMEGA):
    return 0.5 * omega**2 * (x * x + y * y)


def energy_1d(n: int, omega: float = OMEGA) -> float:
    return (n + 0.5) * omega


def energy_2d(nx: int, ny: int, omega: float = OMEGA) -> float:
    return (nx + ny + 1.0) * omega


def nodes(n: int, omega: float = OMEGA) -> List[float]:
    """Zeros of psi_n: Hermite roots of H_n scaled by 1/sqrt(omega).

    For omega = sqrt(2) this reproduces the reference tables exactly
    (e.g. n=2 -> +-2^{-3/4}, QHO_1D_PINN_DRM.py:118).
    """
    if n == 0:
        return []
    coeffs = np.zeros(n + 1)
    coeffs[n] = 1.0
    roots = np.polynomial.hermite.hermroots(coeffs)
    return sorted(float(r) / math.sqrt(omega) for r in roots)
