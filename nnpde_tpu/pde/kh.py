"""Kramers-Henneberger (laser-dressed soft-core atom) physics + FD ground truth.

Mirrors ``/root/reference/Schrodinger_Equations/Kramers_Henneberger/KH_1D.py``:

* soft-core potential ``V(x) = V0 exp(-sqrt(x^2+16)) / sqrt(x^2 + 6.27^2)``
  (KH_1D.py:23-24),
* cycle-averaged KH potential ``Vbar(x) = (1/2pi) int V(x + a0 sin th) dth``
  by a 500-point theta quadrature (KH_1D.py:32-39) — here evaluated **once**
  per collocation grid and cached, instead of re-running the quadrature
  inside every loss call per epoch (KH_1D.py:231,239,259),
* a float64 finite-difference reference eigensolver (KH_1D.py:46-82) — built
  tridiagonal and solved with ``scipy.linalg.eigh_tridiagonal`` (O(N) memory)
  rather than densifying to an (N-2)^2 matrix,
* a ground-truth container with device-side linear resampling
  (``jnp.interp`` replaces the host round-trip of KH_1D.py:85-90).
"""

from __future__ import annotations

import math
import jax.numpy as jnp
import numpy as np

V0_DEFAULT = -24.856


# ------------------------------------------------------------------ potentials
def v_base(x, v0: float = V0_DEFAULT):
    """Short-range bare soft-core potential (works on jnp or np arrays)."""
    xp = jnp if isinstance(x, jnp.ndarray) else np
    return v0 * xp.exp(-xp.sqrt(x * x + 16.0)) / xp.sqrt(x * x + 6.27**2)


def v_kh_shift(x, alpha: float = 0.0, v0: float = V0_DEFAULT):
    return v_base(x + alpha, v0)


def v_kh_avg(x, alpha0: float = 0.0, v0: float = V0_DEFAULT, n_theta: int = 500):
    """Cycle-averaged potential; reference uses an endpoint-inclusive uniform
    theta grid (KH_1D.py:35) which we reproduce for value parity."""
    if alpha0 == 0.0:
        return v_base(x, v0)
    xp = jnp if isinstance(x, jnp.ndarray) else np
    theta = xp.linspace(0.0, 2.0 * math.pi, n_theta)
    shifts = alpha0 * xp.sin(theta)
    vmat = v_base(x[..., None] + shifts[None, ...], v0)
    return vmat.mean(axis=-1)


def v_kh(x, alpha: float = 0.0, v0: float = V0_DEFAULT, use_avg: bool = True,
         n_theta: int = 500):
    return (
        v_kh_avg(x, alpha0=alpha, v0=v0, n_theta=n_theta)
        if use_avg
        else v_kh_shift(x, alpha=alpha, v0=v0)
    )


# ------------------------------------------------- finite-difference eigensolve
def reference_eigensystem(
    L: float = 10.0,
    N: int = 2000,
    alpha: float = 0.0,
    v0: float = V0_DEFAULT,
    k_max: int = 10,
    use_avg: bool = True,
    n_theta: int = 500,
):
    """First ``k_max`` eigenpairs of H = -1/2 d2/dx2 + V on [-L, L], Dirichlet.

    Float64 on host.  Tridiagonal [1,-2,1]/dx^2 stencil on the N-2 interior
    points, eigenpairs from ``scipy.linalg.eigh_tridiagonal`` (falls back to a
    dense ``numpy.linalg.eigh`` if scipy is unavailable), boundary zeros
    re-embedded, trapezoid-normalised — matching KH_1D.py:46-82.

    Returns host numpy arrays ``(x (N,), E (k_max,), psi (N, k_max))`` in
    float64; callers cast/ship to device as needed.
    """
    x = np.linspace(-L, L, N, dtype=np.float64)
    dx = (2.0 * L) / (N - 1)
    x_int = x[1:-1]
    v_int = np.asarray(
        v_kh_avg(x_int, alpha0=alpha, v0=v0, n_theta=n_theta)
        if use_avg
        else v_kh_shift(x_int, alpha=alpha, v0=v0),
        dtype=np.float64,
    )
    diag = 1.0 / dx**2 + v_int
    offd = np.full(N - 3, -0.5 / dx**2, dtype=np.float64)

    evals = evecs = None
    # native C++ bisection + inverse iteration (O(N) memory) when available
    from .. import native

    out = native.tridiag_eigh(diag, offd, k_max)
    if out is not None:
        evals, evecs = out
    if evals is None:
        try:
            from scipy.linalg import eigh_tridiagonal

            evals, evecs = eigh_tridiagonal(
                diag, offd, select="i", select_range=(0, k_max - 1)
            )
        except ImportError:  # pragma: no cover - scipy is present in CI
            H = np.diag(diag) + np.diag(offd, 1) + np.diag(offd, -1)
            evals_all, evecs_all = np.linalg.eigh(H)
            evals, evecs = evals_all[:k_max], evecs_all[:, :k_max]

    psi = np.zeros((N, k_max), dtype=np.float64)
    psi[1:-1, :] = evecs
    w = np.ones(N, dtype=np.float64)
    w[0] = w[-1] = 0.5
    norms = np.sqrt(dx * np.sum(w[:, None] * psi**2, axis=0))
    psi = psi / norms[None, :]
    return x, evals[:k_max], psi


class KHGroundTruth:
    """Dense-grid ground truth: x, V(x), eigenvalues E, eigenfunctions psi.

    Device-resident float32 arrays; ``resample`` interpolates psi onto a new
    grid with ``jnp.interp`` (no host round-trip) and re-evaluates V exactly.
    """

    def __init__(
        self,
        *,
        alpha: float = 0.0,
        v0: float = V0_DEFAULT,
        L: float = 10.0,
        N: int = 4000,
        n_levels: int = 5,
        use_avg: bool = True,
        n_theta: int = 500,
    ):
        x, E, psi = reference_eigensystem(
            L=L, N=N, alpha=alpha, v0=v0, k_max=max(n_levels, 1),
            use_avg=use_avg, n_theta=n_theta,
        )
        vx = (
            v_kh_avg(x, alpha0=alpha, v0=v0, n_theta=n_theta)
            if use_avg
            else v_kh_shift(x, alpha=alpha, v0=v0)
        )
        self.x = jnp.asarray(x, jnp.float32)
        self.V = jnp.asarray(vx, jnp.float32)
        self.E = jnp.asarray(E[:n_levels], jnp.float32)
        self.psi = jnp.asarray(psi[:, :n_levels], jnp.float32)
        self.alpha, self.v0, self.L = float(alpha), float(v0), float(L)
        self.N, self.n_levels = int(N), int(n_levels)
        self.use_avg, self.n_theta = bool(use_avg), int(n_theta)

    def energy(self, n: int) -> float:
        return float(self.E[n])

    def wavefunction(self, n: int):
        return self.psi[:, n]

    def level(self, n: int):
        return {"x": self.x, "V": self.V, "E": self.energy(n), "psi": self.psi[:, n]}

    def resample(self, x_new):
        """(x_new, V(x_new), psi resampled (M, n_levels)) — all on device."""
        v_new = (
            v_kh_avg(x_new, alpha0=self.alpha, v0=self.v0, n_theta=self.n_theta)
            if self.use_avg
            else v_kh_shift(x_new, alpha=self.alpha, v0=self.v0)
        )
        psi_new = jnp.stack(
            [jnp.interp(x_new, self.x, self.psi[:, k]) for k in range(self.n_levels)],
            axis=1,
        )
        return x_new, v_new, psi_new
