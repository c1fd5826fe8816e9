"""Device-side collocation samplers.

Replaces the reference's per-script sampling idioms: uniform interior points
(Poisson_ND.py:187-190), fixed linspace grids (IPW_1D_PINN_DRM.py:110-112),
meshgrids (IPW_2D.py:137-142), per-face boundary samples
(Poisson_ND.py:130-141), and the supervised-data subset rules
(first 25% every 10th point — IPW_1D_PINN_DRM.py:114-117; the shifted QHO
variant — QHO_1D_PINN_DRM.py:421-424; KH's capped fraction —
KH_1D.py:283-287).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..pde.domain import Box


def uniform_box(key, n: int, box: Box, dtype=jnp.float32):
    """n uniform points in the box — (n, d)."""
    lo = jnp.asarray(box.lo, dtype)
    hi = jnp.asarray(box.hi, dtype)
    u = jax.random.uniform(key, (n, box.dim), dtype)
    return lo + u * (hi - lo)


def sobol_unit(seed: int, n: int, d: int, dtype=jnp.float32):
    """n scrambled-Sobol points in the unit cube [0,1)^d — (n, d).

    Host-side generation (scipy.stats.qmc), device-resident result.  The
    base set is fixed; combine with :func:`shifted_qmc` for per-epoch
    randomised QMC (the reference samples uniformly, Poisson_ND.py:187-190).
    """
    from scipy.stats import qmc

    eng = qmc.Sobol(d=d, scramble=True, seed=seed)
    return jnp.asarray(eng.random(n), dtype)


def sobol_box(seed: int, n: int, box: Box, dtype=jnp.float32):
    """n scrambled-Sobol quasi-Monte-Carlo points in the box — (n, d).

    QMC error decays ~1/N vs Monte Carlo's 1/sqrt(N) — it sharpens the
    Deep-Ritz energy estimate markedly in high dimensions (framework
    extension; the reference samples uniformly, Poisson_ND.py:187-190).
    """
    u = sobol_unit(seed, n, box.dim, dtype)
    lo = jnp.asarray(box.lo, dtype)
    hi = jnp.asarray(box.hi, dtype)
    return lo + u * (hi - lo)


def shifted_qmc(u_base, key, box: Box):
    """Per-epoch randomised QMC: Cranley-Patterson rotation of a fixed
    Sobol base set, entirely device-side and jit-safe.

    ``(u_base + shift) mod 1`` with a fresh uniform shift per call is an
    unbiased estimator that keeps the low-discrepancy structure, so QMC
    variance reduction composes with per-epoch resampling (round-1 gap:
    sobol was fixed-set only, so it could not combine with resample=True).
    """
    shift = jax.random.uniform(key, (u_base.shape[-1],), u_base.dtype)
    u = jnp.mod(u_base + shift, 1.0)
    lo = jnp.asarray(box.lo, u_base.dtype)
    hi = jnp.asarray(box.hi, u_base.dtype)
    return lo + u * (hi - lo)


def linspace_grid(n: int, lo: float, hi: float, dtype=jnp.float32):
    """Fixed 1D grid — (n, 1)."""
    return jnp.linspace(lo, hi, n, dtype=dtype).reshape(-1, 1)


def meshgrid_2d(n: int, lo: float, hi: float, dtype=jnp.float32):
    """n x n tensor-product grid, flattened to (n*n, 2) with 'ij' indexing
    (matches torch.meshgrid default used by the reference)."""
    g = jnp.linspace(lo, hi, n, dtype=dtype)
    X, Y = jnp.meshgrid(g, g, indexing="ij")
    return jnp.stack([X.reshape(-1), Y.reshape(-1)], axis=-1)


def face_points(key, n_per_face: int, box: Box, dtype=jnp.float32):
    """Fresh uniform samples on all 2d faces — (2*d*n_per_face, d).

    Mirrors Poisson_ND.py:130-141 (one batch per face, coordinate i pinned
    to the lo/hi face value).
    """
    d = box.dim
    keys = jax.random.split(key, 2 * d)
    outs = []
    for i in range(d):
        for j, val in enumerate((box.lo[i], box.hi[i])):
            pts = uniform_box(keys[2 * i + j], n_per_face, box, dtype)
            pts = pts.at[:, i].set(val)
            outs.append(pts)
    return jnp.concatenate(outs, axis=0)


def first_fraction_every_kth(n_total: int, fraction: float = 0.25, k: int = 10):
    """Static index rule: first ``fraction`` of the grid, every ``k``-th point
    (IPW_1D_PINN_DRM.py:114-117)."""
    n_data = int(fraction * n_total)
    return jnp.arange(0, n_data, k)


def mid_fraction_every_kth(n_total: int, fraction: float = 0.25, k: int = 10):
    """QHO variant: points in [fraction, 2*fraction) of the grid, every k-th
    (QHO_1D_PINN_DRM.py:421-424)."""
    n_data = int(fraction * n_total)
    return jnp.arange(n_data, 2 * n_data, k)


def first_fraction_indices(m: int, fraction: float = 0.25, max_points=None):
    """First ``max(1, m*fraction)`` indices, optionally capped
    (KH_1D.py:283-287)."""
    k = max(1, int(m * fraction))
    if max_points is not None:
        k = min(k, int(max_points))
    return jnp.arange(k)
