"""Hard-boundary-condition trial factors (the technique enum), with jets.

The reference multiplies its raw networks by hand-written per-script trial
factors: box polynomials ``x(L-x)`` (``IPW_1D_WAN.py:76-80``), N-D products
``prod x_i (L - x_i)`` (``Poisson_ND.py:27-29``), smooth exp windows
``(1-e^{-(x+L)})(1-e^{x-L})`` for unbounded domains
(``QHO_1D_PINN_DRM.py:147-152``), and forced-node products ``prod (x - n_j)``
(``IPW_1D_PINN_DRM.py:46-51``, ``QHO_2D.py:155-168``).

Observation that unifies all of them: every factor is a *separable* product
``B(x) = prod_i f_i(x_i)`` of scalar 1D functions with closed-form first and
second derivatives.  We therefore expose each 1D factor as a jet function
``x -> (f, f', f'')`` and assemble values / gradients / Laplacians of the
product analytically — no autodiff through the factor and exact composition
with the fused MLP forward-Laplacian (:mod:`nnpde_tpu.ops.fwdlap`).
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax.numpy as jnp

from ..ops.fwdlap import Jet

# A 1D factor: elementwise x -> (f(x), f'(x), f''(x)).
Factor1D = Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]


# ----------------------------------------------------------------- primitives
def one() -> Factor1D:
    def jet(x):
        o = jnp.ones_like(x)
        z = jnp.zeros_like(x)
        return o, z, z

    return jet


def poly_box(L: float, lo: float = 0.0) -> Factor1D:
    """``(x - lo)(L - x)`` — vanishes at the box faces (reference FBC on [0, L])."""

    def jet(x):
        f = (x - lo) * (L - x)
        df = (L + lo) - 2.0 * x
        d2f = jnp.full_like(x, -2.0)
        return f, df, d2f

    return jet


def exp_window(L: float) -> Factor1D:
    """``(1 - e^{-(x+L)})(1 - e^{x-L})`` — smooth decay window on [-L, L]
    (reference hard BC for unbounded domains, QHO_1D_PINN_DRM.py:147-152)."""

    def jet(x):
        ea = jnp.exp(-(x + L))
        eb = jnp.exp(x - L)
        a, b = 1.0 - ea, 1.0 - eb
        da, db = ea, -eb
        d2a, d2b = -ea, -eb
        f = a * b
        df = da * b + a * db
        d2f = d2a * b + 2.0 * da * db + a * d2b
        return f, df, d2f

    return jet


def nodes_poly(nodes: Sequence[float]) -> Factor1D:
    """``prod_j (x - node_j)`` — forces zeros at the given node positions
    (reference FN technique).  Derivatives by the product recurrence, exact
    at the nodes (no division)."""
    nodes = tuple(float(n) for n in nodes)

    def jet(x):
        f = jnp.ones_like(x)
        d1 = jnp.zeros_like(x)
        d2 = jnp.zeros_like(x)
        for n in nodes:
            g = x - n
            d2 = d2 * g + 2.0 * d1
            d1 = d1 * g + f
            f = f * g
        return f, d1, d2

    return jet


def product1d(a: Factor1D, b: Factor1D) -> Factor1D:
    """Product of two 1D factors with jet composition."""

    def jet(x):
        fa, da, d2a = a(x)
        fb, db, d2b = b(x)
        return fa * fb, da * fb + fa * db, d2a * fb + 2.0 * da * db + fa * d2b

    return jet


# ------------------------------------------------------------ separable factor
class SeparableFactor:
    """``B(x) = prod_i f_i(x_i)`` with analytic value / gradient / Laplacian."""

    def __init__(self, factors: Sequence[Factor1D]):
        self.factors = tuple(factors)

    @property
    def dim(self) -> int:
        return len(self.factors)

    def value_point(self, x):
        """x (d,) -> scalar (used by the generic autodiff path)."""
        out = 1.0
        for i, f in enumerate(self.factors):
            out = out * f(x[i])[0]
        return out

    def value(self, X):
        """X (N, d) -> (N,)."""
        out = jnp.ones(X.shape[:-1], X.dtype)
        for i, f in enumerate(self.factors):
            out = out * f(X[..., i])[0]
        return out

    def jet(self, X) -> Jet:
        """X (N, d) -> Jet of the product factor.

        Exclusive products computed by prefix/suffix cumprod so node zeros
        are handled exactly (no division by a vanishing factor).
        """
        vals, d1s, d2s = [], [], []
        for i, f in enumerate(self.factors):
            v, d1, d2 = f(X[..., i])
            vals.append(v)
            d1s.append(d1)
            d2s.append(d2)
        from ..ops.fwdlap import exclusive_products

        F = jnp.stack(vals, axis=-1)    # (N, d)
        F1 = jnp.stack(d1s, axis=-1)
        F2 = jnp.stack(d2s, axis=-1)
        excl = exclusive_products(F)    # (N, d): prod_{i != j} F_i
        value = excl[:, 0] * F[:, 0]
        grad = F1 * excl
        lap = jnp.sum(F2 * excl, axis=1)
        return Jet(value=value, grad=grad, lap=lap)


def unit_factor(dim: int) -> SeparableFactor:
    return SeparableFactor([one()] * dim)


# ------------------------------------------------------- technique resolution
def factor_for_technique(
    technique: str,
    *,
    dim: int,
    kind: str,               # 'box' (domain [lo, L]) | 'window' (domain [-L, L])
    L: float,
    lo: float = 0.0,
    nodes_per_dim: Sequence[Sequence[float]] | None = None,
) -> SeparableFactor | None:
    """Map the reference's technique enum to a trial factor.

    * ``BC`` / ``RB`` / ``RAW``: soft or no enforcement -> ``None`` (raw net).
    * ``FBC`` / ``OG``: hard boundary factor (box polynomial or exp window).
    * ``FN``: hard boundary factor x forced-node polynomial per dimension.
    """
    technique = technique.upper()
    if technique in ("BC", "RB", "RAW"):
        return None
    base = poly_box(L, lo) if kind == "box" else exp_window(L)
    if technique in ("FBC", "OG"):
        return SeparableFactor([base] * dim)
    if technique == "FN":
        if nodes_per_dim is None:
            raise ValueError("FN technique requires nodes_per_dim")
        facs = []
        for i in range(dim):
            nodes = nodes_per_dim[i]
            facs.append(product1d(base, nodes_poly(nodes)) if len(nodes) else base)
        return SeparableFactor(facs)
    raise ValueError(f"Unknown technique {technique!r}")
