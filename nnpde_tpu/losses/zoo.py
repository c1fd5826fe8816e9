"""The loss zoo — every loss family the reference uses, as pure functions.

All reductions are ``jnp.mean`` over the collocation batch so that under
jit + batch sharding they lower to psum-reduced means (bit-equal to the
unsharded run).  Citations map each function to the reference definition it
reproduces.
"""

from __future__ import annotations

import jax.numpy as jnp


# ----------------------------------------------------------------- PINN strong
def pinn_poisson(lap, f):
    """``mean((-lap u - f)^2)`` — Poisson_ND.py:91-96."""
    return jnp.mean((-lap - f) ** 2)


def pinn_helmholtz(u, lap, k_squared):
    """``mean((u'' + k^2 u)^2)`` — IPW_1D_PINN_DRM.py:63-83, IPW_2D.py:209-223."""
    return jnp.mean((lap + k_squared * u) ** 2)


def pinn_schrodinger(u, lap, V, E):
    """``mean((-1/2 lap u + V u - E u)^2)`` — QHO_1D_PINN_DRM.py:161-174,
    QHO_2D.py:363-378, KH_1D.py:226-234 (E may be a trainable scalar)."""
    return jnp.mean((-0.5 * lap + V * u - E * u) ** 2)


# ------------------------------------------------------------------- Deep Ritz
def drm_poisson_energy(u, grad, f):
    """``mean(1/2 |grad u|^2 - f u)`` — Poisson_ND.py:98-103."""
    return jnp.mean(0.5 * jnp.sum(grad * grad, axis=-1) - f * u)


def drm_rayleigh(u, grad, V=None, *, den_eps: float = 0.0):
    """Rayleigh quotient ``mean(1/2|grad u|^2 [+ V u^2]) / mean(u^2)``.

    Variants in the reference: IPW 1D uses ``mean(u_x^2)/mean(u^2)`` (no 1/2,
    IPW_1D_PINN_DRM.py:85-90) — express that by passing ``grad * sqrt(2)`` or
    use :func:`drm_rayleigh_unscaled`; QHO/KH include the potential
    (QHO_1D_PINN_DRM.py:176-185, KH_1D.py:236-242); the 2D scripts add a
    denominator epsilon (QHO_2D.py:383, IPW_2D.py:227).
    """
    num = 0.5 * jnp.sum(grad * grad, axis=-1)
    if V is not None:
        num = num + V * u * u
    return jnp.mean(num) / (jnp.mean(u * u) + den_eps)


def drm_rayleigh_unscaled(u, grad, *, den_eps: float = 0.0):
    """``mean(|grad u|^2) / mean(u^2)`` — the IPW convention (no 1/2 factor),
    IPW_1D_PINN_DRM.py:85-90, IPW_2D.py:226-227."""
    return jnp.mean(jnp.sum(grad * grad, axis=-1)) / (jnp.mean(u * u) + den_eps)


# ------------------------------------------------------------------------- WAN
def wan_weak_residual(gu, phi, gphi, u=None, *, V=None, E=None, f=None,
                      prefactor: float = 0.5):
    """Mean weak-form integrand.

    Schrodinger form (IPW_1D_WAN.py:106-108, QHO_1D_WAN.py:131,
    QHO_2D.py:218): ``mean(pref * gu . gphi + (V u - E u) phi)``.
    Poisson form (Poisson_ND.py:120-121): ``mean(gu . gphi - f phi)`` with
    ``prefactor=1`` and no E/V.
    """
    integrand = prefactor * jnp.sum(gu * gphi, axis=-1)
    if V is not None:
        integrand = integrand + V * u * phi
    if E is not None:
        integrand = integrand - E * u * phi
    if f is not None:
        integrand = integrand - f * phi
    return jnp.mean(integrand)


def wan_pde_loss(weak_residual, phi_norm, *, eps: float = 1e-8,
                 convention: str = "wr2_over_norm"):
    """Two normalisation conventions in the reference:

    * ``wr2_over_norm``: ``wr^2 / (mean(phi^2) + eps)`` —
      IPW_1D_WAN.py:111, Poisson_ND.py:124, QHO_2D.py:221.
    * ``ratio_sq``: ``(I / (|phi|^2 + eps))^2`` with integral-mean
      normalisation — KH_1D.py:266-267 (divides *inside* the square).
    """
    if convention == "wr2_over_norm":
        return weak_residual**2 / (phi_norm + eps)
    if convention == "ratio_sq":
        return (weak_residual / (phi_norm + eps)) ** 2
    raise ValueError(f"Unknown WAN convention {convention!r}")


# ----------------------------------------------------------------- norm losses
def norm_pointwise(u):
    """``mean((u^2 - 1)^2)`` pointwise — IPW_1D_PINN_DRM.py:157 (deliberately
    reproduced: it is the reference's norm loss for IPW-1D, not an integral)."""
    return jnp.mean((u * u - 1.0) ** 2)


def norm_integral(u, volume):
    """``(volume * mean(u^2) - 1)^2`` — IPW_1D_WAN.py:112 (L),
    QHO_1D_WAN.py:137 (2L), QHO_2D.py:222 (4L^2), KH_1D.py:268."""
    return (volume * jnp.mean(u * u) - 1.0) ** 2


def norm_trapezoid(u, dx):
    """``(sqrt(sum(u^2) dx) - 1)^2`` — QHO_1D_PINN_DRM.py:187-195."""
    return (jnp.sqrt(jnp.sum(u * u) * dx) - 1.0) ** 2


def norm_nontrivial(u, eps: float = 1e-8):
    """``1 / (mean(u^2) + eps)`` — anti-trivial-solution term,
    Poisson_ND.py:143-147."""
    return 1.0 / (jnp.mean(u * u) + eps)


# ------------------------------------------------------------------ data / bc
def data_mse(u_pred, u_data):
    return jnp.mean((u_pred - u_data) ** 2)


# --------------------------------------------------------------- orthogonality
def orthogonal_projection(u, lower_states, volume, *, eps: float = 1e-8):
    """``sum_k <u, psi_k>^2 / (<psi_k, psi_k> + eps)`` with grid-average inner
    products — IPW_1D_PINN_DRM.py:92-103, QHO_1D_PINN_DRM.py:197-212,
    KH_1D.py:271-280.  ``lower_states``: (N, k) matrix of lower eigenstates
    on the same collocation points (k may be 0)."""
    if lower_states.shape[1] == 0:
        return jnp.asarray(0.0, u.dtype)
    inner = volume * jnp.mean(u[:, None] * lower_states, axis=0)       # (k,)
    norm_sq = volume * jnp.mean(lower_states**2, axis=0)               # (k,)
    return jnp.sum(inner**2 / (norm_sq + eps))


# ---------------------------------------------------------- parity / symmetry
def reflection_mse(u, u_reflected, sign: float = 1.0):
    """``mean((u - sign * u_reflected)^2)`` — parity (IPW_2D.py:238-245,
    QHO_2D.py:395-400, KH_1D.py:366-370) and symmetry (x<->y swap,
    IPW_2D.py:235-236) losses."""
    return jnp.mean((u - sign * u_reflected) ** 2)
