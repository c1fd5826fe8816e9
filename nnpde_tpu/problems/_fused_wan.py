"""Shared wiring for the two-pass fused WAN objectives.

Every WAN trainer in the reference has the same shape — primal weak form
``wr^2/(mean(phi^2)+eps)`` against a bump-windowed critic ``phi = w * v``
(IPW_1D_WAN.py:88-115, QHO_1D_WAN.py:115-140, QHO_2D.py:204-225,
KH_1D.py:244-269) — so the fused u/v objective construction
(:mod:`nnpde_tpu.kernels.fused_quotient`) is factored here once:

* the primal coefficients are the weak functional of the u-jet with the
  critic's ``(phi, grad phi)`` as per-point data;
* the critic coefficients are the weak functional of the v-jet with the
  u-jet as data and ``bump x critic-trial-factor`` as the effective factor;
* trainable eigenvalues stay exact: E is an explicit argument whose
  gradient comes from the in-kernel ``sum u*phi`` lane.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

from ..kernels import (
    linear_functional_coefficients,
    make_fused_wan_multi_u,
    make_fused_wan_multi_v,
    make_fused_wan_u,
    make_fused_wan_v,
    pack_multibump_coefficients,
)
from ..ops.fwdlap import Jet


class FusedWanPair(NamedTuple):
    """The fused WAN objective set.  Unpacking the first two fields keeps
    the original (u_pde_fn, v_loss_fn) contract; ``v_coef_fn`` +
    ``v_loss_from_coef`` are the split used with fit_wan's
    ``v_context_fn`` on fixed-quadrature trainers."""

    u_pde_fn: Callable
    v_loss_fn: Callable
    v_coef_fn: Callable
    v_loss_from_coef: Callable


def factor_jet_or_one(model, X):
    """The model's trial-factor jet, or the identity jet (B = 1) for raw
    nets (technique 'BC'/'RAW')."""
    if model.factor is None:
        one = jnp.ones((X.shape[0],), X.dtype)
        return Jet(one, jnp.zeros_like(X), jnp.zeros_like(one))
    return model.factor.jet(X)


def make_fused_wan_pair(u_model, v_model, *, w_pde: float = 1.0,
                        prefactor: float = 0.5,
                        convention: str = "wr2_over_norm",
                        eps: float = 1e-8, objective: str = "neg_log",
                        log_eps: float = 1e-8, impl: str = "pallas",
                        w_norm: float = 0.0, vol: float = 1.0,
                        **call_kw):
    """Build the fused ``(u_pde_fn, v_loss_fn)`` pair.

    * ``u_pde_fn(u_net_params, E, v_params, X, wv, dwv, V=None)`` returns
      ``(w_pde * pde_loss [+ w_norm * (vol*mean(u^2)-1)^2], aux)`` —
      differentiable w.r.t. the net params AND E (fixed-E problems just
      pass a constant).  ``w_norm > 0`` rides the normalisation penalty on
      the in-kernel mass lane (IPW_1D_WAN.py:112), sparing the separate
      full-grid u forward when no other term needs the values.
    * ``v_loss_fn(v_params, u_net_params, E, X, wv, dwv, V=None)`` returns
      ``(loss_v, aux)`` — differentiable w.r.t. ``v_params``.

    ``wv``/``dwv`` are the bump window and its gradient on ``X``
    (:func:`nnpde_tpu.ops.bump_w`); ``V`` the per-point potential.
    """
    fused_u = make_fused_wan_u(
        u_model.spec.activation, convention=convention, eps=eps,
        w_pde=w_pde, w_norm=w_norm, vol=vol, **call_kw)
    fused_v = make_fused_wan_v(
        v_model.spec.activation, convention=convention, eps=eps,
        objective=objective, log_eps=log_eps, **call_kw)

    def u_pde_fn(u_net_params, E, v_params, X, wv, dwv, V=None, f=None):
        v, gv = v_model.value_and_grad(v_params, X, impl=impl)
        phi = wv * v
        gphi = dwv * v[:, None] + wv[:, None] * gv
        phi_norm = jnp.mean(phi ** 2)
        Bu = factor_jet_or_one(u_model, X)
        c0 = None if V is None else V * phi
        rhs = None if f is None else -f * phi     # Poisson_ND.py:120-121
        base = linear_functional_coefficients(
            Bu, c0=c0, b0=prefactor * gphi, rhs=rhs, e1=Bu.value,
            e2=Bu.value * phi)
        return fused_u(u_net_params, E, X, base, phi_norm)

    def v_coef_fn(u_net_params, E, X, wv, dwv, V=None, f=None):
        """The critic's coefficient stream — a function of the FROZEN
        primal only, so trainers with fixed quadrature compute it once per
        epoch (fit_wan's ``v_context_fn``) instead of once per inner
        critic step (5x fewer u-jet evaluations at v_steps = 5)."""
        u, gu = u_model.value_and_grad(u_net_params, X, impl=impl)
        Bv = factor_jet_or_one(v_model, X)
        Wm = wv * Bv.value
        gWm = dwv * Bv.value[:, None] + wv[:, None] * Bv.grad
        wjet = Jet(Wm, gWm, jnp.zeros_like(Wm))
        c0 = (V - E) * u if V is not None else -E * u
        if f is not None:
            c0 = c0 - f
        return linear_functional_coefficients(
            wjet, c0=c0, b0=prefactor * gu, e1=Wm)

    def v_loss_from_coef(v_params, X, coef):
        return fused_v(v_params, X, coef)

    def v_loss_fn(v_params, u_net_params, E, X, wv, dwv, V=None, f=None):
        coef = v_coef_fn(u_net_params, E, X, wv, dwv, V=V, f=f)
        return fused_v(v_params, X, coef)

    return FusedWanPair(u_pde_fn, v_loss_fn, v_coef_fn, v_loss_from_coef)


def make_fused_wan_multi_pair(u_model, v_model, n_bumps: int, *,
                              w_pde: float = 1.0, prefactor: float = 0.5,
                              convention: str = "wr2_over_norm",
                              eps: float = 1e-8,
                              objective: str = "neg_log",
                              log_eps: float = 1e-8, impl: str = "pallas",
                              w_norm: float = 0.0, vol: float = 1.0,
                              **call_kw):
    """The MULTI-test-function variant of :func:`make_fused_wan_pair`.

    One weak residual per localised bump ``phi_k = w_k * v`` (the
    ``n_test_grid > 1`` WAN extension, problems/ipw2d.py) — the per-bump
    sums ride K accumulator lanes (:mod:`nnpde_tpu.kernels.fused_multibump`).
    ``wv``/``dwv`` arguments are the STACKED bump windows ``(K, N)`` /
    ``(K, N, d)`` from :func:`nnpde_tpu.ops.bump_w_multi`; the objectives
    are ``mean_k`` of the per-bump quotients, matching the XLA multibump
    path exactly.
    """
    fused_u = make_fused_wan_multi_u(
        u_model.spec.activation, n_bumps, convention=convention, eps=eps,
        w_pde=w_pde, w_norm=w_norm, vol=vol, **call_kw)
    fused_v = make_fused_wan_multi_v(
        v_model.spec.activation, n_bumps, convention=convention, eps=eps,
        objective=objective, log_eps=log_eps, **call_kw)

    def u_pde_fn(u_net_params, E, v_params, X, wv, dwv, V=None, f=None):
        v, gv = v_model.value_and_grad(v_params, X, impl=impl)
        phi = wv * v[None, :]                                  # (K, N)
        gphi = (dwv * v[None, :, None]
                + wv[:, :, None] * gv[None, :, :])             # (K, N, d)
        phi_norms = jnp.mean(phi ** 2, axis=1)                 # (K,)
        Bu = factor_jet_or_one(u_model, X)
        zero = jnp.zeros_like(Bu.value)
        cores = []
        for k in range(n_bumps):
            c0 = V * phi[k] if V is not None else None
            rhs = None if f is None else -f * phi[k]
            cores.append(linear_functional_coefficients(
                Bu, c0=c0, b0=prefactor * gphi[k], rhs=rhs,
                e1=Bu.value if k == 0 else zero,    # lane K+0 = u mass
                e2=Bu.value * phi[k]))
        base = pack_multibump_coefficients(cores)
        return fused_u(u_net_params, E, X, base, phi_norms)

    def v_coef_fn(u_net_params, E, X, wv, dwv, V=None, f=None):
        """Critic coefficient stream — frozen-primal only, so fixed-
        quadrature trainers build it once per epoch (fit_wan's
        ``v_context_fn``)."""
        u, gu = u_model.value_and_grad(u_net_params, X, impl=impl)
        Bv = factor_jet_or_one(v_model, X)
        c0 = (V - E) * u if V is not None else -E * u
        if f is not None:
            c0 = c0 - f
        cores = []
        for k in range(n_bumps):
            Wm = wv[k] * Bv.value
            gWm = dwv[k] * Bv.value[:, None] + wv[k][:, None] * Bv.grad
            wjet = Jet(Wm, gWm, jnp.zeros_like(Wm))
            cores.append(linear_functional_coefficients(
                wjet, c0=c0, b0=prefactor * gu, e1=Wm))
        return pack_multibump_coefficients(cores)

    def v_loss_from_coef(v_params, X, coef):
        return fused_v(v_params, X, coef)

    def v_loss_fn(v_params, u_net_params, E, X, wv, dwv, V=None, f=None):
        coef = v_coef_fn(u_net_params, E, X, wv, dwv, V=V, f=f)
        return fused_v(v_params, X, coef)

    return FusedWanPair(u_pde_fn, v_loss_fn, v_coef_fn, v_loss_from_coef)
