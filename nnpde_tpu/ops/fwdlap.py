"""Fused forward-Laplacian propagation for MLPs (the TPU hot path).

Instead of chaining reverse-mode passes per coordinate like the reference
(``/root/reference/Poisson_Equations/Poisson_ND.py:64-71``), we propagate the
exact first-order Jacobian and Hessian trace *forward* through the network in
one sweep (the "Forward Laplacian" scheme, arXiv:2307.08214).  Every heavy op
is a dense matmul over the collocation batch, which maps straight onto the
TPU MXU:

  linear  z = a W + b:   v' = v W          J' = J W          l' = l W
  pointwise sigma:       v' = s(v)         J' = s'(v) * J    l' = s'(v) l + s''(v) sum_d J^2

where per batch point v is the (width,) value vector, J the (d, width)
input-Jacobian, l the (width,) Laplacian accumulator.  The result is exact
(no stochastic trace estimation) and reverse-differentiable for training.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Jet(NamedTuple):
    """Batched second-order jet of a scalar field: value, gradient, Laplacian."""

    value: jnp.ndarray  # (N,)
    grad: jnp.ndarray   # (N, d)
    lap: jnp.ndarray    # (N,)


def activation_jet(name: str):
    """Return ``(s, s', s'')`` for a named pointwise activation."""
    if name == "sin":
        return jnp.sin, jnp.cos, lambda v: -jnp.sin(v)
    if name == "tanh":

        def d1(v):
            t = jnp.tanh(v)
            return 1.0 - t * t

        def d2(v):
            t = jnp.tanh(v)
            return -2.0 * t * (1.0 - t * t)

        return jnp.tanh, d1, d2
    if name == "gelu":
        # exact gelu: 0.5 v (1 + erf(v/sqrt(2)))
        import jax

        s = jax.nn.gelu
        inv_sqrt2pi = 0.3989422804014327

        def pdf(v):
            return inv_sqrt2pi * jnp.exp(-0.5 * v * v)

        def cdf(v):
            return 0.5 * (1.0 + jax.scipy.special.erf(v / jnp.sqrt(2.0).astype(v.dtype)))

        def d1(v):
            return cdf(v) + v * pdf(v)

        def d2(v):
            return 2.0 * pdf(v) - v * v * pdf(v)

        return (lambda v: s(v, approximate=False)), d1, d2
    raise ValueError(f"Unknown activation {name!r}")


def mlp_fwdlap(params, X, activation: str, input_jet=None) -> Jet:
    """Exact (u, grad u, lap u) of a scalar MLP over a collocation batch.

    ``params``: sequence of ``(W (in,out), b (out,))`` tuples, activation
    applied between layers (not after the last).  ``X``: (N, d).

    ``input_jet``: optional ``(z, z', z'')`` seed, each (N, d), for a net
    applied to ELEMENTWISE features ``z(x)`` (diagonal Jacobian — e.g. the
    hard-Neumann cosine map, :mod:`nnpde_tpu.models.inputmap`).  The
    recurrence then propagates the jet of ``g(z(x))`` w.r.t. ``x``:
    the first linear layer seeds ``J[n,i,:] = z_i'(x_n) W0[i,:]`` and the
    Laplacian stream ``l = z'' @ W0`` (chain rule; zero for the identity
    map, where ``z'' = 0`` and ``z' = 1``).
    """
    s, s1, s2 = activation_jet(activation)
    N, d = X.shape

    W0, b0 = params[0]
    if input_jet is None:
        v = X @ W0 + b0                                    # (N, w)
        # W0 is (d, w); dz_k/dx_i = W0[i, k]  =>  J[n, i, :] = W0[i, :]
        J = jnp.broadcast_to(W0[None, :, :], (N, d, W0.shape[1]))
        l = jnp.zeros_like(v)                              # (N, w)
    else:
        z, z1, z2 = input_jet
        v = z @ W0 + b0                                    # (N, w)
        J = z1[:, :, None] * W0[None, :, :]                # (N, d, w)
        l = z2 @ W0                                        # (N, w)

    for (W, b) in params[1:]:
        s1v = s1(v)
        l = s1v * l + s2(v) * jnp.sum(J * J, axis=1)
        J = s1v[:, None, :] * J
        v = s(v)
        # linear layer
        Jf = J.reshape(N * d, -1)
        J = (Jf @ W).reshape(N, d, W.shape[1])
        v = v @ W + b
        l = l @ W

    return Jet(value=v[..., 0], grad=J[..., 0], lap=l[..., 0])


class ChannelJet(NamedTuple):
    """Batched second-order jet of a C-channel vector field."""

    value: jnp.ndarray  # (N, C)
    grad: jnp.ndarray   # (N, d, C)
    lap: jnp.ndarray    # (N, C)


def mlp_fwdlap_channels(params, X, activation: str) -> ChannelJet:
    """Exact per-channel (u, grad u, lap u) of a C-output MLP.

    Identical stream recurrence to :func:`mlp_fwdlap` — the output layer is
    just another linear map, so all C channels ride the same (N, w) value /
    (N, d, w) Jacobian / (N, w) Laplacian streams and one final matmul
    fans them out.  Used by coupled-system problems (e.g. the KH Floquet
    harmonics, ``problems/kh_floquet.py``) where one network parameterises
    2M+1 coupled component fields."""
    s, s1, s2 = activation_jet(activation)
    N, d = X.shape

    W0, b0 = params[0]
    v = X @ W0 + b0
    J = jnp.broadcast_to(W0[None, :, :], (N, d, W0.shape[1]))
    l = jnp.zeros_like(v)

    for (W, b) in params[1:]:
        s1v = s1(v)
        l = s1v * l + s2(v) * jnp.sum(J * J, axis=1)
        J = s1v[:, None, :] * J
        v = s(v)
        Jf = J.reshape(N * d, -1)
        J = (Jf @ W).reshape(N, d, W.shape[1])
        v = v @ W + b
        l = l @ W

    return ChannelJet(value=v, grad=J, lap=l)


def compose_product_jet_channels(a: ChannelJet, f: Jet) -> ChannelJet:
    """Jet of ``a * f`` where the scalar trial factor f multiplies every
    channel:  (af, a∇f + f∇a, aΔf + 2∇a·∇f + fΔa)  per channel."""
    value = a.value * f.value[:, None]
    grad = (a.value[:, None, :] * f.grad[:, :, None]
            + f.value[:, None, None] * a.grad)
    lap = (a.value * f.lap[:, None]
           + 2.0 * jnp.einsum("ndc,nd->nc", a.grad, f.grad)
           + f.value[:, None] * a.lap)
    return ChannelJet(value=value, grad=grad, lap=lap)


def compose_product_jet(a: Jet, b: Jet) -> Jet:
    """Jet of the product ``a * b``:  (ab, a∇b + b∇a, aΔb + 2∇a·∇b + bΔa)."""
    value = a.value * b.value
    grad = a.value[:, None] * b.grad + b.value[:, None] * a.grad
    lap = a.value * b.lap + 2.0 * jnp.sum(a.grad * b.grad, axis=1) + b.value * a.lap
    return Jet(value=value, grad=grad, lap=lap)


def exclusive_products(F: jnp.ndarray) -> jnp.ndarray:
    """``out[:, j] = prod_{i != j} F[:, i]`` by prefix/suffix cumprods —
    division-free, so exact when factors vanish (forced-node trials, bump
    supports).  F: (N, d)."""
    N, d = F.shape
    ones = jnp.ones((N, 1), F.dtype)
    pre = jnp.concatenate([ones, jnp.cumprod(F[:, :-1], axis=1)], axis=1)
    if d > 1:
        suf = jnp.concatenate(
            [jnp.cumprod(F[:, :0:-1], axis=1)[:, ::-1], ones], axis=1
        )
    else:
        suf = ones
    return pre * suf


def constant_jet(value: jnp.ndarray, d: int) -> Jet:
    """Jet of a constant field (zero derivatives)."""
    N = value.shape[0]
    return Jet(value=value, grad=jnp.zeros((N, d), value.dtype), lap=jnp.zeros_like(value))
