"""Solution model = functional MLP composed with an optional trial factor.

One object replaces every per-script net in the reference (``SolutionNet``,
``CriticNet``, the ``FCN`` family): the raw network u_raw and the hard-BC
trial factor B are composed as ``u = B * u_raw``, and the fused
forward-Laplacian propagates through *both* analytically (the factor is part
of u, exactly as in the reference where the factor sits inside ``forward``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..ops import calculus
from ..ops.fwdlap import (
    ChannelJet,
    Jet,
    compose_product_jet,
    compose_product_jet_channels,
    mlp_fwdlap,
    mlp_fwdlap_channels,
)
from .mlp import (
    NetSpec,
    init_mlp,
    mlp_apply_batch,
    mlp_apply_batch_channels,
    mlp_apply_point,
)
from .trial import SeparableFactor


class SolutionModel:
    """Static model description; parameters live in a separate pytree."""

    def __init__(self, spec: NetSpec, factor: Optional[SeparableFactor] = None,
                 input_map=None):
        self.spec = spec
        self.factor = factor
        # Optional elementwise input feature map with analytic jets
        # (models/inputmap.py) — hard-enforces DERIVATIVE boundary
        # conditions (zero-Neumann) the way the output factor hard-enforces
        # Dirichlet.  Composes with the factor: u = B(x) * g(z(x)).
        self.input_map = input_map
        self.dim = spec.layers[0]
        if factor is not None and factor.dim != self.dim:
            raise ValueError(
                f"factor dim {factor.dim} != net input dim {self.dim}"
            )
        if input_map is not None and input_map.dim != self.dim:
            raise ValueError(
                f"input_map dim {input_map.dim} != net input dim {self.dim}"
            )

    # ------------------------------------------------------------------ init
    def init(self, key, dtype=jnp.float32):
        return init_mlp(key, self.spec, dtype)

    # --------------------------------------------------------------- forward
    def apply_point(self, params, x):
        z = self.input_map.value(x) if self.input_map is not None else x
        u = mlp_apply_point(params, z, self.spec.activation)
        if self.factor is not None:
            u = u * self.factor.value_point(x)
        return u

    def apply_batch(self, params, X):
        Z = self.input_map.value(X) if self.input_map is not None else X
        u = mlp_apply_batch(params, Z, self.spec.activation)
        if self.factor is not None:
            u = u * self.factor.value(X)
        return u

    # ----------------------------------------------------------------- jets
    def fields(self, params, X, impl: str = "xla", **kernel_opts) -> Jet:
        """Fused (u, grad u, lap u) over the collocation batch (hot path).

        ``impl``: 'xla' (default — stream propagation fused by XLA) or
        'pallas' (the VMEM-resident kernel with recompute backward,
        :mod:`nnpde_tpu.kernels`; numerically equivalent, interpreter mode
        off-TPU).  ``kernel_opts`` pass through to
        :func:`~nnpde_tpu.kernels.mlp_fwdlap_pallas` (tile, bwd_tile,
        fwd_impl, dot_dtype, lane_pack — perf tuning knobs).
        """
        if impl == "pallas":
            if self.input_map is not None:
                raise ValueError(
                    "input_map (hard-Neumann features) is supported on the "
                    "XLA jet path only — use impl='xla'"
                )
            from ..kernels import mlp_fwdlap_pallas

            # 'auto' forward: VMEM jet kernel whenever the per-point jet
            # fits 8 output lanes (d <= 6) — packed at width <= 64,
            # unpacked above; XLA stream forward at d >= 7 (measured
            # crossovers, BENCHMARKS.md width table)
            kernel_opts.setdefault("fwd_impl", "auto")
            jet = mlp_fwdlap_pallas(params, X, self.spec.activation,
                                    **kernel_opts)
        else:
            seed = (self.input_map.jet(X)
                    if self.input_map is not None else None)
            jet = mlp_fwdlap(params, X, self.spec.activation,
                             input_jet=seed)
        if self.factor is not None:
            jet = compose_product_jet(jet, self.factor.jet(X))
        return jet

    def fields_generic(self, params, X) -> Jet:
        """Reference implementation via forward-over-reverse autodiff
        (correctness oracle for :meth:`fields`)."""
        u, g, l = calculus.batched_value_grad_lap(
            lambda x: self.apply_point(params, x)
        )(X)
        return Jet(value=u, grad=g, lap=l)

    def value_and_grad(self, params, X, impl: str = "xla", **kernel_opts):
        """(u, grad u) without the Laplacian (DRM / WAN paths).

        ``impl='pallas'`` rides the lane-packed jet kernel and discards the
        laplacian stream — one extra stream of d+2 (~25% kernel overhead at
        d=2) against the kernel's ~2.4x win over the XLA path, so still a
        large net speedup for DRM/WAN training on TPU."""
        if impl == "pallas":
            jet = self.fields(params, X, impl="pallas", **kernel_opts)
            return jet.value, jet.grad
        u, g = calculus.batched_value_and_grad_x(
            lambda x: self.apply_point(params, x)
        )(X)
        return u, g


class ChannelSolutionModel:
    """Coupled-system solution model: one MLP parameterises C component
    fields sharing hidden streams (the output layer fans them out).

    Same composition contract as :class:`SolutionModel` — an optional
    scalar trial factor multiplies **every** channel and propagates
    analytically through the jet — but value/grad/lap come back with a
    trailing channel axis.  Used by the Floquet KH problem
    (:mod:`nnpde_tpu.problems.kh_floquet`) where 2(2M+1) channels hold the
    real/imag parts of the harmonic components; the reference solves only
    the single-channel cycle-averaged limit (KH_1D.py:32-39)."""

    def __init__(self, spec: NetSpec, factor: Optional[SeparableFactor] = None):
        self.spec = spec
        self.factor = factor
        self.dim = spec.layers[0]
        self.channels = spec.layers[-1]
        if factor is not None and factor.dim != self.dim:
            raise ValueError(
                f"factor dim {factor.dim} != net input dim {self.dim}"
            )

    def init(self, key, dtype=jnp.float32):
        return init_mlp(key, self.spec, dtype)

    def apply_batch(self, params, X):
        u = mlp_apply_batch_channels(params, X, self.spec.activation)
        if self.factor is not None:
            u = u * self.factor.value(X)[:, None]
        return u

    def fields(self, params, X) -> ChannelJet:
        """Fused per-channel (u, grad u, lap u) over the batch."""
        jet = mlp_fwdlap_channels(params, X, self.spec.activation)
        if self.factor is not None:
            jet = compose_product_jet_channels(jet, self.factor.jet(X))
        return jet

    def fields_generic(self, params, X) -> ChannelJet:
        """Forward-over-reverse oracle for :meth:`fields`."""
        import jax

        def f(x):
            u = calculus_point_channels(params, x, self.spec.activation)
            if self.factor is not None:
                u = u * self.factor.value_point(x)
            return u

        val = jax.vmap(f)(X)
        grad = jax.vmap(jax.jacfwd(f))(X).transpose(0, 2, 1)
        lap = jnp.trace(jax.vmap(jax.hessian(f))(X), axis1=2, axis2=3)
        return ChannelJet(value=val, grad=grad, lap=lap)


def calculus_point_channels(params, x, activation: str):
    """Per-point multi-output forward: x (d,) -> (C,)."""
    from .mlp import _resolve_activation

    act = _resolve_activation(activation)
    h = x
    for (W, b) in params[:-1]:
        h = act(h @ W + b)
    W, b = params[-1]
    return h @ W + b
