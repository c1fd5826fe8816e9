"""Fused PINN loss+gradient Pallas kernel (one VMEM pass per tile).

Every strong-form residual loss in the reference is ``w * mean(r^2)`` with
``r`` LINEAR in the jet of the raw network (the trial factor B and the
physics enter as per-point coefficients):

* Poisson ``mean((-lap u - f)^2)``           (Poisson_ND.py:91-96)
* Helmholtz/IPW ``mean((lap u + k^2 u)^2)``  (IPW_1D_PINN_DRM.py:63-83)
* Schrodinger ``mean((-1/2 lap u + (V-E) u)^2)``
                                             (QHO_1D_PINN_DRM.py:161-174)

with ``u = B * net``:  ``lap u = B*lap(net) + 2 grad B . grad(net)
+ net * lap B`` — so for every one of them

    r_i = c_i * net_i + sum_j b_ij * dnet_ij + a_i * lap(net)_i + rhs_i

with per-point constants (a, b, c, rhs) built once from the factor jet,
the RHS/potential and the (possibly trainable) eigenvalue.

The recompute backward (:func:`.fwdlap_pallas._backward_kernel`) already
reconstructs the whole forward in VMEM; the separate jet-forward kernel is
therefore redundant work whenever the loss has this shape.  This kernel
runs the same recompute, projects the per-point (value, grad, lap) jets,
forms ``r`` IN-KERNEL from a coefficient input stream, accumulates the
loss sums, seeds the cotangents ``(r*c, r*b, r*a)`` and runs the shared
reverse sweep — loss AND parameter gradients in ONE pass (the forward
kernel's HBM stream traffic disappears; measured number in
BENCHMARKS.md, ``bench.py --kernel-mode fused``).

Coefficient layout per point (``nc = d + 4`` columns):

    [c, b_0..b_{d-1}, a, rhs, e]

where ``e`` is an optional extra-output coefficient: the kernel also
accumulates ``sum_i r_i * e_i * net_i``.  With ``e = B`` (the factor
value) that is ``sum r * u_full`` — exactly what the trainable-eigenvalue
gradient needs (``dL/dE = -(2w/N) sum r u`` for the Schrodinger residual,
QHO_1D_WAN.py:101 / KH_1D.py:217).  Pass zeros when unused.

Unlike the jet-forward kernel there is NO input-dimension cap: no jet ever
leaves the kernel, so d is limited only by VMEM (the d+2 streams).
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .fwdlap_pallas import (
    _block2,
    _dot_mode,
    _fwd_recompute,
    _pad,
    _reverse_sweep,
    pallas_available,
)


def _fused_kernel(d, K, T, activation, concat_streams, dot_dtype, packed,
                  nc, X_ref, *refs):
    """Forward recompute -> in-kernel residual -> reverse sweep, one tile.

    Inputs: X (1,T,din), W0..W_{K-2}, wlast_row (1,w), b0..b_{K-2} (1,w),
    blast (1,128) (lane-broadcast scalar), coef (1,T,dcoef).  Under
    ``packed`` din = 2d, w = 2w,
    dcoef = 2*nc (point a's nc columns then point b's).
    Outputs (accumulated over the sequential grid): dW0.., dWlast_row,
    db0.., sums (1,128) with lane 0 = sum r^2, lane 1 = sum r*c
    (the blast gradient seed), lane 2 = sum r*e*value.
    """
    n_w = K - 1
    Ws = [refs[i][...] for i in range(n_w)]
    wlast_row = refs[n_w][...]                       # (1, w)
    bs = [refs[n_w + 1 + i][...] for i in range(n_w)]
    blast = refs[2 * n_w + 1][...][:, 0:1]           # (1, 128) -> (1, 1)
    coef_ref = refs[2 * n_w + 2]                     # (1, T, dcoef)
    out_refs = refs[2 * n_w + 3:]
    dW_refs = out_refs[:n_w]
    dWlast_ref = out_refs[n_w]
    db_refs = out_refs[n_w + 1:2 * n_w + 1]
    sums_ref = out_refs[2 * n_w + 1]                 # (1, 128)

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        for r in out_refs:
            r[...] = jnp.zeros_like(r)

    prec = jax.lax.Precision.DEFAULT
    cast, dot3 = _dot_mode(dot_dtype)
    X = X_ref[0]
    Ws_c, saved, final = _fwd_recompute(
        d, K, T, activation, concat_streams, cast, prec, X, Ws, bs, packed, dot3=dot3
    )
    _, _, _, _, A, Jmid, lmid = final
    coef = coef_ref[0]                               # (T, dcoef)

    if packed:
        vw = A.shape[1]                        # last hidden (blocked) width
        left = jax.lax.broadcasted_iota(jnp.int32, (T, vw), 1) < (vw // 2)

        def proj2(S):
            """Per-half scalar projections (point a / point b)."""
            P = S * wlast_row
            return (jnp.sum(jnp.where(left, P, 0.0), axis=1, keepdims=True),
                    jnp.sum(jnp.where(left, 0.0, P), axis=1, keepdims=True))

        def cc(i):
            return coef[:, i:i + 1], coef[:, nc + i:nc + i + 1]

        va, vb = proj2(A)
        va, vb = va + blast, vb + blast
        gs = [proj2(Jm) for Jm in Jmid]
        la, lb = proj2(lmid)
        ca, cb = cc(0)
        aa, ab = cc(d + 1)
        rha, rhb = cc(d + 2)
        ea, eb = cc(d + 3)
        ra = ca * va + aa * la + rha
        rb = cb * vb + ab * lb + rhb
        for j in range(d):
            bja, bjb = cc(1 + j)
            ra = ra + bja * gs[j][0]
            rb = rb + bjb * gs[j][1]
        s_r2 = (jnp.sum(ra * ra, keepdims=True)
                + jnp.sum(rb * rb, keepdims=True))
        s_rc = (jnp.sum(ra * ca, keepdims=True)
                + jnp.sum(rb * cb, keepdims=True))
        s_ru = (jnp.sum(ra * ea * va, keepdims=True)
                + jnp.sum(rb * eb * vb, keepdims=True))
        ct_v = jnp.where(left, ra * ca, rb * cb)
        ct_g = []
        for j in range(d):
            bja, bjb = cc(1 + j)
            ct_g.append(jnp.where(left, ra * bja, rb * bjb))
        ct_l = jnp.where(left, ra * aa, rb * ab)
    else:
        value = jnp.sum(A * wlast_row, axis=1, keepdims=True) + blast
        gs = [jnp.sum(Jm * wlast_row, axis=1, keepdims=True) for Jm in Jmid]
        lap = jnp.sum(lmid * wlast_row, axis=1, keepdims=True)
        c = coef[:, 0:1]
        a_ = coef[:, d + 1:d + 2]
        rhs = coef[:, d + 2:d + 3]
        e_ = coef[:, d + 3:d + 4]
        r = c * value + a_ * lap + rhs
        for j in range(d):
            r = r + coef[:, 1 + j:2 + j] * gs[j]
        s_r2 = jnp.sum(r * r, keepdims=True)
        s_rc = jnp.sum(r * c, keepdims=True)
        s_ru = jnp.sum(r * e_ * value, keepdims=True)
        ct_v = r * c
        ct_g = [r * coef[:, 1 + j:2 + j] for j in range(d)]
        ct_l = r * a_

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    sums_ref[...] += (jnp.where(lane == 0, s_r2.reshape(1, 1), 0.0)
                      + jnp.where(lane == 1, s_rc.reshape(1, 1), 0.0)
                      + jnp.where(lane == 2, s_ru.reshape(1, 1), 0.0))
    _reverse_sweep(d, K, T, activation, concat_streams, cast, prec, packed,
                   X, Ws_c, wlast_row, saved, final, ct_v, ct_g, ct_l,
                   dW_refs, dWlast_ref, db_refs)


def _fused_drm_kernel(d, K, T, activation, concat_streams, dot_dtype,
                      packed, nc, X_ref, *refs):
    """Deep-Ritz Poisson energy in one pass: ``e_i = 1/2 |grad u|^2 - f u``
    with ``u = B*net`` (Poisson_ND.py:98-103).

    The energy is QUADRATIC in the net jet, but its cotangents are still
    per-point functions of the in-kernel projections: with the composed
    gradient ``G_j = B g_j + dB_j v`` they are ``ct_v = sum_j G_j dB_j -
    f B``, ``ct_g_j = G_j B``, ``ct_l = 0`` — so the same recompute +
    reverse-sweep machinery applies (the lap stream rides along unused).

    coef layout per point (``nc = d + 2``): ``[B, dB_0..dB_{d-1}, f]``.
    Sums: lane 0 = sum e_i, lane 1 = sum ct_v (the blast gradient seed).
    """
    n_w = K - 1
    Ws = [refs[i][...] for i in range(n_w)]
    wlast_row = refs[n_w][...]
    bs = [refs[n_w + 1 + i][...] for i in range(n_w)]
    blast = refs[2 * n_w + 1][...][:, 0:1]           # (1, 128) -> (1, 1)
    coef_ref = refs[2 * n_w + 2]
    out_refs = refs[2 * n_w + 3:]
    dW_refs = out_refs[:n_w]
    dWlast_ref = out_refs[n_w]
    db_refs = out_refs[n_w + 1:2 * n_w + 1]
    sums_ref = out_refs[2 * n_w + 1]

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        for r in out_refs:
            r[...] = jnp.zeros_like(r)

    prec = jax.lax.Precision.DEFAULT
    cast, dot3 = _dot_mode(dot_dtype)
    X = X_ref[0]
    # the energy touches value+grad only — skip the lap stream entirely
    # (d+1 streams instead of d+2 in both the recompute and the sweep)
    Ws_c, saved, final = _fwd_recompute(
        d, K, T, activation, concat_streams, cast, prec, X, Ws, bs, packed,
        with_lap=False, dot3=dot3,
    )
    _, _, _, _, A, Jmid, lmid = final
    coef = coef_ref[0]

    if packed:
        vw = A.shape[1]
        left = jax.lax.broadcasted_iota(jnp.int32, (T, vw), 1) < (vw // 2)

        def proj2(S):
            P = S * wlast_row
            return (jnp.sum(jnp.where(left, P, 0.0), axis=1, keepdims=True),
                    jnp.sum(jnp.where(left, 0.0, P), axis=1, keepdims=True))

        def cc(i):
            return coef[:, i:i + 1], coef[:, nc + i:nc + i + 1]

        va, vb = proj2(A)
        va, vb = va + blast, vb + blast
        gs = [proj2(Jm) for Jm in Jmid]
        Ba, Bb = cc(0)
        fa, fb = cc(d + 1)
        dBs = [cc(1 + j) for j in range(d)]
        Ga = [Ba * gs[j][0] + dBs[j][0] * va for j in range(d)]
        Gb = [Bb * gs[j][1] + dBs[j][1] * vb for j in range(d)]
        ea = sum(0.5 * G * G for G in Ga) - fa * Ba * va
        eb = sum(0.5 * G * G for G in Gb) - fb * Bb * vb
        ctv_a = sum(G * dBs[j][0] for j, G in enumerate(Ga)) - fa * Ba
        ctv_b = sum(G * dBs[j][1] for j, G in enumerate(Gb)) - fb * Bb
        s_e = jnp.sum(ea, keepdims=True) + jnp.sum(eb, keepdims=True)
        s_ctv = jnp.sum(ctv_a, keepdims=True) + jnp.sum(ctv_b, keepdims=True)
        ct_v = jnp.where(left, ctv_a, ctv_b)
        ct_g = [jnp.where(left, Ga[j] * Ba, Gb[j] * Bb) for j in range(d)]
        ct_l = None
    else:
        value = jnp.sum(A * wlast_row, axis=1, keepdims=True) + blast
        gs = [jnp.sum(Jm * wlast_row, axis=1, keepdims=True) for Jm in Jmid]
        B = coef[:, 0:1]
        f_ = coef[:, d + 1:d + 2]
        dBs = [coef[:, 1 + j:2 + j] for j in range(d)]
        G = [B * gs[j] + dBs[j] * value for j in range(d)]
        e = sum(0.5 * Gj * Gj for Gj in G) - f_ * B * value
        ct_v = sum(Gj * dBs[j] for j, Gj in enumerate(G)) - f_ * B
        ct_g = [Gj * B for Gj in G]
        ct_l = None
        s_e = jnp.sum(e, keepdims=True)
        s_ctv = jnp.sum(ct_v, keepdims=True)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    sums_ref[...] += (jnp.where(lane == 0, s_e.reshape(1, 1), 0.0)
                      + jnp.where(lane == 1, s_ctv.reshape(1, 1), 0.0))
    _reverse_sweep(d, K, T, activation, concat_streams, cast, prec, packed,
                   X, Ws_c, wlast_row, saved, final, ct_v, ct_g, ct_l,
                   dW_refs, dWlast_ref, db_refs)


def residual_coefficients(factor_jet, *, c0=None, b0=None, a0=1.0, rhs=None,
                          e_lane=False):
    """Build the (N, d+4) coefficient stream for ``r`` acting on u = B*net.

    The PDE operator is ``r = a0 * lap(u) + b0 . grad(u) + c0 * u + rhs``
    (per-point arrays or scalars); with ``u = B*net`` the chain rule gives
    the net-jet coefficients

        a = a0*B,  b_j = a0*2*dB_j + b0_j*B,
        c = a0*lapB + b0 . gradB + c0*B.

    ``e_lane=True`` fills the extra-output lane with B (so the kernel
    accumulates ``sum r * u_full``, the trainable-E gradient seed).
    """
    B, gB, lB = factor_jet.value, factor_jet.grad, factor_jet.lap
    N, d = gB.shape
    zero = jnp.zeros((N,), B.dtype)
    c0v = zero if c0 is None else jnp.broadcast_to(jnp.asarray(c0), (N,))
    a0v = jnp.broadcast_to(jnp.asarray(a0), (N,))
    rhsv = zero if rhs is None else jnp.broadcast_to(jnp.asarray(rhs), (N,))
    if b0 is None:
        b0v = jnp.zeros((N, d), B.dtype)
    else:
        b0v = jnp.broadcast_to(jnp.asarray(b0), (N, d))
    a = a0v * B
    b = a0v[:, None] * 2.0 * gB + b0v * B[:, None]
    c = a0v * lB + jnp.sum(b0v * gB, axis=1) + c0v * B
    e = B if e_lane else zero
    return jnp.concatenate(
        [c[:, None], b, a[:, None], rhsv[:, None], e[:, None]], axis=1
    )


def drm_coefficients(factor_jet, f=None):
    """(N, d+2) coefficient stream for the fused DRM energy kernel:
    ``[B, dB_0..dB_{d-1}, f]`` (f = 0 when absent)."""
    B, gB = factor_jet.value, factor_jet.grad
    N = B.shape[0]
    fv = (jnp.zeros((N,), B.dtype) if f is None
          else jnp.broadcast_to(jnp.asarray(f), (N,)))
    return jnp.concatenate([B[:, None], gB, fv[:, None]], axis=1)


def fused_drm_energy(
    params: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    X,
    coef,
    activation: str,
    *,
    weight: float = 1.0,
    **call_kw,
):
    """Fused Deep-Ritz Poisson energy ``loss = weight * mean(1/2 |grad
    u|^2 - f u)`` AND its parameter gradients, one VMEM pass.

    ``coef``: (N, d+2) from :func:`drm_coefficients`.  Returns ``(loss,
    aux, grads)`` like :func:`fused_linear_residual`.  (The eigenvalue
    Rayleigh QUOTIENT is not expressible in one pass — its cotangents
    need the global numerator/denominator sums — so DRM fusion covers the
    Poisson energy form only; quotient DRM stays on autodiff.)
    """
    dWs, dbs, sums, N = _fused_call(
        _fused_drm_kernel, activation, params, X, coef, X.shape[1] + 2,
        **call_kw,
    )
    loss = weight * sums[0] / N
    grads = _scaled_grads(params, dWs, dbs, sums, weight / N)
    aux = {"sum_e": sums[0], "n": N}
    return loss, aux, grads


def _fused_call(
    kernel_body,
    activation: str,
    params: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    X,
    coef,
    nc: int,
    *,
    bwd_tile: int | None = None,
    interpret: bool | None = None,
    concat_streams: bool = True,
    dot_dtype: str = "float32",
    lane_pack: int | None = None,
    scalars=None,
    grads_out: bool = True,
    coef_stream: bool = True,
):
    """Shared plumbing for the fused kernels: tile selection, padding,
    2-point lane packing, pallas_call, and dW/db block folding.

    ``kernel_body`` must follow :func:`_fused_kernel`'s signature and ref
    layout.  Returns ``(dWs, dbs, sums, N)`` with dWs/dbs the UNSCALED
    accumulated sums and ``sums`` the (128,) accumulator lane vector.

    ``scalars``: optional (128,) vector of global scalar factors streamed
    to the kernel as an extra lane-broadcast (1, 128) input placed between
    ``blast`` and ``coef`` (the two-pass quotient kernels' pass-B seeds).
    ``grads_out=False`` drops the dW/db outputs entirely (pass-A
    sums-only kernels) and returns ``(sums, N)``.
    """
    if interpret is None:
        interpret = not pallas_available()
    Ws = [W for W, _ in params]
    bs = [b.reshape(1, -1) for _, b in params]
    d = X.shape[1]
    K = len(Ws)
    if coef_stream and coef.shape != (X.shape[0], nc):
        raise ValueError(
            f"coef must be (N, {nc}) = ({X.shape[0]}, {nc}), "
            f"got {coef.shape}"
        )
    if bwd_tile is None:
        # same auto rule as the recompute backward (fwdlap_pallas)
        bwd_tile = 512 if all(W.shape[1] <= 64 for W in Ws[:-1]) else 256
    if lane_pack is None:
        lane_pack = 2 if (
            all(W.shape[1] <= 64 for W in Ws[:-1]) and bwd_tile % 2 == 0
        ) else 1
    if lane_pack not in (1, 2):
        raise ValueError(f"lane_pack must be 1 or 2, got {lane_pack}")
    if lane_pack == 2 and bwd_tile % 2:
        raise ValueError(f"lane_pack=2 needs an even tile, got {bwd_tile}")
    tile = bwd_tile
    N0 = X.shape[0]
    Xp, N, Np = _pad(X, tile)
    n_tiles = Np // tile
    coefp = coef
    if coef_stream and Np != N0:
        # zero coefficients make padded rows exact no-ops (r = 0, ct = 0)
        coefp = jnp.concatenate(
            [coef, jnp.zeros((Np - N0, nc), coef.dtype)], 0
        )
    packed = lane_pack == 2
    if packed:
        rows = tile // 2
        Xt = Xp.reshape(n_tiles, 2, rows, d).transpose(0, 2, 1, 3).reshape(
            n_tiles, rows, 2 * d)
        Ct = (coefp.reshape(n_tiles, 2, rows, nc).transpose(
            0, 2, 1, 3).reshape(n_tiles, rows, 2 * nc)
            if coef_stream else None)
        W_in = [_block2(W) for W in Ws[:-1]]
        row = Ws[-1].reshape(1, -1)
        W_in.append(jnp.concatenate([row, row], axis=1))
        b_in = [jnp.concatenate([b] * 2, axis=1) for b in bs[:-1]]
        T, din, dcoef = rows, 2 * d, 2 * nc
    else:
        Xt = Xp.reshape(n_tiles, tile, d)
        Ct = coefp.reshape(n_tiles, tile, nc) if coef_stream else None
        W_in = list(Ws[:-1]) + [Ws[-1].reshape(1, -1)]
        b_in = list(bs[:-1])
        T, din, dcoef = tile, d, nc
    # lane-pad the scalar last bias to a full vreg row: Mosaic has no
    # proven (1, 1) block precedent in these kernels (all other refs are
    # lane-width >= w); every lane carries the same value, kernels read
    # lane 0
    blast = jnp.broadcast_to(bs[-1].reshape(1, 1), (1, 128))
    kernel = functools.partial(kernel_body, d, K, T, activation,
                               concat_streams, dot_dtype, packed, nc)
    scal_in = ()
    if scalars is not None:
        scal_in = (jnp.broadcast_to(
            jnp.asarray(scalars, jnp.float32).reshape(1, -1), (1, 128)),)
    in_specs = [pl.BlockSpec((1, T, din), lambda i: (i, 0, 0))]
    in_specs += [pl.BlockSpec(W.shape, lambda i: (0, 0)) for W in W_in]
    in_specs += [pl.BlockSpec(b.shape, lambda i: (0, 0)) for b in b_in]
    in_specs += [pl.BlockSpec(blast.shape, lambda i: (0, 0))]
    in_specs += [pl.BlockSpec((1, 128), lambda i: (0, 0))
                 for _ in scal_in]
    if coef_stream:
        in_specs += [pl.BlockSpec((1, T, dcoef), lambda i: (i, 0, 0))]
    if grads_out:
        out_specs = (
            [pl.BlockSpec(W.shape, lambda i: (0, 0)) for W in W_in]
            + [pl.BlockSpec(b.shape, lambda i: (0, 0)) for b in b_in]
            + [pl.BlockSpec((1, 128), lambda i: (0, 0))]
        )
        out_shape = (
            [jax.ShapeDtypeStruct(W.shape, jnp.float32) for W in W_in]
            + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in b_in]
            + [jax.ShapeDtypeStruct((1, 128), jnp.float32)]
        )
    else:
        out_specs = [pl.BlockSpec((1, 128), lambda i: (0, 0))]
        out_shape = [jax.ShapeDtypeStruct((1, 128), jnp.float32)]
    # Propagate varying-mesh-axes: under shard_map(check_vma=True) every
    # output is a per-shard partial, varying over exactly the axes the
    # batch inputs vary over.  The replicated weights are pvary'd to the
    # same axes (numerically a no-op) so every kernel operand agrees.
    # This keeps the vma checker ON for the sharded fused step (a missing
    # pmean downstream is then a static error, not a silent wrong answer).
    try:
        vma = frozenset().union(
            jax.typeof(Xt).vma,
            jax.typeof(Ct).vma if coef_stream else frozenset())
    except (AttributeError, TypeError):  # pragma: no cover — older jax
        vma = frozenset()
    if vma:
        ax = tuple(sorted(vma))
        W_in = [jax.lax.pvary(W, ax) for W in W_in]
        b_in = [jax.lax.pvary(b, ax) for b in b_in]
        blast = jax.lax.pvary(blast, ax)
        scal_in = tuple(jax.lax.pvary(s, ax) for s in scal_in)
        out_shape = [
            jax.ShapeDtypeStruct(s.shape, s.dtype, vma=vma)
            for s in out_shape
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(Xt, *W_in, *b_in, blast, *scal_in,
      *((Ct,) if coef_stream else ()))
    if not grads_out:
        return outs[0][0], N
    sums = outs[-1][0]
    if packed:
        def fold_W(O, W):
            m, n = W.shape
            return O[:m, :n] + O[m:, n:]

        dWs = [fold_W(o, W) for o, W in zip(outs[:K - 1], Ws[:-1])]
        w = Ws[-1].shape[0]
        dWs.append((outs[K - 1][:, :w] + outs[K - 1][:, w:]).reshape(
            Ws[-1].shape))
        dbs = [
            (o[:, :b.shape[1]] + o[:, b.shape[1]:]).reshape(b.shape[1])
            for o, b in zip(outs[K:2 * K - 1], bs[:-1])
        ]
    else:
        dWs = list(outs[:K - 1]) + [outs[K - 1].reshape(Ws[-1].shape)]
        dbs = [o.reshape(b.shape[1])
               for o, b in zip(outs[K:2 * K - 1], bs[:-1])]
    return dWs, dbs, sums, N


def _scaled_grads(params, dWs, dbs, sums, scale):
    """Assemble the grads pytree: per-point-sum outputs x ``scale``; the
    last bias gradient rides accumulator lane 1 (= sum of ct_v)."""
    db_last = (scale * sums[1]).reshape(params[-1][1].shape)
    grads = [(scale * dW, scale * db) for dW, db in zip(dWs[:-1], dbs)]
    grads.append((scale * dWs[-1], db_last))
    return grads


def fused_linear_residual(
    params: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    X,
    coef,
    activation: str,
    *,
    weight: float = 1.0,
    **call_kw,
):
    """Fused ``loss = weight * mean(r^2)`` AND its parameter gradients.

    ``coef``: (N, d+4) per-point residual coefficients — see
    :func:`residual_coefficients` and the module docstring for the layout.
    Returns ``(loss, aux, grads)`` with ``grads`` matching the params
    pytree (list of (dW, db)); ``aux['sum_r_ufull'] = sum_i r_i e_i u_i``
    (the trainable-E seed) and ``aux['n']`` the point count.  X gets no
    cotangent (collocation data).  Off-TPU runs in interpreter mode.
    """
    dWs, dbs, sums, N = _fused_call(
        _fused_kernel, activation, params, X, coef, X.shape[1] + 4,
        **call_kw,
    )
    # L = weight/N * sum r^2  =>  dtheta = (2*weight/N) * sum r dr/dtheta
    loss = weight * sums[0] / N
    grads = _scaled_grads(params, dWs, dbs, sums, 2.0 * weight / N)
    aux = {"sum_r2": sums[0], "sum_r_ufull": sums[2], "n": N}
    return loss, aux, grads


# ------------------------------------------------- analytic-coefficient mode
def _poisson_sin_coef_builder(L, ks, a0=-1.0):
    """In-kernel residual coefficients for the box-FBC Poisson family.

    ``r = a0*lap(u) + rhs`` with ``u = B*net``, ``B = prod x_i (L - x_i)``
    and the manufactured ``rhs = -f = -(sum (k_i pi/L)^2) prod
    sin(k_i pi x_i / L)`` (Poisson_ND.py:49-58).  Everything is closed-form
    in x, so the (N, d+4) coefficient stream never touches HBM — the
    kernel reconstructs it from the X tile it already holds (~d+4 floats
    per point of HBM traffic deleted; the dominant remaining stream of the
    fused step at the bench shape).

    PAD SAFETY: ``_pad`` zero-fills X; at x = 0 both B and f vanish, so
    padded rows contribute exactly zero residual and zero cotangents —
    the same invariant as a zero-padded coefficient stream.
    """
    ks = tuple(float(k) for k in ks)

    def build(Xh):
        d = Xh.shape[1]
        cols = [Xh[:, i:i + 1] for i in range(d)]
        gi = [x * (L - x) for x in cols]               # per-dim factor
        # products over j != i without division (B = 0 on faces)
        def prod_except(i):
            p = None
            for j in range(d):
                if j == i:
                    continue
                p = gi[j] if p is None else p * gi[j]
            return p if p is not None else jnp.ones_like(gi[0])

        B = gi[0]
        for j in range(1, d):
            B = B * gi[j]
        dB = [(L - 2.0 * cols[i]) * prod_except(i) for i in range(d)]
        lapB = sum(-2.0 * prod_except(i) for i in range(d))
        # manufactured RHS: f = (sum (k_i pi / L)^2) prod sin(k_i pi x / L)
        s = None
        for i in range(d):
            si = jnp.sin((ks[i] * math.pi / L) * cols[i])
            s = si if s is None else s * si
        f = sum((k * math.pi / L) ** 2 for k in ks) * s
        # chain rule through the trial factor (residual_coefficients with
        # b0 = c0 = 0): a = a0*B, b_i = 2*a0*dB_i, c = a0*lapB
        a = a0 * B
        bsx = [2.0 * a0 * dBi for dBi in dB]
        c = a0 * lapB
        rhs = -f
        return c, bsx, a, rhs

    return build


def _fused_analytic_kernel(coef_builder, n_valid, d, K, T, activation,
                           concat_streams, dot_dtype, packed, nc,
                           X_ref, *refs):
    """:func:`_fused_kernel` with the coefficient stream computed IN-KERNEL
    from the X tile (no coef operand; nc unused).  Outputs and sums-lane
    layout identical to ``_fused_kernel`` (lane 2 = 0: no e lane in the
    analytic families).

    ``n_valid``: the unpadded point count — padded rows are masked out of
    the residual explicitly (a streamed coefficient tensor is zero-padded
    by construction; the analytic builder would evaluate REAL coefficients
    at the pad value instead)."""
    n_w = K - 1
    Ws = [refs[i][...] for i in range(n_w)]
    wlast_row = refs[n_w][...]
    bs = [refs[n_w + 1 + i][...] for i in range(n_w)]
    blast = refs[2 * n_w + 1][...][:, 0:1]
    out_refs = refs[2 * n_w + 2:]
    dW_refs = out_refs[:n_w]
    dWlast_ref = out_refs[n_w]
    db_refs = out_refs[n_w + 1:2 * n_w + 1]
    sums_ref = out_refs[2 * n_w + 1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in out_refs:
            r[...] = jnp.zeros_like(r)

    prec = jax.lax.Precision.DEFAULT
    cast, dot3 = _dot_mode(dot_dtype)
    X = X_ref[0]
    Ws_c, saved, final = _fwd_recompute(
        d, K, T, activation, concat_streams, cast, prec, X, Ws, bs, packed, dot3=dot3
    )
    _, _, _, _, A, Jmid, lmid = final

    if packed:
        vw = A.shape[1]
        left = jax.lax.broadcasted_iota(jnp.int32, (T, vw), 1) < (vw // 2)

        def proj2(S):
            P = S * wlast_row
            return (jnp.sum(jnp.where(left, P, 0.0), axis=1, keepdims=True),
                    jnp.sum(jnp.where(left, 0.0, P), axis=1, keepdims=True))

        va, vb = proj2(A)
        va, vb = va + blast, vb + blast
        gs = [proj2(Jm) for Jm in Jmid]
        la, lb = proj2(lmid)
        ca, bsa, aa, rha = coef_builder(X[:, :d])
        cb, bsb, ab, rhb = coef_builder(X[:, d:])
        ra = ca * va + aa * la + rha
        rb = cb * vb + ab * lb + rhb
        for j in range(d):
            ra = ra + bsa[j] * gs[j][0]
            rb = rb + bsb[j] * gs[j][1]
        # packed flat indices: half a = t*2T + r, half b = t*2T + T + r
        row = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        base = pl.program_id(0) * (2 * T)
        ra = jnp.where(base + row < n_valid, ra, 0.0)
        rb = jnp.where(base + T + row < n_valid, rb, 0.0)
        s_r2 = (jnp.sum(ra * ra, keepdims=True)
                + jnp.sum(rb * rb, keepdims=True))
        s_rc = (jnp.sum(ra * ca, keepdims=True)
                + jnp.sum(rb * cb, keepdims=True))
        ct_v = jnp.where(left, ra * ca, rb * cb)
        ct_g = [jnp.where(left, ra * bsa[j], rb * bsb[j]) for j in range(d)]
        ct_l = jnp.where(left, ra * aa, rb * ab)
    else:
        value = jnp.sum(A * wlast_row, axis=1, keepdims=True) + blast
        gs = [jnp.sum(Jm * wlast_row, axis=1, keepdims=True) for Jm in Jmid]
        lap = jnp.sum(lmid * wlast_row, axis=1, keepdims=True)
        c, bsx, a_, rhs = coef_builder(X)
        r = c * value + a_ * lap + rhs
        for j in range(d):
            r = r + bsx[j] * gs[j]
        row = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        r = jnp.where(pl.program_id(0) * T + row < n_valid, r, 0.0)
        s_r2 = jnp.sum(r * r, keepdims=True)
        s_rc = jnp.sum(r * c, keepdims=True)
        ct_v = r * c
        ct_g = [r * bsx[j] for j in range(d)]
        ct_l = r * a_

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    sums_ref[...] += (jnp.where(lane == 0, s_r2.reshape(1, 1), 0.0)
                      + jnp.where(lane == 1, s_rc.reshape(1, 1), 0.0))
    _reverse_sweep(d, K, T, activation, concat_streams, cast, prec, packed,
                   X, Ws_c, wlast_row, saved, final, ct_v, ct_g, ct_l,
                   dW_refs, dWlast_ref, db_refs)


def fused_residual_analytic(
    params: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    X,
    activation: str,
    coef_fn,
    *,
    weight: float = 1.0,
    **call_kw,
):
    """Generic fused residual step with IN-KERNEL coefficients.

    ``coef_fn((T, d) tile) -> (c, [b_0..b_{d-1}], a, rhs)`` (each a (T, 1)
    column) must be a pure jnp-traceable per-point function — it runs
    INSIDE the kernel body, so only X itself crosses HBM per step.  Any
    closed-form trial factor + physics qualifies (elementwise ops only —
    the Mosaic op set); :func:`fused_poisson_analytic` is the canonical
    instance.  Padded rows are masked by the static point count, so the
    builder need not vanish at the pad value.  Returns as
    :func:`fused_linear_residual` (aux without the trainable-E lane).
    """
    dWs, dbs, sums, N = _fused_call(
        functools.partial(_fused_analytic_kernel, coef_fn, X.shape[0]),
        activation, params, X, None, 0, coef_stream=False, **call_kw,
    )
    loss = weight * sums[0] / N
    grads = _scaled_grads(params, dWs, dbs, sums, 2.0 * weight / N)
    aux = {"sum_r2": sums[0], "n": N}
    return loss, aux, grads


def fused_poisson_analytic(
    params: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    X,
    activation: str,
    *,
    L: float,
    ks: Sequence[int],
    weight: float = 1.0,
    **call_kw,
):
    """Fused Poisson PINN step with IN-KERNEL analytic coefficients.

    ``loss = weight * mean((-lap u - f)^2)`` for ``u = B*net`` with the
    box-FBC factor and the prod-sin manufactured RHS — the coefficient
    stream of :func:`fused_linear_residual` is reconstructed inside the
    kernel from the X tile (see :func:`_poisson_sin_coef_builder`), so
    per step only X itself crosses HBM.
    """
    return fused_residual_analytic(
        params, X, activation, _poisson_sin_coef_builder(L, ks, a0=-1.0),
        weight=weight, **call_kw,
    )
