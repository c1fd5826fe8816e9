"""Pallas TPU kernel: fused MLP forward-Laplacian with custom VJP.

The XLA path (:func:`nnpde_tpu.ops.fwdlap.mlp_fwdlap`) is bandwidth-optimal
in the forward but its backward materialises every jet cotangent stream in
HBM per elementwise op (~10x the forward cost).  This kernel keeps the whole
per-tile pipeline in VMEM:

* the (value, d x jacobian, laplacian) streams are flat 2D ``(T, w)``
  values (3D stacks measured as pure VMEM-relayout overhead in round 1);
* the backward **recomputes** the forward inside the tile
  (rematerialisation in VMEM — no activation spill to HBM) and accumulates
  dW/db across batch tiles by revisiting the same output block on TPU's
  sequential grid;
* **2-point lane packing** (round 2): at width <= 64 two collocation
  points share each 128-lane vreg row (block-diagonal weights, diagonal
  blocks folded host-side) — the kernels are VPU-bound at 64 lanes, and
  packing doubles both VPU and MXU utilisation (grad 14.4 -> 7.6 ms at the
  bench workload, BENCHMARKS.md);
* dots run bf16x3 (three DEFAULT-precision MXU passes, f32-class accuracy,
  lap rel-err ~5e-6; Mosaic rejects Precision.HIGH/HIGHEST here).

Exactness: identical math to the XLA path (the Forward-Laplacian recurrence,
arXiv:2307.08214).  Differentiable via ``jax.custom_vjp`` (cotangents w.r.t.
weights and biases; X is collocation data and gets a zero cotangent).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend may be unavailable on pure-CPU installs
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def pallas_available() -> bool:
    try:
        return _HAS_PLTPU and jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------- activations
def _act_fns(name: str):
    """(sigma, sigma', sigma'', sigma''').

    The first three derivatives are shared with the XLA jet path
    (:func:`nnpde_tpu.ops.fwdlap.activation_jet`) so the two backends cannot
    drift; only the third derivative (needed by the recompute backward) is
    defined locally.
    """
    from ..ops.fwdlap import activation_jet

    s, s1, s2 = activation_jet(name)
    if name == "sin":
        def s3(v):
            return -jnp.cos(v)
    elif name == "tanh":
        def s3(v):
            t = jnp.tanh(v)
            return (1.0 - t * t) * (6.0 * t * t - 2.0)
    elif name == "gelu":
        inv_sqrt2pi = 0.3989422804014327

        def s3(v):
            return (v * v * v - 4.0 * v) * inv_sqrt2pi * jnp.exp(-0.5 * v * v)
    else:  # pragma: no cover - activation_jet already raised
        raise ValueError(f"Unknown activation {name!r}")
    return s, s1, s2, s3


def _dot(a, b, precision=jax.lax.Precision.HIGHEST):
    return jnp.dot(
        a, b, preferred_element_type=jnp.float32, precision=precision
    )


def _dot_mode(dot_dtype):
    """(cast, dot3) for a fused-kernel ``dot_dtype`` option: 'float32' =
    single-pass DEFAULT dots on f32 inputs, 'bfloat16' = cast inputs to
    bf16 (cheapest), 'bf16x3' = three-pass splitting (f32-class, used by
    the quotient kernels whose global sums seed every gradient)."""
    if dot_dtype == "bfloat16":
        return (lambda x: x.astype(jnp.bfloat16)), False
    if dot_dtype not in ("float32", "bf16x3"):
        raise ValueError(f"Unknown dot_dtype {dot_dtype!r}")
    return (lambda x: x), dot_dtype == "bf16x3"


def _dot3(a, b):
    """bf16x3 matmul (~f32-accurate, 3 single-pass MXU dots).

    Mosaic rejects Precision.HIGH, so the classic splitting is done by
    hand: x = hi(x) + lo(x) with hi = bf16 round-trip; the (lo, lo) term
    is below f32 noise and dropped.  Measured lap rel-err ~3e-5 vs the
    6-pass HIGHEST XLA path at half the MXU cost."""
    prec = jax.lax.Precision.DEFAULT
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    b_lo = b - b_hi
    return (_dot(a_hi, b_hi, prec) + _dot(a_hi, b_lo, prec)
            + _dot(a_lo, b_hi, prec))


# ------------------------------------------------------- forward stream sweep
def _fwd_streams(X, Ws, bs, d, T, act, keep_pre=False,
                 precision=jax.lax.Precision.HIGHEST):
    """3D stacked-stream forward.

    S (d+2, T, w): S[0] value, S[1+i] jacobian row i, S[d+1] laplacian.
    ``bs`` entries are (1, w).  Returns (S_last, pre_acts) where pre_acts[k]
    is the stack before the activation of hidden transition k (empty unless
    keep_pre).
    """
    s, s1f, s2f, _ = act
    w0 = Ws[0]
    width = w0.shape[1]
    v = _dot(X, w0, precision) + bs[0]
    S = jnp.stack(
        [v]
        + [jnp.broadcast_to(w0[i:i + 1, :], (T, width)) for i in range(d)]
        + [jnp.zeros((T, width), jnp.float32)],
        axis=0,
    )
    pre_acts = []
    for k in range(1, len(Ws)):
        if keep_pre:
            pre_acts.append(S)
        v = S[0]
        s1v, s2v = s1f(v), s2f(v)
        sumJ2 = jnp.zeros_like(v)
        for i in range(d):
            sumJ2 = sumJ2 + S[1 + i] * S[1 + i]
        newS = jnp.stack(
            [s(v)]
            + [s1v * S[1 + i] for i in range(d)]
            + [s1v * S[d + 1] + s2v * sumJ2],
            axis=0,
        )
        width_out = Ws[k].shape[1]
        S = _dot(newS.reshape((d + 2) * T, width), Ws[k], precision)
        S = S.reshape(d + 2, T, width_out)
        S = jnp.concatenate([S[0:1] + bs[k][None], S[1:]], axis=0)
    return S, pre_acts


# --------------------------------------------------- forward kernel (v2, 2D)
def _forward_kernel2(d, K, T, activation, fwd_dot, packed, X_ref, *refs):
    """VMEM-resident jet forward with flat 2D streams.

    The XLA forward is HBM-bound (~5 ms at the bench workload: every layer
    materialises its (N,w)/(N,d,w) streams); here the whole layer pipeline
    stays in VMEM and only the (T, 128)-padded jet leaves the chip
    (N x 512 B vs ~2 GB).  Dots run at bf16x3 precision (Mosaic rejects Precision.HIGH) —
    bf16x3 via _dot3; measured lap rel-err ~3e-5 vs HIGHEST, far below solver noise floors.

    Inputs: X (1,T,d), W0 (d,w), W1..W_{K-2} (w,w), wlast_row (1,w),
    b0..b_{K-2} (1,w), blast (1,1).  Output: (1, T, 8) with lanes
    0..d+1 = (value, grad_0..grad_{d-1}, lap).  ``fwd_dot``: 'bf16x3'
    (exact-f32 class, lap rel-err ~5e-6) or 'default' (1-pass bf16 dots,
    lap rel-err ~2e-3, ~2x faster — pair with a bf16x3 tail phase for
    final accuracy, cf. the hybrid compute_dtype machinery).
    """
    act_name = activation
    n_w = K - 1
    Ws = [refs[i][...] for i in range(n_w)]
    wlast_row = refs[n_w][...]
    bs = [refs[n_w + 1 + i][...] for i in range(n_w)]
    blast = refs[2 * n_w + 1][...]                    # (1, 1)
    out_ref = refs[2 * n_w + 2]

    X = X_ref[0]
    w0 = Ws[0]
    width = w0.shape[1]
    if fwd_dot == "bf16x3":
        dot = _dot3
    else:
        dot = lambda a, b: _dot(a, b, jax.lax.Precision.DEFAULT)
    v = dot(X, w0) + bs[0]
    if packed:
        # blocked W0: row i is [W0_i | 0], row d+i is [0 | W0_i] — the sum
        # seeds both halves' jacobian streams (see _backward_kernel)
        Js = [jnp.broadcast_to(w0[i:i + 1, :] + w0[d + i:d + i + 1, :],
                               (T, width)) for i in range(d)]
    else:
        Js = [jnp.broadcast_to(w0[i:i + 1, :], (T, width)) for i in range(d)]
    l = jnp.zeros((T, width), jnp.float32)
    for k in range(1, K - 1):
        pack = _act_pack(act_name, v)
        A, Jmid, lmid = _nl_mid_pack(pack, Js, l)
        v = dot(A, Ws[k]) + bs[k]
        Js = [dot(Jm, Ws[k]) for Jm in Jmid]
        l = dot(lmid, Ws[k])
    pack = _act_pack(act_name, v)
    A, Jmid, lmid = _nl_mid_pack(pack, Js, l)
    vw = v.shape[1]
    if packed:
        # per-half projections: point a rides lanes [0, w), b lanes [w, 2w)
        left = jax.lax.broadcasted_iota(jnp.int32, (T, vw), 1) < (vw // 2)

        def proj2(S):
            P = S * wlast_row
            return (jnp.sum(jnp.where(left, P, 0.0), axis=1, keepdims=True),
                    jnp.sum(jnp.where(left, 0.0, P), axis=1, keepdims=True))

        va, vb = proj2(A)
        ga = [proj2(Jm) for Jm in Jmid]
        la, lb = proj2(lmid)
        lane = jax.lax.broadcasted_iota(jnp.int32, (T, 16), 1)
        out = (jnp.where(lane == 0, va + blast, 0.0)
               + jnp.where(lane == 8, vb + blast, 0.0)
               + jnp.where(lane == d + 1, la, 0.0)
               + jnp.where(lane == 8 + d + 1, lb, 0.0))
        for i, (gl, gr) in enumerate(ga):
            out = (out + jnp.where(lane == 1 + i, gl, 0.0)
                   + jnp.where(lane == 9 + i, gr, 0.0))
        out_ref[...] = out[None]
        return
    # scalar projection via VPU lane reduction (no (w,1) matmul in Mosaic)
    value = jnp.sum(A * wlast_row, axis=1, keepdims=True) + blast
    grads = [jnp.sum(Jm * wlast_row, axis=1, keepdims=True) for Jm in Jmid]
    lap = jnp.sum(lmid * wlast_row, axis=1, keepdims=True)
    # assemble the (T, 128) output with lane masks — narrow lane concats
    # are unsupported by Mosaic, broadcasts + selects are free
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, 8), 1)
    out = jnp.where(lane == 0, value, 0.0)
    for i, g in enumerate(grads):
        out = out + jnp.where(lane == 1 + i, g, 0.0)
    out = out + jnp.where(lane == d + 1, lap, 0.0)
    out_ref[...] = out[None]


def _run_forward2(flat_params, X, activation, tile, interpret,
                  fwd_dot="bf16x3", lane_pack=1):
    Ws, bs = _split_params(flat_params)
    d = X.shape[1]
    K = len(Ws)
    Xp, N, Np = _pad(X, tile)
    n_tiles = Np // tile
    packed = lane_pack == 2
    if packed:
        rows = tile // 2
        Xt = Xp.reshape(n_tiles, 2, rows, d).transpose(0, 2, 1, 3).reshape(
            n_tiles, rows, 2 * d)
        W_in = [_block2(W) for W in Ws[:-1]]
        row = Ws[-1].reshape(1, -1)
        W_in.append(jnp.concatenate([row, row], axis=1))
        b_in = [jnp.concatenate([b.reshape(1, -1)] * 2, axis=1)
                for b in bs[:-1]] + [bs[-1].reshape(1, 1)]
        T, din, dout = rows, 2 * d, 16
    else:
        Xt = Xp.reshape(n_tiles, tile, d)
        W_in = list(Ws[:-1]) + [Ws[-1].reshape(1, -1)]
        b_in = list(bs[:-1]) + [bs[-1].reshape(1, 1)]
        T, din, dout = tile, d, 8
    kernel = functools.partial(_forward_kernel2, d, K, T, activation,
                               fwd_dot, packed)
    in_specs = [pl.BlockSpec((1, T, din), lambda i: (i, 0, 0))]
    in_specs += [pl.BlockSpec(W.shape, lambda i: (0, 0)) for W in W_in]
    in_specs += [pl.BlockSpec(b.shape, lambda i: (0, 0)) for b in b_in]
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T, dout), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles, T, dout), jnp.float32),
        interpret=interpret,
    )(Xt, *W_in, *b_in)
    if packed:
        # (n_tiles, T/2, 16) -> halves back to point order
        out = out.reshape(n_tiles, T, 2, 8).transpose(0, 2, 1, 3)
    return out.reshape(Np, 8)[:N, :d + 2]


# ------------------------------------------------------------ forward kernel
def _forward_kernel(d, n_layers, T, activation, X_ref, *refs):
    Ws = [refs[i][...] for i in range(n_layers)]
    bs = [refs[n_layers + i][...] for i in range(n_layers)]
    out_ref = refs[2 * n_layers]
    act = _act_fns(activation)
    S, _ = _fwd_streams(X_ref[0], Ws, bs, d, T, act)
    out_ref[...] = S[..., 0][None]        # (1, d+2, T)


# ----------------------------------------------------------- backward kernel
def _dg_rows(a, b, prec=jax.lax.Precision.DEFAULT):
    """Contract over the batch (row) dim: (T, m) x (T, n) -> (m, n).

    Expressed as a dot_general so Mosaic lowers it as a transposed-LHS
    matmul — no explicit VMEM transpose copy."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _dg_cols(a, w, prec=jax.lax.Precision.DEFAULT):
    """Pull a cotangent back through W: (T, n) x (m, n) -> (T, m)
    (i.e. a @ W^T without materialising the transpose)."""
    return jax.lax.dot_general(
        a, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


def _act_pack(name, v):
    """(s, s', s'', s''') evaluated with the minimal transcendental count.

    For sin the four derivatives are +-sin/+-cos — two transcendentals,
    not four; same sharing for tanh (one tanh) and gelu (one exp+erf).
    This matters because the Pallas backward is VPU-bound (measured: bf16
    dots change nothing, so the MXU is not the limiter)."""
    if name == "sin":
        sv, cv = jnp.sin(v), jnp.cos(v)
        return sv, cv, -sv, -cv
    if name == "tanh":
        t = jnp.tanh(v)
        u = 1.0 - t * t
        return t, u, -2.0 * t * u, u * (6.0 * t * t - 2.0)
    if name == "gelu":
        import jax as _jax

        inv_sqrt2pi = 0.3989422804014327
        pdf = inv_sqrt2pi * jnp.exp(-0.5 * v * v)
        cdf = 0.5 * (1.0 + _jax.scipy.special.erf(
            v / jnp.sqrt(2.0).astype(v.dtype)))
        return (v * cdf, cdf + v * pdf, (2.0 - v * v) * pdf,
                (v * v * v - 4.0 * v) * pdf)
    raise ValueError(f"Unknown activation {name!r}")


def _sum_sq(Js):
    q = None
    for Ji in Js:
        q = Ji * Ji if q is None else q + Ji * Ji
    return q


def _nl_mid_pack(pack, Js, l):
    """Forward through the nonlinearity stage given a derivative pack."""
    s0, s1v, s2v, _ = pack
    return s0, [s1v * Ji for Ji in Js], s1v * l + s2v * _sum_sq(Js)


def _nl_bwd_pack(pack, Js, l, q, dA, dJmid, dlmid):
    """Backward through the stage, reusing the shared derivative pack and
    the precomputed q = sum_i J_i^2.

    ``dlmid=None`` is the no-lap mode (the lap stream was never
    propagated forward — value+grad functionals only): the dl/dq chain
    terms vanish and the returned dl is None."""
    _, s1v, s2v, s3v = pack
    if dlmid is None:
        dv = s1v * dA
        dJs_out = []
        for Ji, dJm in zip(Js, dJmid):
            dv = dv + s2v * Ji * dJm
            dJs_out.append(s1v * dJm)
        return dv, dJs_out, None
    dl = s1v * dlmid
    dq = s2v * dlmid
    dv = s1v * dA + (s2v * l + s3v * q) * dlmid
    dJs_out = []
    for Ji, dJm in zip(Js, dJmid):
        dv = dv + s2v * Ji * dJm
        dJs_out.append(s1v * dJm + 2.0 * Ji * dq)
    return dv, dJs_out, dl


def _fwd_recompute(d, K, T, activation, concat_streams, cast, prec,
                   X, Ws, bs, packed, with_lap=True, dot3=False):
    """Shared VMEM forward recompute with flat 2D (T, w) streams.

    Used by both the recompute backward (:func:`_backward_kernel`) and the
    fused loss+grad kernel (:mod:`.fused_step`).  Returns
    ``(Ws_c, saved, final)`` where ``saved[k-1] = (Js, l, q, pack, Jmid,
    lmid)`` holds hidden stage ``k``'s streams and ``final = (Js, l, q,
    pack, A, Jmid, lmid)`` is the last stage pre-projection.

    ``with_lap=False`` drops the Laplacian stream entirely — d+1 streams
    instead of d+2 (and no q = sum J^2 / s'' work).  Used by the quotient
    kernels whose functionals touch value+grad only (DRM energies, WAN
    weak forms with a == 0): ~1/(d+2) less VMEM traffic and dot work.
    The l/q/lmid slots in saved/final are None in this mode.

    ``dot3=True`` runs the recompute dots at bf16x3 (:func:`_dot3`,
    f32-class) instead of single-pass DEFAULT — the quotient kernels use
    this so the GLOBAL sums (the weak residual wr) are as accurate as the
    jet-forward kernel's; the quotient backward multiplies every gradient
    by wr, so wr's relative error contaminates the whole gradient
    (measured on TPU: wan_u grad rel-err 0.10 at DEFAULT -> the bf16x3
    pass restores the 1e-3-class bar of the linear kernels).  Requires
    ``cast`` = identity (f32 inputs).
    """
    w0 = Ws[0]
    width = w0.shape[1]
    Ws_c = [cast(W) for W in Ws]
    dot = (lambda a, b: _dot3(a, b)) if dot3 else (
        lambda a, b: _dot(cast(a), b, prec))

    def fwd_linear(k, A, Jmid, lmid):
        """One ((d+2)T, w) dot or d+2 separate dots."""
        W = Ws_c[k]
        if concat_streams:
            S = jnp.concatenate(
                [A] + Jmid + ([lmid] if with_lap else []), axis=0)
            O = dot(S, W)
            v = O[:T] + bs[k]
            Js = [O[(1 + i) * T:(2 + i) * T] for i in range(d)]
            return v, Js, (O[(d + 1) * T:] if with_lap else None)
        v = dot(A, W) + bs[k]
        Js = [dot(Jm, W) for Jm in Jmid]
        return v, Js, (dot(lmid, W) if with_lap else None)

    # ---- forward recompute; per-stage packs and mid streams stay in VMEM
    # (the reverse sweep reuses them — no second nonlinearity evaluation)
    v = dot(X, cast(w0)) + bs[0]
    if packed:
        # blocked W0 rows are [W0_i | 0] (row i) and [0 | W0_i] (row d+i);
        # their sum is the per-half jacobian seed [W0_i | W0_i]
        Js = [jnp.broadcast_to(w0[i:i + 1, :] + w0[d + i:d + i + 1, :],
                               (T, width)) for i in range(d)]
    else:
        Js = [jnp.broadcast_to(w0[i:i + 1, :], (T, width)) for i in range(d)]
    l = jnp.zeros((T, width), jnp.float32) if with_lap else None

    def stage(v, Js, l):
        pack = _act_pack(activation, v)
        if with_lap:
            q = _sum_sq(Js)
            lmid = pack[1] * l + pack[2] * q
        else:
            q = lmid = None
        return pack, q, pack[0], [pack[1] * Ji for Ji in Js], lmid

    saved = []
    for k in range(1, K - 1):
        pack, q, A, Jmid, lmid = stage(v, Js, l)
        saved.append((Js, l, q, pack, Jmid, lmid))
        v, Js, l = fwd_linear(k, A, Jmid, lmid)
    pack, q, A, Jmid, lmid = stage(v, Js, l)
    return Ws_c, saved, (Js, l, q, pack, A, Jmid, lmid)


def _reverse_sweep(d, K, T, activation, concat_streams, cast, prec, packed,
                   X, Ws_c, wlast_row, saved, final, ct_v, ct_g, ct_l,
                   dW_refs, dWlast_ref, db_refs):
    """Shared in-tile reverse sweep given per-mid-stream cotangents.

    ``ct_v/ct_g/ct_l``: cotangents of the FINAL mid streams already
    broadcast to (T, w) shape (under ``packed``, per-half).  Accumulates
    dW/db into the output refs across TPU's sequential grid.

    ``ct_l=None`` selects the no-lap mode and requires ``final``/``saved``
    from ``_fwd_recompute(..., with_lap=False)``.
    """
    Js, l, q, pack, A, Jmid, lmid = final
    with_lap = ct_l is not None
    width = Ws_c[0].shape[1]
    G = A * ct_v + (lmid * ct_l if with_lap else 0.0)
    for Jm, cg in zip(Jmid, ct_g):
        G = G + Jm * cg
    dWlast_ref[...] += jnp.sum(G, axis=0, keepdims=True)
    # pullback through the projection: each mid cotangent is ct * w_row
    dAm = ct_v * wlast_row
    dJm = [cg * wlast_row for cg in ct_g]
    dlm = ct_l * wlast_row if with_lap else None
    dv, dJs, dl = _nl_bwd_pack(pack, Js, l, q, dAm, dJm, dlm)

    # ---- hidden linear layers K-2 .. 1
    for k in range(K - 2, 0, -1):
        Js_e, l_e, q, pack, Jmid, lmid = saved[k - 1]
        A = pack[0]
        if concat_streams:
            Astk = cast(jnp.concatenate(
                [A] + Jmid + ([lmid] if with_lap else []), axis=0))
            Dstk = cast(jnp.concatenate(
                [dv] + dJs + ([dl] if with_lap else []), axis=0))
            dW_refs[k][...] += _dg_rows(Astk, Dstk, prec)
            db_refs[k][...] += jnp.sum(dv, axis=0, keepdims=True)
            P = _dg_cols(Dstk, Ws_c[k], prec)
            dAm = P[:T]
            dJm = [P[(1 + i) * T:(2 + i) * T] for i in range(d)]
            dlm = P[(d + 1) * T:] if with_lap else None
        else:
            dW = _dg_rows(cast(A), cast(dv), prec)
            if with_lap:
                dW = dW + _dg_rows(cast(lmid), cast(dl), prec)
            for Jm_s, dJ in zip(Jmid, dJs):
                dW = dW + _dg_rows(cast(Jm_s), cast(dJ), prec)
            dW_refs[k][...] += dW
            db_refs[k][...] += jnp.sum(dv, axis=0, keepdims=True)
            dAm = _dg_cols(cast(dv), Ws_c[k], prec)
            dJm = [_dg_cols(cast(dJ), Ws_c[k], prec) for dJ in dJs]
            dlm = _dg_cols(cast(dl), Ws_c[k], prec) if with_lap else None
        dv, dJs, dl = _nl_bwd_pack(pack, Js_e, l_e, q, dAm, dJm, dlm)

    # ---- input layer: v0 = X @ W0 + b0; J0_i = W0[i, :] broadcast; l0 = 0
    dW0 = _dg_rows(cast(X), cast(dv), prec)
    rows = [jnp.sum(dJ, axis=0, keepdims=True) for dJ in dJs]
    if packed:
        # jacobian-seed grads go to the diagonal blocks the host will fold:
        # left-half lanes onto row i (top block), right-half onto row d+i
        lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
        lrow = lane_row < (width // 2)
        rows = ([jnp.where(lrow, r, 0.0) for r in rows]
                + [jnp.where(lrow, 0.0, r) for r in rows])
    dW0 = dW0 + jnp.concatenate(rows, axis=0)         # (d, w) sublane concat
    dW_refs[0][...] += dW0.astype(jnp.float32)
    db_refs[0][...] += jnp.sum(dv, axis=0, keepdims=True)


def _backward_kernel(d, K, T, activation, concat_streams, dot_dtype,
                     packed, X_ref, *refs):
    """Recompute the forward in VMEM with flat 2D (T, w) streams, then
    reverse in the same tile; accumulate dW/db across TPU's sequential grid.

    Round-1 postmortem: the 3D stacked-stream variant spent its time on
    VMEM relayout copies (jnp.stack / (d+2,T,w)<->((d+2)T,w) reshapes) and
    no longer compiles on the remote Mosaic helper.  This version keeps
    every stream a separate 2D value, uses dot_general for all transposed
    contractions, and leaves the narrow (w,1) output projection to the
    host-side rule (ct arrives pre-multiplied; see _bwd_rule).

    ``concat_streams``: merge the d+2 per-stage dots into one ((d+2)T, w)
    dot via sublane concat (fewer MXU pipeline drains).  ``dot_dtype``:
    'bfloat16' casts dot INPUTS to bf16 (f32 accumulate) — gradients are
    means over >= 1e5 points, so the quantisation noise averages out.

    ``packed``: 2-point lane packing.  Width-64 nets use only half of every
    8x128 VPU vreg and a quarter of each 128x128 MXU tile (measured: both
    kernels VPU-bound at 64 lanes).  With ``packed`` the host passes
    block-diagonal weights (2w = 128 lanes) and each stream row carries TWO
    collocation points — point a in lanes [0, w), point b in lanes [w, 2w).
    The jet recurrence is lane-local and the linear maps are block-diagonal,
    so the kernel body is unchanged; only the J-stream init, the cotangent
    unpacking and the dW0 jacobian-row placement are half-aware.  The host
    folds the two diagonal blocks of every dW on the way out.

    Inputs: X (1,T,d) block, W0 (d,w), W1..W_{K-2} (w,w), WlastT (1,w),
    b0..b_{K-2} (1,w), ct (1,T,d+2); under ``packed`` T counts ROWS (=
    points/2), d -> 2d, w -> 2w, d+2 -> 2(d+2).
    Outputs (accumulated): dW0 (d,w), dW1.. (w,w), dWlast_row (1,w),
    db0..b_{K-2} (1,w) — blocked shapes under ``packed``.
    """
    n_w = K - 1          # W0 .. W_{K-2} passed whole; W_{K-1} as row
    Ws = [refs[i][...] for i in range(n_w)]
    wlast_row = refs[n_w][...]                       # (1, w)
    bs = [refs[n_w + 1 + i][...] for i in range(n_w)]
    ct_ref = refs[2 * n_w + 1]                       # (1, T, d+2)
    out_refs = refs[2 * n_w + 2:]
    dW_refs = out_refs[:n_w]
    dWlast_ref = out_refs[n_w]                       # (1, w)
    db_refs = out_refs[n_w + 1:]

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        for r in out_refs:
            r[...] = jnp.zeros_like(r)

    prec = jax.lax.Precision.DEFAULT
    cast = ((lambda x: x.astype(jnp.bfloat16))
            if dot_dtype == "bfloat16" else (lambda x: x))
    X = X_ref[0]                                      # (T, d)
    Ws_c, saved, final = _fwd_recompute(
        d, K, T, activation, concat_streams, cast, prec, X, Ws, bs, packed
    )

    # ---- final stage: cotangents arrive pre-multiplied from the host rule
    ct = ct_ref[0]                                    # (T, d+2)
    if packed:
        # per-half cotangent broadcast: lanes [0, w) get point a's scalar,
        # lanes [w, 2w) point b's (ct block layout: a's d+2 cols then b's)
        vw = final[4].shape[1]                  # last hidden (blocked) width
        left = jax.lax.broadcasted_iota(jnp.int32, (T, vw), 1) < (vw // 2)

        def two(i):
            return jnp.where(left, ct[:, i:i + 1], ct[:, d + 2 + i:d + 3 + i])

        ct_v = two(0)
        ct_g = [two(1 + i) for i in range(d)]
        ct_l = two(d + 1)
    else:
        ct_v = ct[:, 0:1]
        ct_g = [ct[:, 1 + i:2 + i] for i in range(d)]
        ct_l = ct[:, d + 1:d + 2]
    _reverse_sweep(d, K, T, activation, concat_streams, cast, prec, packed,
                   X, Ws_c, wlast_row, saved, final, ct_v, ct_g, ct_l,
                   dW_refs, dWlast_ref, db_refs)


# --------------------------------------------------------------- entry points
def _pad(X, T):
    N = X.shape[0]
    Np = ((N + T - 1) // T) * T
    if Np != N:
        X = jnp.concatenate([X, jnp.zeros((Np - N, X.shape[1]), X.dtype)], 0)
    return X, N, Np


def _split_params(flat_params):
    n = len(flat_params) // 2
    return list(flat_params[:n]), list(flat_params[n:])


def _run_forward(flat_params, X, activation, tile, interpret):
    Ws, bs = _split_params(flat_params)
    d = X.shape[1]
    n_layers = len(Ws)
    Xp, N, Np = _pad(X, tile)
    n_tiles = Np // tile
    Xt = Xp.reshape(n_tiles, tile, d)
    kernel = functools.partial(_forward_kernel, d, n_layers, tile, activation)
    in_specs = [pl.BlockSpec((1, tile, d), lambda i: (i, 0, 0))]
    in_specs += [pl.BlockSpec(W.shape, lambda i: (0, 0)) for W in Ws]
    in_specs += [pl.BlockSpec(b.shape, lambda i: (0, 0)) for b in bs]
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, d + 2, tile), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles, d + 2, tile), jnp.float32),
        interpret=interpret,
    )(Xt, *Ws, *bs)
    # (n_tiles, d+2, T) -> (N, d+2)
    out = out.transpose(0, 2, 1).reshape(Np, d + 2)
    return out[:N]


def _primal(flat_params, X, activation, tile, interpret, fwd_impl,
            lane_pack=1):
    """Primal (N, d+2) jet streams.

    Default 'xla': the stream-propagation forward fused by XLA — measured
    bandwidth-optimal vs the 6-pass HIGHEST Pallas forward kernel; under
    custom_vjp XLA saves no residuals, so there is nothing for the kernel
    forward to win back.  'pallas2' is the VMEM jet forward — with 2-point
    lane packing it beats the XLA forward at width 64 (BENCHMARKS.md).
    """
    if fwd_impl == "pallas":
        return _run_forward(flat_params, X, activation, tile, interpret)
    if fwd_impl.startswith("pallas2"):
        mode = "default" if fwd_impl.endswith(":default") else "bf16x3"
        return _run_forward2(flat_params, X, activation, tile, interpret,
                             fwd_dot=mode, lane_pack=lane_pack)
    from ..ops.fwdlap import mlp_fwdlap

    Ws, bs = _split_params(flat_params)
    jet = mlp_fwdlap(list(zip(Ws, bs)), X, activation)
    return jnp.concatenate(
        [jet.value[:, None], jet.grad, jet.lap[:, None]], axis=1
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def _fwdlap_core(flat_params, X, activation, tile, bwd_tile, interpret,
                 fwd_impl, concat_streams, dot_dtype, lane_pack):
    return _primal(flat_params, X, activation, tile, interpret, fwd_impl,
                   lane_pack)


def _fwd_rule(flat_params, X, activation, tile, bwd_tile, interpret,
              fwd_impl, concat_streams, dot_dtype, lane_pack):
    return _primal(flat_params, X, activation, tile, interpret, fwd_impl,
                   lane_pack), (
        flat_params,
        X,
    )


def _block2(W):
    """Block-diagonal duplication [[W, 0], [0, W]] for 2-point lane packing."""
    z = jnp.zeros_like(W)
    return jnp.concatenate([
        jnp.concatenate([W, z], axis=1),
        jnp.concatenate([z, W], axis=1),
    ], axis=0)


def _bwd_rule(activation, fwd_tile, bwd_tile, interpret, fwd_impl,
              concat_streams, dot_dtype, lane_pack, res, ct):
    flat_params, X = res
    tile = bwd_tile
    Ws, bs = _split_params(flat_params)
    d = X.shape[1]
    K = len(Ws)
    N0 = X.shape[0]
    Xp, N, Np = _pad(X, tile)
    n_tiles = Np // tile
    if Np != N0:
        ct = jnp.concatenate([ct, jnp.zeros((Np - N0, d + 2), ct.dtype)], 0)
    packed = lane_pack == 2
    if packed:
        # two points per stream row: the tile's first T/2 points ride lanes
        # [0, w), the second T/2 lanes [w, 2w); weights become block-diag
        rows = tile // 2
        Xt = Xp.reshape(n_tiles, 2, rows, d).transpose(0, 2, 1, 3).reshape(
            n_tiles, rows, 2 * d)
        ct_t = ct.reshape(n_tiles, 2, rows, d + 2).transpose(
            0, 2, 1, 3).reshape(n_tiles, rows, 2 * (d + 2))
        W_in = [_block2(W) for W in Ws[:-1]]
        row = Ws[-1].reshape(1, -1)
        W_in.append(jnp.concatenate([row, row], axis=1))
        b_in = [jnp.concatenate([b.reshape(1, -1)] * 2, axis=1)
                for b in bs[:-1]]
        T, din, dct = rows, 2 * d, 2 * (d + 2)
    else:
        Xt = Xp.reshape(n_tiles, tile, d)
        ct_t = ct.reshape(n_tiles, tile, d + 2)
        # the kernel takes W_{K-1} (w, 1) as its row form (1, w) and returns
        # dW_{K-1} as a row too — narrow (w, 1) shapes never enter Mosaic
        W_in = list(Ws[:-1]) + [Ws[-1].reshape(1, -1)]
        b_in = [b.reshape(1, -1) for b in bs[:-1]]
        T, din, dct = tile, d, d + 2
    kernel = functools.partial(_backward_kernel, d, K, T, activation,
                               concat_streams, dot_dtype, packed)
    in_specs = [pl.BlockSpec((1, T, din), lambda i: (i, 0, 0))]
    in_specs += [pl.BlockSpec(W.shape, lambda i: (0, 0)) for W in W_in]
    in_specs += [pl.BlockSpec(b.shape, lambda i: (0, 0)) for b in b_in]
    in_specs += [pl.BlockSpec((1, T, dct), lambda i: (i, 0, 0))]
    out_specs = (
        [pl.BlockSpec(W.shape, lambda i: (0, 0)) for W in W_in]
        + [pl.BlockSpec(b.shape, lambda i: (0, 0)) for b in b_in]
    )
    out_shape = (
        [jax.ShapeDtypeStruct(W.shape, jnp.float32) for W in W_in]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in b_in]
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(Xt, *W_in, *b_in, ct_t)
    if packed:
        # fold the diagonal blocks of every accumulated gradient
        def fold_W(O, W):
            m, n = W.shape
            return O[:m, :n] + O[m:, n:]

        dWs = tuple(fold_W(o, W) for o, W in zip(outs[:K - 1], Ws[:-1]))
        w = Ws[-1].shape[0]
        dWs = dWs + ((outs[K - 1][:, :w] + outs[K - 1][:, w:]).reshape(
            Ws[-1].shape),)
        dbs_hidden = tuple(
            (o[:, :b.shape[1]] + o[:, b.shape[1]:]).reshape(b.shape)
            for o, b in zip(outs[K:], bs[:-1])
        )
    else:
        dWs = tuple(outs[:K - 1]) + (outs[K - 1].reshape(Ws[-1].shape),)
        dbs_hidden = tuple(o.reshape(b.shape)
                           for o, b in zip(outs[K:], bs[:-1]))
    # db for the projection layer never enters the kernel: b_last only
    # shifts the value stream, so its grad is just sum of the value ct
    db_last = jnp.sum(ct[:, 0]).reshape(bs[-1].shape)
    dbs = dbs_hidden + (db_last,)
    return (dWs + dbs, jnp.zeros_like(X))


_fwdlap_core.defvjp(_fwd_rule, _bwd_rule)


def mlp_fwdlap_pallas(
    params: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    X,
    activation: str,
    *,
    tile: int | None = None,
    bwd_tile: int | None = None,
    interpret: bool | None = None,
    fwd_impl: str = "xla",
    concat_streams: bool = True,
    dot_dtype: str = "float32",
    lane_pack: int | None = None,
):
    """Fused (u, grad u, lap u) with the Pallas recompute-in-VMEM backward.

    Forward: XLA stream propagation by default (bandwidth-optimal, exact
    f32); ``fwd_impl='pallas'`` uses the VMEM forward kernel instead.
    Backward: one Pallas pass per tile — recompute the forward in VMEM,
    reverse in-tile, accumulate dW/db across the sequential grid.  No jet
    cotangent stream ever touches HBM (the XLA backward materialises ~25
    of them — BENCHMARKS.md).

    Returns the same :class:`~nnpde_tpu.ops.fwdlap.Jet` as the XLA path;
    off-TPU the kernel runs in interpreter mode (tests).  Biases are
    carried as (1, w) inside the kernel (TPU prefers 2D); the public
    params layout is unchanged.
    """
    from ..ops.fwdlap import Jet

    if interpret is None:
        interpret = not pallas_available()
    Ws = tuple(W for W, _ in params)
    bs = tuple(b.reshape(1, -1) for _, b in params)
    d_in = X.shape[1]
    if tile is None:
        # auto: the VMEM jet forward's scoped allocation scales with
        # tile x width — tile=1024 OOMs the 16 MB scope at w=256
        # (measured: 16.55M requested; f32[w,tile,8] jet stack + streams),
        # so halve the forward tile for widths above 128
        tile = 1024 if all(W.shape[1] <= 128 for W in Ws[:-1]) else 512
    if bwd_tile is None:
        # auto: the recompute backward holds ~3(2d+7) (T, w) f32 streams in
        # VMEM (~16 MB/core) — T=512 fits at width <= 64 (packed: 128
        # lanes), wider nets halve the tile (measured w128: bwd 256 ≈ 512
        # in speed, 1024 OOMs scoped vmem; BENCHMARKS.md width table)
        bwd_tile = 512 if all(W.shape[1] <= 64 for W in Ws[:-1]) else 256
    if lane_pack is None:
        # auto: pack two points per 128-lane vreg when every hidden width
        # fits in half a vreg (measured: the kernel is VPU-bound at 64
        # lanes, BENCHMARKS.md) — requires an even backward tile
        lane_pack = 2 if (
            all(W.shape[1] <= 64 for W in Ws[:-1]) and bwd_tile % 2 == 0
        ) else 1
    if lane_pack not in (1, 2):
        raise ValueError(f"lane_pack must be 1 or 2, got {lane_pack}")
    if lane_pack == 2 and (tile % 2 or bwd_tile % 2):
        raise ValueError(
            f"lane_pack=2 needs even tiles (two points per stream row); "
            f"got tile={tile}, bwd_tile={bwd_tile}"
        )
    if fwd_impl == "auto":
        # measured at the bench workload (BENCHMARKS.md): the VMEM jet
        # forward beats the XLA stream forward whenever the jet fits its
        # 8-lane-per-point output layout (d + 2 <= 8) — packed at w <= 64
        # (3.7 vs 5.3 ms) and unpacked at w = 128 (19.4M vs 12.4M pts/s
        # full step).  At w <= 64 the UNPACKED kernel loses (6.5 ms), but
        # lane_pack is already 2 there unless the caller forced it off.
        # d >= 7 jets don't fit a single vreg row — XLA stream forward
        # (the d >= 7 packed-collision fix, ADVICE r2).
        fwd_impl = "pallas2" if d_in + 2 <= 8 else "xla"
    if fwd_impl.startswith("pallas2") and d_in + 2 > 8:
        raise ValueError(
            f"fwd_impl='pallas2' supports input dim <= 6 (8 output lanes "
            f"per point), got d={d_in}; use fwd_impl='xla'"
        )
    out = _fwdlap_core(Ws + bs, X, activation, tile, bwd_tile, interpret,
                       fwd_impl, concat_streams, dot_dtype, lane_pack)
    d = X.shape[1]
    return Jet(value=out[:, 0], grad=out[:, 1:1 + d], lap=out[:, 1 + d])
