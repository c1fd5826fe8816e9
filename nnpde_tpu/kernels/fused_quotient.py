"""Two-pass fused kernels for the QUOTIENT losses (WAN weak form, Rayleigh).

The one-pass fused kernel (:mod:`.fused_step`) covers losses whose per-point
cotangent is a per-point function (``w*mean(r^2)`` with linear ``r``, and the
Poisson Deep-Ritz energy).  The reference's remaining loss shapes are
*quotients / squares of global means* — their cotangents need global sums:

* WAN weak form  ``wr^2 / (mean(phi^2) + eps)`` with ``wr = mean(integrand)``
  (IPW_1D_WAN.py:106-111, QHO_1D_WAN.py:115-140, QHO_2D.py:204-225) and the
  KH convention ``(wr / (mean(phi^2)+eps))^2`` (KH_1D.py:266-267);
* the critic objective ``-log(pde_loss + eps)`` (IPW_1D_WAN.py:114) and the
  KH direct ascent ``-pde_loss`` (KH_1D.py:347-350);
* the eigen Deep-Ritz Rayleigh quotient
  ``mean(1/2 |grad u|^2 + V u^2) / mean(u^2)``
  (IPW_1D_PINN_DRM.py:85-90, QHO_1D_PINN_DRM.py:176-185, KH_1D.py:236-242);
* the norm penalty ``(vol*mean(u^2) - 1)^2`` (IPW_1D_WAN.py:112).

Two-pass scheme (docs/FUSED_STEP.md §3):

* **Pass A** (:func:`fused_linear_sums` / :func:`fused_quad_sums`) runs the
  forward jet recompute ONLY and accumulates the global sums in spare
  accumulator lanes — no jet ever reaches HBM, no reverse sweep.
* The scalar quotient factors are combined in XLA (a handful of scalar ops).
* **Pass B** (:func:`fused_seeded_grads` / :func:`fused_quad_seeded_grads`)
  re-runs the recompute, seeds per-point cotangents from the now-known
  global scalars (streamed in as a lane-broadcast (1, 128) input) and runs
  the shared reverse sweep, emitting parameter gradients directly.

The :func:`make_fused_wan_u` / :func:`make_fused_wan_v` /
:func:`make_fused_rayleigh` factories wrap the pair in ``jax.custom_vjp`` so
the existing trainers (``jax.value_and_grad`` over the loss closure,
train/trainer.py) pick up fused gradients with no wiring changes — including
the extragradient / OGDA minimax modes.

IMPORTANT: the custom VJPs differentiate w.r.t. the NETWORK PARAMS (and the
trainable eigenvalue E where present) only; the collocation inputs and
coefficient streams receive zero cotangents by construction (they are data
in every reference trainer).  The ``aux`` dicts the losses return are
likewise metrics-only: their cotangents are discarded in the backward, so
composing an aux value into a *differentiated* objective silently
contributes zero gradient — treat aux like stop_gradient outputs.

Linear coefficient layout per point (``nc = d + 5`` columns):

    [c, b_0..b_{d-1}, a, rhs, e1, e2]

giving ``r_i = c*net + sum_j b_j*dnet_j + a*lap(net) + rhs`` and the
auxiliary accumulations ``sum (e1*net)^2`` (u^2 / phi^2 masses) and
``sum e2*net`` (the trainable-E seed ``sum u*phi`` with ``e2 = B*phi``).

Quadratic (Rayleigh) layout (``nc = d + 3``):  ``[B, dB_0..dB_{d-1}, f, V]``
giving ``e_i = 1/2 |G|^2 - f*u + V*u^2`` with ``u = B*net`` and the composed
gradient ``G_j = B*g_j + dB_j*net``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .fwdlap_pallas import _dot_mode, _fwd_recompute, _reverse_sweep
from .fused_step import _fused_call


def _unpack_common(K, refs, n_scal_refs):
    """Shared ref unpacking: weights, biases, blast, [scal], coef, outs."""
    n_w = K - 1
    Ws = [refs[i][...] for i in range(n_w)]
    wlast_row = refs[n_w][...]
    bs = [refs[n_w + 1 + i][...] for i in range(n_w)]
    blast = refs[2 * n_w + 1][...][:, 0:1]
    idx = 2 * n_w + 2
    scal = refs[idx][...] if n_scal_refs else None
    idx += n_scal_refs
    coef_ref = refs[idx]
    out_refs = refs[idx + 1:]
    return Ws, wlast_row, bs, blast, scal, coef_ref, out_refs


def _packed_helpers(A, T, nc, coef, wlast_row):
    """Shared packed-mode context: left-half lane mask, per-half scalar
    projections, and the per-half coefficient-column reader (point a's nc
    columns then point b's)."""
    vw = A.shape[1]
    left = jax.lax.broadcasted_iota(jnp.int32, (T, vw), 1) < (vw // 2)

    def proj2(S):
        P = S * wlast_row
        return (jnp.sum(jnp.where(left, P, 0.0), axis=1, keepdims=True),
                jnp.sum(jnp.where(left, 0.0, P), axis=1, keepdims=True))

    def cc(i):
        return coef[:, i:i + 1], coef[:, nc + i:nc + i + 1]

    return left, proj2, cc


def _lane_sums(pairs):
    """(1,128) accumulator row with ``pairs[k] = (lane, (1,1) value)``."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    acc = jnp.zeros((1, 128), jnp.float32)
    for k, v in pairs:
        acc = acc + jnp.where(lane == k, v.reshape(1, 1), 0.0)
    return acc


# --------------------------------------------------------------- pass A (lin)
def _linear_sums_kernel(no_lap, d, K, T, activation, concat_streams,
                        dot_dtype, packed, nc, X_ref, *refs):
    """Forward recompute only; accumulate the linear-functional sums.

    Output: sums (1, 128) with lane 0 = sum r, 1 = sum r^2,
    2 = sum (e1*v)^2, 3 = sum e2*v.

    ``no_lap``: drop the Laplacian stream (requires the ``a`` coefficient
    column to be identically zero — the WAN weak forms).
    """
    Ws, wlast_row, bs, blast, _, coef_ref, out_refs = _unpack_common(
        K, refs, 0)
    sums_ref = out_refs[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    prec = jax.lax.Precision.DEFAULT
    cast, dot3 = _dot_mode(dot_dtype)
    X = X_ref[0]
    _, _, final = _fwd_recompute(
        d, K, T, activation, concat_streams, cast, prec, X, Ws, bs, packed,
        with_lap=not no_lap, dot3=dot3,
    )
    _, _, _, _, A, Jmid, lmid = final
    coef = coef_ref[0]

    if packed:
        left, proj2, cc = _packed_helpers(A, T, nc, coef, wlast_row)
        va, vb = proj2(A)
        va, vb = va + blast, vb + blast
        gs = [proj2(Jm) for Jm in Jmid]
        ca, cb = cc(0)
        rha, rhb = cc(d + 2)
        e1a, e1b = cc(d + 3)
        e2a, e2b = cc(d + 4)
        ra = ca * va + rha
        rb = cb * vb + rhb
        if not no_lap:
            la, lb = proj2(lmid)
            aa, ab = cc(d + 1)
            ra = ra + aa * la
            rb = rb + ab * lb
        for j in range(d):
            bja, bjb = cc(1 + j)
            ra = ra + bja * gs[j][0]
            rb = rb + bjb * gs[j][1]
        s_r = jnp.sum(ra, keepdims=True) + jnp.sum(rb, keepdims=True)
        s_r2 = (jnp.sum(ra * ra, keepdims=True)
                + jnp.sum(rb * rb, keepdims=True))
        s_m = (jnp.sum((e1a * va) ** 2, keepdims=True)
               + jnp.sum((e1b * vb) ** 2, keepdims=True))
        s_e2 = (jnp.sum(e2a * va, keepdims=True)
                + jnp.sum(e2b * vb, keepdims=True))
    else:
        value = jnp.sum(A * wlast_row, axis=1, keepdims=True) + blast
        gs = [jnp.sum(Jm * wlast_row, axis=1, keepdims=True) for Jm in Jmid]
        c = coef[:, 0:1]
        rhs = coef[:, d + 2:d + 3]
        e1 = coef[:, d + 3:d + 4]
        e2 = coef[:, d + 4:d + 5]
        r = c * value + rhs
        if not no_lap:
            lap = jnp.sum(lmid * wlast_row, axis=1, keepdims=True)
            r = r + coef[:, d + 1:d + 2] * lap
        for j in range(d):
            r = r + coef[:, 1 + j:2 + j] * gs[j]
        s_r = jnp.sum(r, keepdims=True)
        s_r2 = jnp.sum(r * r, keepdims=True)
        s_m = jnp.sum((e1 * value) ** 2, keepdims=True)
        s_e2 = jnp.sum(e2 * value, keepdims=True)

    sums_ref[...] += _lane_sums(
        [(0, s_r), (1, s_r2), (2, s_m), (3, s_e2)])


# --------------------------------------------------------------- pass B (lin)
def _linear_seeded_kernel(no_lap, d, K, T, activation, concat_streams,
                          dot_dtype, packed, nc, X_ref, *refs):
    """Seeded reverse sweep: cotangents from GLOBAL scalars (scal input).

    scal lanes: 0 = s_r (linear-functional seed), 1 = s_q (quadratic-mass
    seed on ``(e1*v)^2``), 2 = s_l (linear seed on ``e2*v``).  Per point:

        ct_v   = s_r*c + s_q*2*e1^2*v + s_l*e2
        ct_g_j = s_r*b_j
        ct_l   = s_r*a       (dropped under ``no_lap`` — a must be 0)

    Outputs: dW0.., dWlast_row, db0.., sums (lane 0 = sum ct_v, the blast
    gradient).
    """
    Ws, wlast_row, bs, blast, scal, coef_ref, out_refs = _unpack_common(
        K, refs, 1)
    n_w = K - 1
    dW_refs = out_refs[:n_w]
    dWlast_ref = out_refs[n_w]
    db_refs = out_refs[n_w + 1:2 * n_w + 1]
    sums_ref = out_refs[2 * n_w + 1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in out_refs:
            r[...] = jnp.zeros_like(r)

    s_r = scal[:, 0:1]
    s_q = scal[:, 1:2]
    s_l = scal[:, 2:3]

    prec = jax.lax.Precision.DEFAULT
    cast, dot3 = _dot_mode(dot_dtype)
    X = X_ref[0]
    Ws_c, saved, final = _fwd_recompute(
        d, K, T, activation, concat_streams, cast, prec, X, Ws, bs, packed,
        with_lap=not no_lap, dot3=dot3,
    )
    _, _, _, _, A, Jmid, lmid = final
    coef = coef_ref[0]

    if packed:
        left, proj2, cc = _packed_helpers(A, T, nc, coef, wlast_row)
        va, vb = proj2(A)
        va, vb = va + blast, vb + blast
        ca, cb = cc(0)
        e1a, e1b = cc(d + 3)
        e2a, e2b = cc(d + 4)
        ctv_a = s_r * ca + s_q * 2.0 * e1a * e1a * va + s_l * e2a
        ctv_b = s_r * cb + s_q * 2.0 * e1b * e1b * vb + s_l * e2b
        ct_v = jnp.where(left, ctv_a, ctv_b)
        ct_g = []
        for j in range(d):
            bja, bjb = cc(1 + j)
            ct_g.append(jnp.where(left, s_r * bja, s_r * bjb))
        if no_lap:
            ct_l = None
        else:
            aa, ab = cc(d + 1)
            ct_l = jnp.where(left, s_r * aa, s_r * ab)
        s_ctv = (jnp.sum(ctv_a, keepdims=True)
                 + jnp.sum(ctv_b, keepdims=True))
    else:
        value = jnp.sum(A * wlast_row, axis=1, keepdims=True) + blast
        c = coef[:, 0:1]
        e1 = coef[:, d + 3:d + 4]
        e2 = coef[:, d + 4:d + 5]
        ct_v = s_r * c + s_q * 2.0 * e1 * e1 * value + s_l * e2
        ct_g = [s_r * coef[:, 1 + j:2 + j] for j in range(d)]
        ct_l = None if no_lap else s_r * coef[:, d + 1:d + 2]
        s_ctv = jnp.sum(ct_v, keepdims=True)

    sums_ref[...] += _lane_sums([(0, s_ctv)])
    _reverse_sweep(d, K, T, activation, concat_streams, cast, prec, packed,
                   X, Ws_c, wlast_row, saved, final, ct_v, ct_g, ct_l,
                   dW_refs, dWlast_ref, db_refs)


# -------------------------------------------------------------- pass A (quad)
def _quad_sums_kernel(d, K, T, activation, concat_streams, dot_dtype,
                      packed, nc, X_ref, *refs):
    """Forward recompute only; Rayleigh numerator/denominator sums.

    coef ``[B, dB_0.., f, V]``; lanes: 0 = sum e (e = 1/2|G|^2 - f u +
    V u^2), 1 = sum u^2.
    """
    Ws, wlast_row, bs, blast, _, coef_ref, out_refs = _unpack_common(
        K, refs, 0)
    sums_ref = out_refs[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    prec = jax.lax.Precision.DEFAULT
    cast, dot3 = _dot_mode(dot_dtype)
    X = X_ref[0]
    # quadratic energies touch value+grad only — never propagate the lap
    # stream (d+1 streams instead of d+2)
    _, _, final = _fwd_recompute(
        d, K, T, activation, concat_streams, cast, prec, X, Ws, bs, packed,
        with_lap=False, dot3=dot3,
    )
    _, _, _, _, A, Jmid, lmid = final
    coef = coef_ref[0]

    if packed:
        left, proj2, cc = _packed_helpers(A, T, nc, coef, wlast_row)
        va, vb = proj2(A)
        va, vb = va + blast, vb + blast
        gs = [proj2(Jm) for Jm in Jmid]
        Ba, Bb = cc(0)
        fa, fb = cc(d + 1)
        Va, Vb = cc(d + 2)
        ua, ub = Ba * va, Bb * vb
        ea = -fa * ua + Va * ua * ua
        eb = -fb * ub + Vb * ub * ub
        for j in range(d):
            dBa, dBb = cc(1 + j)
            Ga = Ba * gs[j][0] + dBa * va
            Gb = Bb * gs[j][1] + dBb * vb
            ea = ea + 0.5 * Ga * Ga
            eb = eb + 0.5 * Gb * Gb
        s_e = jnp.sum(ea, keepdims=True) + jnp.sum(eb, keepdims=True)
        s_u2 = (jnp.sum(ua * ua, keepdims=True)
                + jnp.sum(ub * ub, keepdims=True))
    else:
        value = jnp.sum(A * wlast_row, axis=1, keepdims=True) + blast
        gs = [jnp.sum(Jm * wlast_row, axis=1, keepdims=True) for Jm in Jmid]
        B = coef[:, 0:1]
        f_ = coef[:, d + 1:d + 2]
        V_ = coef[:, d + 2:d + 3]
        u = B * value
        e = -f_ * u + V_ * u * u
        for j in range(d):
            G = B * gs[j] + coef[:, 1 + j:2 + j] * value
            e = e + 0.5 * G * G
        s_e = jnp.sum(e, keepdims=True)
        s_u2 = jnp.sum(u * u, keepdims=True)

    sums_ref[...] += _lane_sums([(0, s_e), (1, s_u2)])


# -------------------------------------------------------------- pass B (quad)
def _quad_seeded_kernel(d, K, T, activation, concat_streams, dot_dtype,
                        packed, nc, X_ref, *refs):
    """Seeded reverse sweep for the quadratic energy family.

    scal lanes: 0 = s_e (energy seed), 1 = s_q (u^2-mass seed).

        ct_v   = s_e*(sum_j G_j dB_j - f B + 2 V u B) + s_q*2*B^2*v
        ct_g_j = s_e*G_j*B
        ct_l   = 0
    """
    Ws, wlast_row, bs, blast, scal, coef_ref, out_refs = _unpack_common(
        K, refs, 1)
    n_w = K - 1
    dW_refs = out_refs[:n_w]
    dWlast_ref = out_refs[n_w]
    db_refs = out_refs[n_w + 1:2 * n_w + 1]
    sums_ref = out_refs[2 * n_w + 1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in out_refs:
            r[...] = jnp.zeros_like(r)

    s_e = scal[:, 0:1]
    s_q = scal[:, 1:2]

    prec = jax.lax.Precision.DEFAULT
    cast, dot3 = _dot_mode(dot_dtype)
    X = X_ref[0]
    Ws_c, saved, final = _fwd_recompute(
        d, K, T, activation, concat_streams, cast, prec, X, Ws, bs, packed,
        with_lap=False, dot3=dot3,
    )
    _, _, _, _, A, Jmid, lmid = final
    coef = coef_ref[0]

    if packed:
        left, proj2, cc = _packed_helpers(A, T, nc, coef, wlast_row)
        va, vb = proj2(A)
        va, vb = va + blast, vb + blast
        gs = [proj2(Jm) for Jm in Jmid]
        Ba, Bb = cc(0)
        fa, fb = cc(d + 1)
        Va, Vb = cc(d + 2)
        ua, ub = Ba * va, Bb * vb
        ctv_a = -fa * Ba + 2.0 * Va * ua * Ba
        ctv_b = -fb * Bb + 2.0 * Vb * ub * Bb
        ct_g = []
        for j in range(d):
            dBa, dBb = cc(1 + j)
            Ga = Ba * gs[j][0] + dBa * va
            Gb = Bb * gs[j][1] + dBb * vb
            ctv_a = ctv_a + Ga * dBa
            ctv_b = ctv_b + Gb * dBb
            ct_g.append(jnp.where(left, s_e * Ga * Ba, s_e * Gb * Bb))
        ctv_a = s_e * ctv_a + s_q * 2.0 * Ba * Ba * va
        ctv_b = s_e * ctv_b + s_q * 2.0 * Bb * Bb * vb
        ct_v = jnp.where(left, ctv_a, ctv_b)
        ct_l = None
        s_ctv = (jnp.sum(ctv_a, keepdims=True)
                 + jnp.sum(ctv_b, keepdims=True))
    else:
        value = jnp.sum(A * wlast_row, axis=1, keepdims=True) + blast
        gs = [jnp.sum(Jm * wlast_row, axis=1, keepdims=True) for Jm in Jmid]
        B = coef[:, 0:1]
        f_ = coef[:, d + 1:d + 2]
        V_ = coef[:, d + 2:d + 3]
        u = B * value
        ct_v = -f_ * B + 2.0 * V_ * u * B
        ct_g = []
        for j in range(d):
            G = B * gs[j] + coef[:, 1 + j:2 + j] * value
            ct_v = ct_v + G * coef[:, 1 + j:2 + j]
            ct_g.append(s_e * G * B)
        ct_v = s_e * ct_v + s_q * 2.0 * B * B * value
        ct_l = None
        s_ctv = jnp.sum(ct_v, keepdims=True)

    sums_ref[...] += _lane_sums([(0, s_ctv)])
    _reverse_sweep(d, K, T, activation, concat_streams, cast, prec, packed,
                   X, Ws_c, wlast_row, saved, final, ct_v, ct_g, ct_l,
                   dW_refs, dWlast_ref, db_refs)


# --------------------------------------------------------- coefficient builders
def linear_functional_coefficients(factor_jet, *, c0=None, b0=None, a0=0.0,
                                   rhs=None, e1=None, e2=None):
    """(N, d+5) stream for a linear functional ``r`` of ``u = B*net``.

    The functional is ``r = a0*lap(u) + b0 . grad(u) + c0*u + rhs`` in the
    FULL solution u; the trial-factor chain rule is delegated to
    :func:`.fused_step.residual_coefficients` (single source of the
    product-rule algebra) and the auxiliary lanes are appended:
    ``e1``/``e2`` fill the mass/linear lanes directly (per-point arrays;
    default 0) — e.g. ``e1 = B`` accumulates ``sum u^2``, ``e2 = B*phi``
    accumulates ``sum u*phi``.
    """
    from .fused_step import residual_coefficients

    B = factor_jet.value
    N, d = factor_jet.grad.shape
    zero = jnp.zeros((N,), B.dtype)
    core = residual_coefficients(factor_jet, c0=c0, b0=b0, a0=a0, rhs=rhs)
    e1v = zero if e1 is None else jnp.broadcast_to(jnp.asarray(e1), (N,))
    e2v = zero if e2 is None else jnp.broadcast_to(jnp.asarray(e2), (N,))
    # core = [c, b_0.., a, rhs, e(unused)]; replace the e lane with e1, e2
    return jnp.concatenate(
        [core[:, :d + 3], e1v[:, None], e2v[:, None]], axis=1
    )


def quotient_coefficients(factor_jet, *, f=None, V=None):
    """(N, d+3) stream ``[B, dB_0.., f, V]`` for the quadratic energy
    kernels: ``e = 1/2|grad u|^2 - f u + V u^2`` (V=None -> Poisson energy,
    f=None -> Schrodinger Rayleigh numerator).  Reuses
    :func:`.fused_step.drm_coefficients` for the [B, dB, f] block."""
    from .fused_step import drm_coefficients

    B = factor_jet.value
    N = B.shape[0]
    core = drm_coefficients(factor_jet, f=f)
    Vv = (jnp.zeros((N,), B.dtype) if V is None
          else jnp.broadcast_to(jnp.asarray(V), (N,)))
    return jnp.concatenate([core, Vv[:, None]], axis=1)


# ------------------------------------------------------------------- raw API
def fused_linear_sums(params, X, coef, activation: str, *,
                      no_lap: bool = False, **call_kw):
    """Pass A: ``{'sum_r', 'sum_r2', 'sum_mass', 'sum_e2', 'n'}``.

    ``no_lap=True`` drops the Laplacian stream — only valid when the
    ``a`` coefficient column is identically zero (WAN weak forms)."""
    sums, N = _fused_call(
        functools.partial(_linear_sums_kernel, no_lap), activation,
        params, X, coef, X.shape[1] + 5,
        grads_out=False, **call_kw,
    )
    return {"sum_r": sums[0], "sum_r2": sums[1], "sum_mass": sums[2],
            "sum_e2": sums[3], "n": N}


def fused_seeded_grads(params, X, coef, scalars, activation: str, *,
                       no_lap: bool = False, **call_kw):
    """Pass B: grads of ``s_r*sum r + s_q*sum (e1 v)^2 + s_l*sum e2 v``.

    ``scalars = (s_r, s_q, s_l)`` — global factors computed in XLA from
    pass A's sums (they must already include any 1/N and chain factors).
    ``no_lap`` as in :func:`fused_linear_sums`.
    """
    s = jnp.zeros((128,), jnp.float32)
    s = s.at[0].set(scalars[0]).at[1].set(scalars[1]).at[2].set(scalars[2])
    dWs, dbs, sums, _ = _fused_call(
        functools.partial(_linear_seeded_kernel, no_lap), activation,
        params, X, coef, X.shape[1] + 5,
        scalars=s, **call_kw,
    )
    grads = [(dW, db) for dW, db in zip(dWs[:-1], dbs)]
    grads.append((dWs[-1], sums[0].reshape(params[-1][1].shape)))
    return grads


def fused_quad_sums(params, X, coef, activation: str, **call_kw):
    """Pass A (quadratic): ``{'sum_e', 'sum_u2', 'n'}``."""
    sums, N = _fused_call(
        _quad_sums_kernel, activation, params, X, coef, X.shape[1] + 3,
        grads_out=False, **call_kw,
    )
    return {"sum_e": sums[0], "sum_u2": sums[1], "n": N}


def fused_quad_seeded_grads(params, X, coef, scalars, activation: str,
                            **call_kw):
    """Pass B (quadratic): grads of ``s_e*sum e + s_q*sum u^2``."""
    s = jnp.zeros((128,), jnp.float32)
    s = s.at[0].set(scalars[0]).at[1].set(scalars[1])
    dWs, dbs, sums, _ = _fused_call(
        _quad_seeded_kernel, activation, params, X, coef, X.shape[1] + 3,
        scalars=s, **call_kw,
    )
    grads = [(dW, db) for dW, db in zip(dWs[:-1], dbs)]
    grads.append((dWs[-1], sums[0].reshape(params[-1][1].shape)))
    return grads


# --------------------------------------------------------- custom-vjp losses
def _zeros_like_tree(t):
    return jax.tree_util.tree_map(jnp.zeros_like, t)


def _global_sums(s, axis):
    """psum the pass-A sums over the mesh axis/axes and scale n to the
    global point count (equal shards under shard_map)."""
    if axis is None:
        return s, s["n"]
    g = {k: (jax.lax.psum(v, axis) if k != "n" else v) for k, v in s.items()}
    return g, s["n"] * jax.lax.psum(1, axis)


def _global_grads(grads, axis):
    """psum the pass-B per-shard gradient sums (the seed scalars already
    carry the global 1/n, so the plain sum over all shards is exact)."""
    if axis is None:
        return grads
    return jax.tree_util.tree_map(lambda g: jax.lax.psum(g, axis), grads)


def make_fused_rayleigh(activation: str, *, weight: float = 1.0,
                        den_eps: float = 0.0, axis=None, **call_kw):
    """Fused eigen-DRM Rayleigh quotient with custom VJP.

    Returns ``loss(params, X, coef) -> (loss, aux)`` computing
    ``weight * mean(e) / (mean(u^2) + den_eps)`` with ``e`` from
    :func:`quotient_coefficients` (V set, f unused) — the reference's
    ``DRM_loss`` (IPW_1D_PINN_DRM.py:85-90, KH_1D.py:236-242).  ``aux``
    carries ``rayleigh`` (the unweighted quotient = the DRM energy estimate
    KH tracks as E-hat, KH_1D.py:393-399) and the raw means.  Gradients
    flow to ``params`` only.
    """
    # Default the in-kernel dots to bf16x3: the quotient backward seeds
    # every gradient from GLOBAL sums, so single-pass DEFAULT-dot noise in
    # those sums contaminates the whole gradient (measured on TPU,
    # artifacts/kernel_accuracy.json: w128 grad rel-err 0.10 -> 1.3e-3).
    call_kw.setdefault("dot_dtype", "bf16x3")
    @jax.custom_vjp
    def loss(params, X, coef):
        out, _ = _fwd(params, X, coef)
        return out

    def _fwd(params, X, coef):
        s = fused_quad_sums(params, X, coef, activation, **call_kw)
        s, n = _global_sums(s, axis)
        num = s["sum_e"] / n
        den = s["sum_u2"] / n
        q = num / (den + den_eps)
        aux = {"rayleigh": q, "mean_e": num, "mean_u2": den}
        return (weight * q, aux), (params, X, coef, num, den, n)

    def _bwd(res, ct):
        params, X, coef, num, den, n = res
        g = ct[0] * weight
        s_e = g / ((den + den_eps) * n)
        s_q = -g * num / ((den + den_eps) ** 2 * n)
        grads = fused_quad_seeded_grads(params, X, coef, (s_e, s_q),
                                        activation, **call_kw)
        return (_global_grads(grads, axis), jnp.zeros_like(X),
                jnp.zeros_like(coef))

    loss.defvjp(_fwd, _bwd)
    return loss


def make_fused_quad_mean(activation: str, *, weight: float = 1.0,
                         axis=None, **call_kw):
    """Fused quadratic-energy MEAN with custom VJP: ``loss(params, X,
    coef) = weight * mean(1/2|grad u|^2 - f u + V u^2)``.

    Covers plain quadratic regularisers — e.g. the Poisson WAN critic's
    ``mean(|grad v|^2 + v^2)`` (Poisson_ND.py:125-126) via ``V = 1/2`` and
    ``weight = 2*reg`` — without materialising the jet.  Same two-pass
    machinery as :func:`make_fused_rayleigh` with the denominator removed.
    """
    # Default the in-kernel dots to bf16x3: the quotient backward seeds
    # every gradient from GLOBAL sums, so single-pass DEFAULT-dot noise in
    # those sums contaminates the whole gradient (measured on TPU,
    # artifacts/kernel_accuracy.json: w128 grad rel-err 0.10 -> 1.3e-3).
    call_kw.setdefault("dot_dtype", "bf16x3")
    @jax.custom_vjp
    def loss(params, X, coef):
        out, _ = _fwd(params, X, coef)
        return out

    def _fwd(params, X, coef):
        s = fused_quad_sums(params, X, coef, activation, **call_kw)
        s, n = _global_sums(s, axis)
        mean_e = s["sum_e"] / n
        aux = {"mean_e": mean_e, "mean_u2": s["sum_u2"] / n}
        return (weight * mean_e, aux), (params, X, coef, n)

    def _bwd(res, ct):
        params, X, coef, n = res
        s_e = ct[0] * weight / n
        grads = fused_quad_seeded_grads(params, X, coef, (s_e, 0.0),
                                        activation, **call_kw)
        return (_global_grads(grads, axis), jnp.zeros_like(X),
                jnp.zeros_like(coef))

    loss.defvjp(_fwd, _bwd)
    return loss


def _wan_dp(convention, wr, pn, eps):
    """(p, dp/dwr, dp/dpn) for the two reference conventions."""
    if convention == "wr2_over_norm":
        den = pn + eps
        return wr * wr / den, 2.0 * wr / den, -(wr * wr) / (den * den)
    if convention == "ratio_sq":
        den = pn + eps
        return ((wr / den) ** 2, 2.0 * wr / (den * den),
                -2.0 * wr * wr / (den ** 3))
    raise ValueError(f"Unknown WAN convention {convention!r}")


def make_fused_wan_u(activation: str, *, convention: str = "wr2_over_norm",
                     eps: float = 1e-8, vol: float = 1.0,
                     w_pde: float = 1.0, w_norm: float = 0.0, axis=None,
                     **call_kw):
    """Fused WAN primal (u) objective with custom VJP.

    Returns ``loss(params, E, X, base, phi_norm) -> (loss, aux)`` where

    * ``base`` is :func:`linear_functional_coefficients` built with E = 0
      (``c0 = V*phi``, ``b0 = pref*grad phi``, ``e1 = B``, ``e2 = B*phi``);
      the E-term is folded in here as ``c -= E*e2`` so the trainable
      eigenvalue stays differentiable (QHO_1D_WAN.py:131, KH_1D.py:264);
    * ``phi_norm = mean(phi^2)`` is computed OUTSIDE (phi is data for the
      u-step);
    * ``loss = w_pde * p + w_norm * (vol*mean(u^2) - 1)^2`` with ``p`` the
      selected convention of ``wan_pde_loss`` (IPW_1D_WAN.py:111-112).

    Gradients flow to ``params`` and ``E`` only (zero cotangents for X,
    base; exact scalar cotangent for phi_norm).
    """
    # Default the in-kernel dots to bf16x3: the quotient backward seeds
    # every gradient from GLOBAL sums, so single-pass DEFAULT-dot noise in
    # those sums contaminates the whole gradient (measured on TPU,
    # artifacts/kernel_accuracy.json: w128 grad rel-err 0.10 -> 1.3e-3).
    call_kw.setdefault("dot_dtype", "bf16x3")
    @jax.custom_vjp
    def loss(params, E, X, base, phi_norm):
        out, _ = _fwd(params, E, X, base, phi_norm)
        return out

    def _fwd(params, E, X, base, phi_norm):
        coef = base.at[:, 0].add(-E * base[:, -1])
        # the weak form has no lap term (a == 0 by the coefficient
        # contract) — run the recompute without the lap stream
        s = fused_linear_sums(params, X, coef, activation, no_lap=True,
                              **call_kw)
        s, n = _global_sums(s, axis)
        wr = s["sum_r"] / n
        mu2 = s["sum_mass"] / n
        p, _, _ = _wan_dp(convention, wr, phi_norm, eps)
        norm_term = (vol * mu2 - 1.0) ** 2
        total = w_pde * p + w_norm * norm_term
        aux = {"weak_residual": wr, "pde_loss": p, "norm": norm_term,
               "mean_u2": mu2, "phi_norm": phi_norm}
        return (total, aux), (params, X, coef, wr, mu2, phi_norm,
                              s["sum_e2"], n)

    def _bwd(res, ct):
        params, X, coef, wr, mu2, phi_norm, sum_uphi, n = res
        g = ct[0]
        _, dp_dwr, dp_dpn = _wan_dp(convention, wr, phi_norm, eps)
        s_r = g * w_pde * dp_dwr / n
        s_q = g * w_norm * 2.0 * (vol * mu2 - 1.0) * vol / n
        grads = fused_seeded_grads(params, X, coef, (s_r, s_q, 0.0),
                                   activation, no_lap=True, **call_kw)
        # dwr/dE = -(1/n) sum u*phi (the e2 lane)
        dE = g * w_pde * dp_dwr * (-sum_uphi / n)
        d_pn = g * w_pde * dp_dpn
        return (_global_grads(grads, axis), dE, jnp.zeros_like(X),
                jnp.zeros_like(coef), d_pn)

    loss.defvjp(_fwd, _bwd)
    return loss


def make_fused_wan_v(activation: str, *, convention: str = "wr2_over_norm",
                     eps: float = 1e-8, objective: str = "neg_log",
                     log_eps: float = 1e-8, axis=None, **call_kw):
    """Fused WAN critic (v) objective with custom VJP.

    Returns ``loss_v(params, X, coef) -> (loss_v, aux)`` where ``coef`` is
    :func:`linear_functional_coefficients` over the CRITIC net with the
    bump w as its factor jet (``c0 = (V-E)*u`` or ``-f``, ``b0 =
    pref*grad u``, ``e1 = w`` so the mass lane is ``sum phi^2``), and

    * ``objective='neg_log'``: ``-log(p + log_eps)`` (IPW_1D_WAN.py:114);
    * ``objective='neg'``: ``-p`` (KH direct ascent, KH_1D.py:347-350).

    phi_norm here is IN the objective (it is the critic's own mass), so its
    gradient seeds the quadratic lane.  Gradients flow to ``params`` only.
    """
    if objective not in ("neg_log", "neg"):
        raise ValueError(f"Unknown critic objective {objective!r}")

    # Default the in-kernel dots to bf16x3: the quotient backward seeds
    # every gradient from GLOBAL sums, so single-pass DEFAULT-dot noise in
    # those sums contaminates the whole gradient (measured on TPU,
    # artifacts/kernel_accuracy.json: w128 grad rel-err 0.10 -> 1.3e-3).
    call_kw.setdefault("dot_dtype", "bf16x3")
    @jax.custom_vjp
    def loss_v(params, X, coef):
        out, _ = _fwd(params, X, coef)
        return out

    def _fwd(params, X, coef):
        s = fused_linear_sums(params, X, coef, activation, no_lap=True,
                              **call_kw)
        s, n = _global_sums(s, axis)
        wr = s["sum_r"] / n
        pn = s["sum_mass"] / n
        p, _, _ = _wan_dp(convention, wr, pn, eps)
        val = -jnp.log(p + log_eps) if objective == "neg_log" else -p
        aux = {"weak_residual": wr, "pde_loss": p, "phi_norm": pn}
        return (val, aux), (params, X, coef, wr, pn, p, n)

    def _bwd(res, ct):
        params, X, coef, wr, pn, p, n = res
        g = ct[0]
        _, dp_dwr, dp_dpn = _wan_dp(convention, wr, pn, eps)
        outer = (-g / (p + log_eps)) if objective == "neg_log" else -g
        s_r = outer * dp_dwr / n
        s_q = outer * dp_dpn / n
        grads = fused_seeded_grads(params, X, coef, (s_r, s_q, 0.0),
                                   activation, no_lap=True, **call_kw)
        return (_global_grads(grads, axis), jnp.zeros_like(X),
                jnp.zeros_like(coef))

    loss_v.defvjp(_fwd, _bwd)
    return loss_v
