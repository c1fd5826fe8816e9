"""Two-pass fused kernels for the MULTI-test-function WAN weak form.

The multi-bump WAN (``IPW2DConfig.n_test_grid > 1`` — a framework extension
beyond the reference's single global bump, which yields rank-1 gradient
information per step: ``/root/reference/Schrodinger_Equations/
Infinite_Potential_Well/IPW_1D_WAN.py:106-111`` has ONE weak residual) keeps
one weak residual per localised test function ``phi_k = w_k * v``:

    loss_pde = mean_k( wr_k^2 / (mean(phi_k^2) + eps) ),
    wr_k     = mean_i( pref * grad u . grad phi_k + (V - E) * u * phi_k ).

The single-bump two-pass kernels (:mod:`.fused_quotient`) accumulate ONE
(weak, mass) pair in spare accumulator lanes; here the lane machinery is
widened to K pairs — pass A fills lanes ``[0..K)`` with the per-bump weak
sums, ``[K..2K)`` with the per-bump masses and ``[2K..3K)`` with the
per-bump trainable-E seeds ``sum u*phi_k``, the scalar quotient algebra
runs in XLA on the (K,) vectors, and pass B seeds the shared reverse sweep
with the per-point cotangent SUMMED over bumps (one reverse sweep total,
not K).  3K <= 128 caps K at 42 bumps (n_test_grid <= 6 in 2D).

Coefficient layout per point (``nc = K*(d + 4)`` columns): K blocks of
``[c_k, b_k0..b_k{d-1}, rhs_k]`` (each ``d + 2`` wide) giving

    r_k = c_k * net + sum_j b_kj * dnet_j + rhs_k

followed by K mass columns ``e1_0..e1_{K-1}`` (lane K+k accumulates
``sum (e1_k * net)^2``) and K linear columns ``e2_0..e2_{K-1}`` (lane 2K+k
accumulates ``sum e2_k * net``).  The weak forms touch value+grad only, so
the Laplacian stream is never propagated (d+1 streams).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .fwdlap_pallas import _dot_mode, _fwd_recompute, _reverse_sweep
from .fused_step import _fused_call
from .fused_quotient import (
    _global_grads,
    _lane_sums,
    _packed_helpers,
    _unpack_common,
    _wan_dp,
)

MAX_BUMPS = 42   # 3K accumulator lanes must fit one (1, 128) vreg row


def _check_K(Kb):
    if not (1 <= Kb <= MAX_BUMPS):
        raise ValueError(
            f"n_bumps must be in [1, {MAX_BUMPS}] (3K lanes <= 128), "
            f"got {Kb}"
        )


# ------------------------------------------------------------------- pass A
def _multi_sums_kernel(Kb, d, K, T, activation, concat_streams, dot_dtype,
                       packed, nc, X_ref, *refs):
    """Forward recompute only; K per-bump (weak, mass, e2) lane sums."""
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
        with_lap=False, dot3=dot3,
    )
    _, _, _, _, A, Jmid, lmid = final
    coef = coef_ref[0]
    blk = d + 2
    base_e1 = Kb * blk
    base_e2 = base_e1 + Kb

    pairs = []
    if packed:
        left, proj2, cc = _packed_helpers(A, T, nc, coef, wlast_row)
        va, vb = proj2(A)
        va, vb = va + blast, vb + blast
        gs = [proj2(Jm) for Jm in Jmid]
        for k in range(Kb):
            off = k * blk
            ca, cb = cc(off)
            rha, rhb = cc(off + d + 1)
            ra = ca * va + rha
            rb = cb * vb + rhb
            for j in range(d):
                bja, bjb = cc(off + 1 + j)
                ra = ra + bja * gs[j][0]
                rb = rb + bjb * gs[j][1]
            e1a, e1b = cc(base_e1 + k)
            e2a, e2b = cc(base_e2 + k)
            pairs.append((k, jnp.sum(ra, keepdims=True)
                          + jnp.sum(rb, keepdims=True)))
            pairs.append((Kb + k, jnp.sum((e1a * va) ** 2, keepdims=True)
                          + jnp.sum((e1b * vb) ** 2, keepdims=True)))
            pairs.append((2 * Kb + k, jnp.sum(e2a * va, keepdims=True)
                          + jnp.sum(e2b * vb, keepdims=True)))
    else:
        value = jnp.sum(A * wlast_row, axis=1, keepdims=True) + blast
        gs = [jnp.sum(Jm * wlast_row, axis=1, keepdims=True) for Jm in Jmid]
        for k in range(Kb):
            off = k * blk
            r = coef[:, off:off + 1] * value + coef[:, off + d + 1:
                                                    off + d + 2]
            for j in range(d):
                r = r + coef[:, off + 1 + j:off + 2 + j] * gs[j]
            e1 = coef[:, base_e1 + k:base_e1 + k + 1]
            e2 = coef[:, base_e2 + k:base_e2 + k + 1]
            pairs.append((k, jnp.sum(r, keepdims=True)))
            pairs.append((Kb + k,
                          jnp.sum((e1 * value) ** 2, keepdims=True)))
            pairs.append((2 * Kb + k,
                          jnp.sum(e2 * value, keepdims=True)))

    sums_ref[...] += _lane_sums(pairs)


# ------------------------------------------------------------------- pass B
def _multi_seeded_kernel(Kb, d, K, T, activation, concat_streams, dot_dtype,
                         packed, nc, X_ref, *refs):
    """Seeded reverse sweep, cotangents SUMMED over the K bumps.

    scal lanes: ``[0..K) = s_r_k``, ``[K..2K) = s_q_k``,
    ``[2K..3K) = s_l_k``.  Per point:

        ct_v   = sum_k ( s_r_k*c_k + s_q_k*2*e1_k^2*v + s_l_k*e2_k )
        ct_g_j = sum_k s_r_k*b_kj
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

    prec = jax.lax.Precision.DEFAULT
    cast, dot3 = _dot_mode(dot_dtype)
    X = X_ref[0]
    Ws_c, saved, final = _fwd_recompute(
        d, K, T, activation, concat_streams, cast, prec, X, Ws, bs, packed,
        with_lap=False, dot3=dot3,
    )
    _, _, _, _, A, Jmid, lmid = final
    coef = coef_ref[0]
    blk = d + 2
    base_e1 = Kb * blk
    base_e2 = base_e1 + Kb

    if packed:
        left, proj2, cc = _packed_helpers(A, T, nc, coef, wlast_row)
        va, vb = proj2(A)
        va, vb = va + blast, vb + blast
        ctv_a = jnp.zeros_like(va)
        ctv_b = jnp.zeros_like(vb)
        ctg_a = [jnp.zeros_like(va) for _ in range(d)]
        ctg_b = [jnp.zeros_like(vb) for _ in range(d)]
        for k in range(Kb):
            s_r = scal[:, k:k + 1]
            s_q = scal[:, Kb + k:Kb + k + 1]
            s_l = scal[:, 2 * Kb + k:2 * Kb + k + 1]
            off = k * blk
            ca, cb = cc(off)
            e1a, e1b = cc(base_e1 + k)
            e2a, e2b = cc(base_e2 + k)
            ctv_a = ctv_a + s_r * ca + s_q * 2.0 * e1a * e1a * va + s_l * e2a
            ctv_b = ctv_b + s_r * cb + s_q * 2.0 * e1b * e1b * vb + s_l * e2b
            for j in range(d):
                bja, bjb = cc(off + 1 + j)
                ctg_a[j] = ctg_a[j] + s_r * bja
                ctg_b[j] = ctg_b[j] + s_r * bjb
        ct_v = jnp.where(left, ctv_a, ctv_b)
        ct_g = [jnp.where(left, ctg_a[j], ctg_b[j]) for j in range(d)]
        s_ctv = (jnp.sum(ctv_a, keepdims=True)
                 + jnp.sum(ctv_b, keepdims=True))
    else:
        value = jnp.sum(A * wlast_row, axis=1, keepdims=True) + blast
        ct_v = jnp.zeros_like(value)
        ct_g = [jnp.zeros_like(value) for _ in range(d)]
        for k in range(Kb):
            s_r = scal[:, k:k + 1]
            s_q = scal[:, Kb + k:Kb + k + 1]
            s_l = scal[:, 2 * Kb + k:2 * Kb + k + 1]
            off = k * blk
            c = coef[:, off:off + 1]
            e1 = coef[:, base_e1 + k:base_e1 + k + 1]
            e2 = coef[:, base_e2 + k:base_e2 + k + 1]
            ct_v = ct_v + s_r * c + s_q * 2.0 * e1 * e1 * value + s_l * e2
            for j in range(d):
                ct_g[j] = ct_g[j] + s_r * coef[:, off + 1 + j:off + 2 + j]
        s_ctv = jnp.sum(ct_v, keepdims=True)

    sums_ref[...] += _lane_sums([(0, s_ctv)])
    _reverse_sweep(d, K, T, activation, concat_streams, cast, prec, packed,
                   X, Ws_c, wlast_row, saved, final, ct_v, ct_g, None,
                   dW_refs, dWlast_ref, db_refs)


# --------------------------------------------------------- coefficient packer
def pack_multibump_coefficients(cores):
    """Pack K single-bump streams into the (N, K*(d+4)) multibump layout.

    ``cores``: length-K list of (N, d+5) streams from
    :func:`.fused_quotient.linear_functional_coefficients` — the chain rule
    through the trial factor stays single-sourced there.  The ``a``
    (Laplacian) column is DROPPED: the multibump kernels never propagate
    the lap stream, so the functional must be first-order (a0 = 0 — every
    WAN weak form qualifies).
    """
    K = len(cores)
    _check_K(K)
    d = cores[0].shape[1] - 5
    blocks = [jnp.concatenate([c[:, :d + 1], c[:, d + 2:d + 3]], axis=1)
              for c in cores]                       # [c, b_0.., rhs]
    e1s = [c[:, d + 3:d + 4] for c in cores]
    e2s = [c[:, d + 4:d + 5] for c in cores]
    return jnp.concatenate(blocks + e1s + e2s, axis=1)


# ------------------------------------------------------------------- raw API
def fused_multi_sums(params, X, coef, activation: str, n_bumps: int,
                     **call_kw):
    """Pass A: ``{'sum_r' (K,), 'sum_mass' (K,), 'sum_e2' (K,), 'n'}``."""
    _check_K(n_bumps)
    sums, N = _fused_call(
        functools.partial(_multi_sums_kernel, n_bumps), activation,
        params, X, coef, n_bumps * (X.shape[1] + 4),
        grads_out=False, **call_kw,
    )
    K = n_bumps
    return {"sum_r": sums[0:K], "sum_mass": sums[K:2 * K],
            "sum_e2": sums[2 * K:3 * K], "n": N}


def fused_multi_seeded_grads(params, X, coef, scalars, activation: str,
                             n_bumps: int, **call_kw):
    """Pass B: grads of ``sum_k s_r_k*sum r_k + s_q_k*sum (e1_k v)^2 +
    s_l_k*sum e2_k v``; ``scalars = (s_r (K,), s_q (K,), s_l (K,))``."""
    _check_K(n_bumps)
    K = n_bumps
    s = jnp.zeros((128,), jnp.float32)
    s = (s.at[0:K].set(scalars[0]).at[K:2 * K].set(scalars[1])
         .at[2 * K:3 * K].set(scalars[2]))
    dWs, dbs, sums, _ = _fused_call(
        functools.partial(_multi_seeded_kernel, n_bumps), activation,
        params, X, coef, n_bumps * (X.shape[1] + 4),
        scalars=s, **call_kw,
    )
    grads = [(dW, db) for dW, db in zip(dWs[:-1], dbs)]
    grads.append((dWs[-1], sums[0].reshape(params[-1][1].shape)))
    return grads


# --------------------------------------------------------- custom-vjp losses
def _global_multi_sums(s, axis):
    if axis is None:
        return s, s["n"]
    g = {k: (jax.lax.psum(v, axis) if k != "n" else v) for k, v in s.items()}
    return g, s["n"] * jax.lax.psum(1, axis)


def make_fused_wan_multi_u(activation: str, n_bumps: int, *,
                           convention: str = "wr2_over_norm",
                           eps: float = 1e-8, vol: float = 1.0,
                           w_pde: float = 1.0, w_norm: float = 0.0,
                           axis=None, **call_kw):
    """Fused multibump WAN primal (u) objective with custom VJP.

    Returns ``loss(params, E, X, base, phi_norms) -> (loss, aux)``:

    * ``base``: (N, K*(d+4)) from :func:`pack_multibump_coefficients` over
      per-bump ``linear_functional_coefficients(Bu, c0=V*phi_k,
      b0=pref*gphi_k, e2=Bu*phi_k)`` built with E = 0; the eigenvalue folds
      in here as ``c_k -= E*e2_k`` so its gradient stays exact;
      ``e1_0 = Bu`` carries the u mass for the norm penalty (other e1
      columns zero).
    * ``phi_norms``: (K,) critic masses ``mean(phi_k^2)`` (data for the
      u step, exact scalar cotangents returned).
    * ``loss = w_pde * mean_k p_k + w_norm*(vol*mean(u^2) - 1)^2`` with
      ``p_k`` the selected convention per bump.
    """
    _check_K(n_bumps)
    K = n_bumps

    # Default the in-kernel dots to bf16x3: the quotient backward seeds
    # every gradient from GLOBAL sums, so single-pass DEFAULT-dot noise in
    # those sums contaminates the whole gradient (measured on TPU,
    # artifacts/kernel_accuracy.json: w128 grad rel-err 0.10 -> 1.3e-3).
    call_kw.setdefault("dot_dtype", "bf16x3")
    @jax.custom_vjp
    def loss(params, E, X, base, phi_norms):
        out, _ = _fwd(params, E, X, base, phi_norms)
        return out

    def _fold_E(base, E):
        d = base.shape[1] // K - 4
        blk = d + 2
        base_e2 = K * blk + K
        c_idx = jnp.arange(K) * blk
        e2 = base[:, base_e2:base_e2 + K]
        return base.at[:, c_idx].add(-E * e2)

    def _fwd(params, E, X, base, phi_norms):
        coef = _fold_E(base, E)
        s = fused_multi_sums(params, X, coef, activation, K, **call_kw)
        s, n = _global_multi_sums(s, axis)
        wr = s["sum_r"] / n                            # (K,)
        mu2 = s["sum_mass"][0] / n                     # u mass (e1_0 = Bu)
        p_k, _, _ = _wan_dp(convention, wr, phi_norms, eps)
        p = jnp.mean(p_k)
        norm_term = (vol * mu2 - 1.0) ** 2
        total = w_pde * p + w_norm * norm_term
        aux = {"weak_residual": wr, "pde_loss": p, "norm": norm_term,
               "mean_u2": mu2, "phi_norm": phi_norms}
        return (total, aux), (params, X, coef, wr, mu2, phi_norms,
                              s["sum_e2"], n)

    def _bwd(res, ct):
        params, X, coef, wr, mu2, phi_norms, sum_uphi, n = res
        g = ct[0]
        _, dp_dwr, dp_dpn = _wan_dp(convention, wr, phi_norms, eps)  # (K,)
        s_r = g * w_pde * dp_dwr / (K * n)
        s_q = jnp.zeros((K,)).at[0].set(
            g * w_norm * 2.0 * (vol * mu2 - 1.0) * vol / n)
        grads = fused_multi_seeded_grads(
            params, X, coef, (s_r, s_q, jnp.zeros((K,))), activation, K,
            **call_kw)
        # dwr_k/dE = -(1/n) sum u*phi_k (the e2 lanes)
        dE = g * w_pde * jnp.sum(dp_dwr * (-sum_uphi / n)) / K
        d_pn = g * w_pde * dp_dpn / K                  # (K,)
        return (_global_grads(grads, axis), dE, jnp.zeros_like(X),
                jnp.zeros_like(coef), d_pn)

    loss.defvjp(_fwd, _bwd)
    return loss


def make_fused_wan_multi_v(activation: str, n_bumps: int, *,
                           convention: str = "wr2_over_norm",
                           eps: float = 1e-8, objective: str = "neg_log",
                           log_eps: float = 1e-8, axis=None, **call_kw):
    """Fused multibump WAN critic (v) objective with custom VJP.

    ``loss_v(params, X, coef)``: ``coef`` from
    :func:`pack_multibump_coefficients` over the CRITIC net with per-bump
    effective factors ``W_k = w_k * Bv`` (``c0 = (V-E)*u``, ``b0 =
    pref*grad u``, ``e1_k = W_k`` so lane K+k is ``sum phi_k^2``).  The
    per-bump masses are IN the objective — their gradients seed the K
    quadratic lanes.
    """
    if objective not in ("neg_log", "neg"):
        raise ValueError(f"Unknown critic objective {objective!r}")
    _check_K(n_bumps)
    K = n_bumps

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
        s = fused_multi_sums(params, X, coef, activation, K, **call_kw)
        s, n = _global_multi_sums(s, axis)
        wr = s["sum_r"] / n                            # (K,)
        pn = s["sum_mass"] / n                         # (K,)
        p_k, _, _ = _wan_dp(convention, wr, pn, eps)
        p = jnp.mean(p_k)
        val = -jnp.log(p + log_eps) if objective == "neg_log" else -p
        aux = {"weak_residual": wr, "pde_loss": p, "phi_norm": pn}
        return (val, aux), (params, X, coef, wr, pn, p, n)

    def _bwd(res, ct):
        params, X, coef, wr, pn, p, n = res
        g = ct[0]
        _, dp_dwr, dp_dpn = _wan_dp(convention, wr, pn, eps)  # (K,)
        outer = (-g / (p + log_eps)) if objective == "neg_log" else -g
        s_r = outer * dp_dwr / (K * n)
        s_q = outer * dp_dpn / (K * n)
        grads = fused_multi_seeded_grads(
            params, X, coef, (s_r, s_q, jnp.zeros((K,))), activation, K,
            **call_kw)
        return (_global_grads(grads, axis), jnp.zeros_like(X),
                jnp.zeros_like(coef))

    loss_v.defvjp(_fwd, _bwd)
    return loss_v
