"""Pallas TPU kernel: fused MLP forward-Laplacian with custom VJP.

The XLA path (:func:`nnpde_tpu.ops.fwdlap.mlp_fwdlap`) is bandwidth-optimal
in the forward but its backward materialises every jet cotangent stream in
HBM per elementwise op (~10x the forward cost).  This kernel keeps the whole
per-tile pipeline in VMEM:

* the (value, d x jacobian, laplacian) streams live in one ``(d+2, T, w)``
  array — leading "stream" dim for cheap slicing/stacking, flattened to
  ``((d+2)T, w)`` (a free reshape) so each layer is a single MXU matmul;
* the backward **recomputes** the forward inside the tile
  (rematerialisation in VMEM — no activation spill to HBM) and accumulates
  dW/db across batch tiles by revisiting the same output block on TPU's
  sequential grid;
* mixed precision: exact f32 (6-pass) forward dots, fast-accumulating
  backward dots (gradients average over ~1e5+ points).

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


# ------------------------------------------------------------ forward kernel
def _forward_kernel(d, n_layers, T, activation, X_ref, *refs):
    Ws = [refs[i][...] for i in range(n_layers)]
    bs = [refs[n_layers + i][...] for i in range(n_layers)]
    out_ref = refs[2 * n_layers]
    act = _act_fns(activation)
    S, _ = _fwd_streams(X_ref[0], Ws, bs, d, T, act)
    out_ref[...] = S[..., 0][None]        # (1, d+2, T)


# ----------------------------------------------------------- backward kernel
def _backward_kernel(d, n_layers, T, activation, X_ref, *refs):
    """Recompute forward in VMEM, then reverse; accumulate dW/db over tiles."""
    Ws = [refs[i][...] for i in range(n_layers)]
    bs = [refs[n_layers + i][...] for i in range(n_layers)]
    ct_ref = refs[2 * n_layers]                       # (1, d+2, T)
    dW_refs = refs[2 * n_layers + 1: 3 * n_layers + 1]
    db_refs = refs[3 * n_layers + 1: 4 * n_layers + 1]
    act = _act_fns(activation)
    s, s1f, s2f, s3f = act

    X = X_ref[0]
    prec = jax.lax.Precision.DEFAULT
    _, pre_acts = _fwd_streams(X, Ws, bs, d, T, act, keep_pre=True,
                               precision=prec)

    first = pl.program_id(0) == 0
    for k in range(n_layers):
        @pl.when(first)
        def _(k=k):
            dW_refs[k][...] = jnp.zeros_like(dW_refs[k])
            db_refs[k][...] = jnp.zeros_like(db_refs[k])

    # cotangent (1, d+2, T) -> dS (d+2, T, 1)
    dS = ct_ref[0][..., None]

    for k in range(n_layers - 1, 0, -1):
        pre = pre_acts[k - 1]
        v = pre[0]
        s1v, s2v, s3v = s1f(v), s2f(v), s3f(v)
        lrow = pre[d + 1]
        sumJ2 = jnp.zeros_like(v)
        for i in range(d):
            sumJ2 = sumJ2 + pre[1 + i] * pre[1 + i]
        # post-activation stack A (input of linear k)
        A = jnp.stack(
            [s(v)]
            + [s1v * pre[1 + i] for i in range(d)]
            + [s1v * lrow + s2v * sumJ2],
            axis=0,
        )
        win = Ws[k].shape[0]
        wout = Ws[k].shape[1]
        A2 = A.reshape((d + 2) * T, win)
        dS2 = dS.reshape((d + 2) * T, wout)
        dW_refs[k][...] += _dot(A2.T, dS2, prec)
        db_refs[k][...] += jnp.sum(dS[0], axis=0, keepdims=True)
        dA = _dot(dS2, Ws[k].T, prec).reshape(d + 2, T, win)
        # elementwise backward through
        #   value~ = s(v);  J~_i = s1 J_i;  l~ = s1 l + s2 sum_i J_i^2
        dv_t = dA[0]
        dl_t = dA[d + 1]
        dv = s1v * dv_t + (s2v * lrow + s3v * sumJ2) * dl_t
        dJs = []
        for i in range(d):
            Ji = pre[1 + i]
            dv = dv + s2v * Ji * dA[1 + i]
            dJs.append(s1v * dA[1 + i] + 2.0 * s2v * Ji * dl_t)
        dl = s1v * dl_t
        dS = jnp.stack([dv] + dJs + [dl], axis=0)

    # first layer: v0 = X @ W0 + b0 ; J0_i = broadcast W0[i, :] ; l0 = 0
    dv0 = dS[0]
    dW0 = _dot(X.T, dv0, prec)
    width0 = Ws[0].shape[1]
    # dW0[i, :] += sum_T dS_Ji — one mask matmul (d, (d+2)T) @ dS2d
    dS2 = dS.reshape((d + 2) * T, width0)
    row_id = jax.lax.broadcasted_iota(jnp.int32, (d, (d + 2) * T), 0)
    col_grp = jax.lax.broadcasted_iota(jnp.int32, (d, (d + 2) * T), 1) // T
    sel = jnp.where(col_grp == row_id + 1, 1.0, 0.0)
    dW_refs[0][...] += dW0 + _dot(sel, dS2, prec)
    db_refs[0][...] += jnp.sum(dv0, axis=0, keepdims=True)


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _fwdlap_core(flat_params, X, activation, tile, bwd_tile, interpret):
    return _run_forward(flat_params, X, activation, tile, interpret)


def _fwd_rule(flat_params, X, activation, tile, bwd_tile, interpret):
    return _run_forward(flat_params, X, activation, tile, interpret), (
        flat_params,
        X,
    )


def _bwd_rule(activation, fwd_tile, bwd_tile, interpret, res, ct):
    flat_params, X = res
    tile = bwd_tile
    Ws, bs = _split_params(flat_params)
    d = X.shape[1]
    n_layers = len(Ws)
    N0 = X.shape[0]
    Xp, N, Np = _pad(X, tile)
    n_tiles = Np // tile
    if Np != N0:
        ct = jnp.concatenate([ct, jnp.zeros((Np - N0, d + 2), ct.dtype)], 0)
    ct = ct.reshape(n_tiles, tile, d + 2).transpose(0, 2, 1)  # (nt, d+2, T)
    Xt = Xp.reshape(n_tiles, tile, d)
    kernel = functools.partial(_backward_kernel, d, n_layers, tile, activation)
    in_specs = [pl.BlockSpec((1, tile, d), lambda i: (i, 0, 0))]
    in_specs += [pl.BlockSpec(W.shape, lambda i: (0, 0)) for W in Ws]
    in_specs += [pl.BlockSpec(b.shape, lambda i: (0, 0)) for b in bs]
    in_specs += [pl.BlockSpec((1, d + 2, tile), lambda i: (i, 0, 0))]
    out_specs = [pl.BlockSpec(W.shape, lambda i: (0, 0)) for W in Ws] + [
        pl.BlockSpec(b.shape, lambda i: (0, 0)) for b in bs
    ]
    out_shape = [jax.ShapeDtypeStruct(W.shape, jnp.float32) for W in Ws] + [
        jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(Xt, *Ws, *bs, ct)
    dWs = tuple(outs[:n_layers])
    dbs = tuple(outs[n_layers:])
    return (dWs + dbs, jnp.zeros_like(X))


_fwdlap_core.defvjp(_fwd_rule, _bwd_rule)


def mlp_fwdlap_pallas(
    params: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
    X,
    activation: str,
    *,
    tile: int = 1024,
    bwd_tile: int = 512,
    interpret: bool | None = None,
):
    """Fused (u, grad u, lap u) via the Pallas kernel.

    Returns the same :class:`~nnpde_tpu.ops.fwdlap.Jet` as the XLA path;
    off-TPU it runs in interpreter mode (tests).  Biases are carried as
    (1, w) inside the kernel (TPU prefers 2D); the public params layout is
    unchanged.
    """
    from ..ops.fwdlap import Jet

    if interpret is None:
        interpret = not pallas_available()
    Ws = tuple(W for W, _ in params)
    bs = tuple(b.reshape(1, -1) for _, b in params)
    out = _fwdlap_core(Ws + bs, X, activation, tile, bwd_tile, interpret)
    d = X.shape[1]
    return Jet(value=out[:, 0], grad=out[:, 1:1 + d], lap=out[:, 1 + d])
