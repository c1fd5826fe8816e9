"""The unified trainer: one jitted, scan-chunked loop for every method.

Replaces the nine copy-pasted epoch loops of the reference
(``train_poisson_nd`` Poisson_ND.py:150-366, ``train_seperate`` x4,
``train_pinn_single`` / ``train_pinn_seperate`` x3, ``train_state_v2``
KH_1D.py:290-456) with two entry points:

* :func:`fit` — gradient-descent methods (PINN / DRM): each epoch is one
  ``lax.scan`` step doing loss+grads -> optax update -> eval -> device-side
  best-snapshot.  The reference pays a host sync per epoch
  (``.item()`` / ``.cpu()``, Poisson_ND.py:273-293) — here an entire chunk of
  epochs runs inside a single compiled program, history is returned as
  stacked device arrays, and the running best parameters live on device
  (params are <= ~120k floats, so carrying a second copy is free).

* :func:`fit_wan` — the WAN minimax: the k-inner-critic-ascent + 1 primal
  step protocol (IPW_1D_WAN.py:184-208, Poisson_ND.py:242-271,
  KH_1D.py:344-381) fused into one compiled step via ``lax.fori_loop`` over
  the critic updates.  Parameter freezing is replaced by the functional
  discipline of differentiating only w.r.t. the active net's params.

Accuracy note: TPU matmuls default to bf16-ish precision which visibly
degrades second derivatives; all training/eval math runs under
``jax.default_matmul_precision('highest')`` (f32 MXU passes).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..runtime import enable_compilation_cache


class FitResult(NamedTuple):
    params: Any                      # final params (primal net)
    best_params: Any                 # device-tracked argmin-eval params
    best_metric: float
    best_epoch: int
    history: Dict[str, np.ndarray]   # per-epoch metric curves (host)
    v_params: Any = None             # WAN critic final params
    best_v_params: Any = None        # WAN critic at the best epoch
    carry: Any = None                # full train state (resume support)
    timing: Optional[Dict[str, float]] = None  # wall-clock + throughput


def tree_where(pred, a, b):
    """Select pytree ``a`` where pred else ``b`` (scalar bool pred)."""
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def _chunks(total: int, chunk: int):
    if total > 0 and chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    done = 0
    while done < total:
        n = min(chunk, total - done)
        yield done, n
        done += n


def _run_chunks(scan_chunk, carry, *, epochs, chunk, start_epoch, key,
                progress):
    """Shared chunked driver for fit/fit_wan: per-epoch key fan-out, scan
    dispatch, history collection, progress callbacks, wall-clock timing."""
    import time as _time

    from .. import runtime

    chunk = min(chunk, runtime.scan_chunk_cap())
    parts = []
    t0 = _time.time()
    for start, n in _chunks(epochs, chunk):
        start = start + start_epoch
        ks = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(start, start + n)
        )
        carry, hist = scan_chunk(carry, (jnp.arange(start, start + n), ks))
        parts.append(hist)
        if progress is not None:
            progress(start + n, {k: float(v[-1]) for k, v in hist.items()})
    jax.block_until_ready(carry)
    elapsed = _time.time() - t0
    timing = {
        "elapsed_s": elapsed,
        "steps_per_s": epochs / elapsed if elapsed > 0 else float("nan"),
    }
    return carry, _stack_history(parts), timing


def _stack_history(parts):
    if not parts:  # epochs=0: template-carry construction for resume
        return {}
    out = {}
    for k in parts[0]:
        out[k] = np.concatenate([np.asarray(p[k]) for p in parts])
    return out


def _compile_probe(scan_chunk, carry, *, epochs, chunk, key):
    """Lower + compile one scan chunk and return its memory analysis.

    Compile-only: nothing executes on the device, so HBM-pressure
    questions (does this step fit?) are answerable without risking the
    worker (TODO Open #3: grid400+jitter kills the TPU worker ~minutes
    into the run).  Returns bytes for arguments / outputs / temps /
    generated code, plus their total vs the device's memory.
    """
    n = min(chunk, max(epochs, 1))
    xs = (jnp.arange(n),
          jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n)))
    compiled = scan_chunk.lower(carry, xs).compile()
    ma = compiled.memory_analysis()
    out = {}
    for f in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        out[f] = int(getattr(ma, f, -1))
    out["total_nonalias_bytes"] = (
        out["argument_size_in_bytes"] + out["output_size_in_bytes"]
        + out["temp_size_in_bytes"] - max(out["alias_size_in_bytes"], 0)
    )
    try:
        dev = jax.devices()[0]
        stats = dev.memory_stats() or {}
        out["device_bytes_limit"] = int(stats.get("bytes_limit", -1))
    except Exception:  # pragma: no cover
        out["device_bytes_limit"] = -1
    return out


def fit(
    loss_fn: Callable,               # (params, key) -> (scalar, metrics dict)
    eval_fn: Callable,               # (params, key) -> scalar (lower = better)
    params,
    *,
    epochs: int,
    optimizer: optax.GradientTransformation,
    key,
    chunk: int = 1000,
    progress: Optional[Callable[[int, Dict[str, float]], None]] = None,
    init_carry=None,
    start_epoch: int = 0,
    compile_only: bool = False,
    loss_and_grad_fn: Optional[Callable] = None,
) -> FitResult:
    """``init_carry``/``start_epoch`` resume a run from a previous
    ``FitResult.carry`` (checkpoint/resume — the reference can only
    checkpoint, never resume, SURVEY.md §5).

    ``compile_only=True`` lowers+compiles one scan chunk and returns its
    memory-analysis dict instead of training (see :func:`_compile_probe`).

    ``loss_and_grad_fn``: optional ``(params, key) -> ((loss, metrics),
    grads)`` replacing ``jax.value_and_grad(loss_fn)`` — the hook for
    fused loss+gradient kernels (:mod:`nnpde_tpu.kernels.fused_step`)
    that produce both in one pass.  ``loss_fn`` is ignored when given.
    """
    enable_compilation_cache()
    opt_state = optimizer.init(params)

    def step(carry, inputs):
        params, opt_state, best_m, best_p, best_e = carry
        epoch, k = inputs
        with jax.default_matmul_precision("highest"):
            if loss_and_grad_fn is not None:
                (loss, metrics), grads = loss_and_grad_fn(params, k)
            else:
                (loss, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, k)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            m = eval_fn(params, jax.random.fold_in(k, 0x5EED))
        improved = m < best_m
        best_p = tree_where(improved, params, best_p)
        best_m = jnp.where(improved, m, best_m)
        best_e = jnp.where(improved, epoch, best_e)
        metrics = dict(metrics)
        metrics["total"] = loss
        metrics["l2"] = m
        return (params, opt_state, best_m, best_p, best_e), metrics

    scan_chunk = jax.jit(lambda carry, xs: jax.lax.scan(step, carry, xs))

    carry = init_carry if init_carry is not None else (
        params,
        opt_state,
        jnp.asarray(jnp.inf, jnp.float32),
        params,
        jnp.asarray(-1, jnp.int32),
    )
    if compile_only:
        return _compile_probe(scan_chunk, carry, epochs=epochs, chunk=chunk,
                              key=key)
    carry, history, timing = _run_chunks(
        scan_chunk, carry, epochs=epochs, chunk=chunk,
        start_epoch=start_epoch, key=key, progress=progress,
    )
    params, _, best_m, best_p, best_e = carry
    return FitResult(
        params=params,
        best_params=best_p,
        best_metric=float(best_m),
        best_epoch=int(best_e),
        history=history,
        carry=carry,
        timing=timing,
    )


def fit_wan(
    u_loss_fn: Callable,             # (u_params, v_params, key) -> (scalar, metrics)
    v_loss_fn: Callable,             # (v_params, u_params, key) -> scalar (minimised for v)
    eval_fn: Callable,               # (u_params, key) -> scalar
    u_params,
    v_params,
    *,
    epochs: int,
    v_steps: int,
    u_optimizer: optax.GradientTransformation,
    v_optimizer: optax.GradientTransformation,
    key,
    chunk: int = 500,
    progress: Optional[Callable[[int, Dict[str, float]], None]] = None,
    init_carry=None,
    start_epoch: int = 0,
    minimax: str = "alternating",    # alternating | extragradient | optimistic
    u_ema: float = 0.0,              # >0: track an EMA of u and eval it too
    compile_only: bool = False,      # lower+compile only; return memory stats
    v_context_fn: Optional[Callable] = None,
) -> FitResult:
    """Fused adversarial training step: v_steps critic updates then one
    primal update, all inside one compiled scan step.

    ``minimax`` selects the saddle-point update rule (the reference only has
    alternating GDA, IPW_1D_WAN.py:184-208):

    * ``alternating`` — v_steps critic ascent steps then one primal step.
    * ``extragradient`` — after v_steps-1 plain critic steps, one
      extragradient *pair* update: gradients at (u, v) give a lookahead
      point (u', v') (optimizer states not advanced), then the real update
      applies the gradients evaluated at (u', v').  Converges on bilinear
      saddle problems where GDA cycles (Korpelevich 1976).
    * ``optimistic`` — OGDA: the optimizer consumes the extrapolated
      gradient ``2 g_t - g_{t-1}``; the previous gradients ride the carry.
      Single gradient evaluation per net per epoch (cheaper than EG).

    ``u_ema > 0`` additionally tracks ``ema = d*ema + (1-d)*u`` and lets the
    best-snapshot logic consider the averaged iterate — minimax dynamics
    converge in average, not in last iterate, so the EMA is often the better
    solution.
    """
    if minimax not in ("alternating", "extragradient", "optimistic"):
        raise ValueError(f"Unknown minimax mode {minimax!r}")
    # ``v_context_fn(u_params, key)``: optional per-epoch precomputation of
    # everything the critic objective needs from the FROZEN primal (e.g.
    # the fused path's u-jet + coefficient stream, problems/_fused_wan.py)
    # — computed once per epoch instead of once per inner critic step, and
    # recomputed at the extragradient lookahead point.  When given,
    # ``v_loss_fn`` receives the context in place of ``u_params``.
    if v_context_fn is None:
        def v_context_fn(u_params, key):  # noqa: ANN001 — identity context
            return u_params
    enable_compilation_cache()
    u_opt_state = u_optimizer.init(u_params)
    v_opt_state = v_optimizer.init(v_params)
    zero_g = (jax.tree_util.tree_map(jnp.zeros_like, u_params),
              jax.tree_util.tree_map(jnp.zeros_like, v_params))

    def step(carry, inputs):
        (u_params, v_params, u_opt, v_opt, best_m, best_up, best_vp, best_e,
         ema_up, prev_g) = carry
        epoch, k = inputs
        with jax.default_matmul_precision("highest"):
            # ---- critic ascent (freezing replaced by grad-wrt-v only).
            # EG/OGDA handle the final (paired) update themselves, so they
            # run one fewer plain critic step here.
            n_plain = v_steps if minimax == "alternating" else v_steps - 1
            v_ctx = v_context_fn(u_params, k)

            def v_body(i, val):
                v_params, v_opt, _ = val
                vk = jax.random.fold_in(k, i)
                v_loss, gv = jax.value_and_grad(v_loss_fn)(v_params, v_ctx, vk)
                updates, v_opt = v_optimizer.update(gv, v_opt, v_params)
                v_params = optax.apply_updates(v_params, updates)
                return (v_params, v_opt, v_loss)

            v_params, v_opt, last_v_loss = jax.lax.fori_loop(
                0, max(n_plain, 0), v_body,
                (v_params, v_opt, jnp.asarray(0.0)),
            )

            uk = jax.random.fold_in(k, 0x0A11CE)
            vk = jax.random.fold_in(k, 0x0C8171C)
            if minimax == "alternating":
                (loss, metrics), gu = jax.value_and_grad(
                    u_loss_fn, has_aux=True)(u_params, v_params, uk)
                updates, u_opt = u_optimizer.update(gu, u_opt, u_params)
                u_params = optax.apply_updates(u_params, updates)
            elif minimax == "extragradient":
                # gradients at the current point -> lookahead (states frozen)
                (_, _), gu1 = jax.value_and_grad(u_loss_fn, has_aux=True)(
                    u_params, v_params, uk)
                last_v_loss, gv1 = jax.value_and_grad(v_loss_fn)(
                    v_params, v_ctx, vk)
                du, _ = u_optimizer.update(gu1, u_opt, u_params)
                dv, _ = v_optimizer.update(gv1, v_opt, v_params)
                u_bar = optax.apply_updates(u_params, du)
                v_bar = optax.apply_updates(v_params, dv)
                # real update with the lookahead gradients
                (loss, metrics), gu2 = jax.value_and_grad(
                    u_loss_fn, has_aux=True)(u_bar, v_bar, uk)
                gv2 = jax.grad(v_loss_fn)(v_bar, v_context_fn(u_bar, vk),
                                          vk)
                du2, u_opt = u_optimizer.update(gu2, u_opt, u_params)
                dv2, v_opt = v_optimizer.update(gv2, v_opt, v_params)
                u_params = optax.apply_updates(u_params, du2)
                v_params = optax.apply_updates(v_params, dv2)
            else:  # optimistic (OGDA)
                (loss, metrics), gu = jax.value_and_grad(
                    u_loss_fn, has_aux=True)(u_params, v_params, uk)
                last_v_loss, gv = jax.value_and_grad(v_loss_fn)(
                    v_params, v_ctx, vk)
                pgu, pgv = prev_g
                eg_u = jax.tree_util.tree_map(lambda g, p: 2.0 * g - p, gu, pgu)
                eg_v = jax.tree_util.tree_map(lambda g, p: 2.0 * g - p, gv, pgv)
                du, u_opt = u_optimizer.update(eg_u, u_opt, u_params)
                dv, v_opt = v_optimizer.update(eg_v, v_opt, v_params)
                u_params = optax.apply_updates(u_params, du)
                v_params = optax.apply_updates(v_params, dv)
                prev_g = (gu, gv)

            m = eval_fn(u_params, jax.random.fold_in(k, 0x5EED))
            if u_ema > 0.0:
                # warmup-corrected decay so early epochs average properly
                d = jnp.minimum(u_ema, (epoch + 1.0) / (epoch + 10.0))
                ema_up = jax.tree_util.tree_map(
                    lambda e, p: d * e + (1.0 - d) * p, ema_up, u_params
                )
                m_ema = eval_fn(ema_up, jax.random.fold_in(k, 0x3333))
            else:
                m_ema = jnp.asarray(jnp.inf, jnp.float32)
        use_ema = m_ema < m
        m_eff = jnp.where(use_ema, m_ema, m)
        cand = tree_where(use_ema, ema_up, u_params)
        improved = m_eff < best_m
        best_up = tree_where(improved, cand, best_up)
        best_vp = tree_where(improved, v_params, best_vp)
        best_m = jnp.where(improved, m_eff, best_m)
        best_e = jnp.where(improved, epoch, best_e)
        metrics = dict(metrics)
        metrics["total"] = loss
        metrics["l2"] = m
        if u_ema > 0.0:
            metrics["l2_ema"] = m_ema
        metrics["wan_loss_v"] = last_v_loss
        return (
            u_params, v_params, u_opt, v_opt, best_m, best_up, best_vp, best_e,
            ema_up, prev_g,
        ), metrics

    scan_chunk = jax.jit(lambda carry, xs: jax.lax.scan(step, carry, xs))

    carry = init_carry if init_carry is not None else (
        u_params, v_params, u_opt_state, v_opt_state,
        jnp.asarray(jnp.inf, jnp.float32), u_params, v_params,
        jnp.asarray(-1, jnp.int32),
        u_params,                     # EMA of the primal iterate
        zero_g,                       # previous gradients (OGDA)
    )
    if compile_only:
        return _compile_probe(scan_chunk, carry, epochs=epochs, chunk=chunk,
                              key=key)
    carry, history, timing = _run_chunks(
        scan_chunk, carry, epochs=epochs, chunk=chunk,
        start_epoch=start_epoch, key=key, progress=progress,
    )
    u_params, v_params, _, _, best_m, best_up, best_vp, best_e = carry[:8]
    return FitResult(
        params=u_params,
        best_params=best_up,
        best_metric=float(best_m),
        best_epoch=int(best_e),
        history=history,
        v_params=v_params,
        best_v_params=best_vp,
        carry=carry,
        timing=timing,
    )
