"""N-D Poisson preset: PINN / DRM / WAN on ``[0, L]^d`` (d = 1..5+).

Reproduces the behaviour of ``train_poisson_nd``
(``/root/reference/Poisson_Equations/Poisson_ND.py:150-403``) as a thin
configuration binding over the unified trainer:

* methods PINN (strong residual), DRM (energy), WAN (minimax with fresh
  resampling per critic step, Poisson_ND.py:244-253);
* bc modes FBC (hard ``prod x_i (L - x_i)`` trial) and RB (soft Dirichlet
  penalty on fresh per-face samples each epoch, Poisson_ND.py:130-141);
* default weights ``{pde: 1, bc: 1e4 if RB, data: 1e3 if n_data, norm: 0}``
  (Poisson_ND.py:169-173);
* per-epoch eval on 10k fresh uniform points, RMSE vs the manufactured
  prod-sin solution, best-state tracking (Poisson_ND.py:281-300).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..losses import (
    data_mse,
    drm_poisson_energy,
    norm_nontrivial,
    pinn_poisson,
    wan_pde_loss,
    wan_weak_residual,
)
from ..models import NetSpec, SolutionModel, factor_for_technique
from ..ops import bump_w
from ..pde import poisson as phys
from .. import runtime
from ..pde.domain import Box
from ..sampling import face_points, uniform_box
from ..train import fit, fit_wan, make_optimizer


@dataclasses.dataclass
class PoissonConfig:
    dim: int = 2
    L: float = 2.0
    ks: Optional[Sequence[int]] = None       # default [1]*dim
    method: str = "PINN"                     # PINN | DRM | WAN
    bc_mode: str = "FBC"                     # FBC | RB
    bc_type: str = "dirichlet"               # dirichlet | neumann (RB only)
    solution: str = "sin"                    # manufactured family: sin | cos
    n_interior: int = 20000
    n_boundary: int = 4000
    n_data: int = 0
    epochs: int = 10000
    lr: float = 1e-3
    width: int = 64
    depth: int = 5
    critic_width: int = 64
    critic_depth: int = 3
    critic_steps: int = 5
    wan_reg: float = 1.0
    # WAN saddle-point knobs (see train/trainer.py fit_wan)
    minimax: str = "alternating"
    v_lr: Optional[float] = None
    u_ema: float = 0.0
    norm_mode: str = "nontrivial"
    weights: Optional[Dict[str, float]] = None
    seed: int = 0
    lr_schedule: str = "constant"   # constant | cosine | exponential
    # 'float32' = exact (matmul precision pinned); 'bfloat16' runs the
    # residual streams in bf16 (~2x faster, measured RMSE ~2x worse at equal
    # epochs on the 2D headline workload); 'hybrid' trains the first
    # hybrid_bf16_fraction of epochs in bf16 then finishes in f32 — bf16
    # speed with f32 final accuracy.  All three methods supported; the
    # hybrid phase switch carries the full optimizer state across (Adam
    # moments and lr-schedule step continue, no silent reset).
    # 'hybrid-kernel' (PINN + jet_impl='pallas'): the bulk phase keeps f32
    # params/streams but runs the Pallas jet kernels in their 1-pass-bf16
    # dot mode (fwd_impl='pallas2:default' + bf16 backward dots, lap
    # rel-err ~2e-3), tail in the exact bf16x3 mode — the kernel-level
    # analogue of 'hybrid' (VERDICT r2 #3).
    compute_dtype: str = "float32"
    hybrid_bf16_fraction: float = 0.8
    # PINN jet backend: 'xla' (stream propagation) or 'pallas' (lane-packed
    # VMEM kernels, ~2.4x faster at width 64 on TPU, BENCHMARKS.md; f32-
    # class accuracy, lap rel-err ~5e-6).  bf16 phases always use 'xla'.
    jet_impl: str = "xla"
    # 'stream' feeds the fused kernels a precomputed (N, d+4) coefficient
    # tensor from HBM; 'analytic' (PINN + FBC + solution='sin' +
    # jet_impl='pallas-fused') reconstructs the coefficients IN-KERNEL from
    # the X tile (kernels/fused_step.py fused_poisson_analytic) — the
    # dominant remaining HBM stream of the fused step disappears
    coef_mode: str = "stream"
    # fresh interior sample every epoch (the reference fixes the collocation
    # set once, Poisson_ND.py:193 — with a fixed set the DRM energy has a
    # biased Monte-Carlo minimiser and stalls; resampling removes the bias)
    resample: bool = False
    # 'uniform' (reference) | 'sobol' (scrambled QMC — MC error ~1/N instead
    # of 1/sqrt(N), sharpens DRM in high dimension).  With resample=True the
    # fixed Sobol base set gets a fresh Cranley-Patterson rotation per epoch
    # (device-side randomised QMC), so the two variance weapons compose.
    sampler: str = "uniform"
    n_eval: int = 10000
    chunk: int = 1000

    def resolved_ks(self) -> Tuple[int, ...]:
        return tuple(self.ks) if self.ks is not None else (1,) * self.dim

    def resolved_weights(self) -> Dict[str, float]:
        bc_default = 1e4 if self.bc_mode == "RB" else 0.0
        if self.bc_mode == "RB" and self.bc_type == "neumann":
            # The 1e4 soft-BC default is the reference's *Dirichlet*
            # tuning (Poisson_ND.py:153 boundary_weight); for Neumann it
            # drowns the training signal (measured, 2D/4k epochs: DRM
            # rel-L2 0.96, PINN 3.3e-2).  Zero-Neumann is the NATURAL BC
            # of the Ritz functional, so DRM needs NO boundary term at
            # all (bc=0 measures 1.5e-3); the strong form doesn't encode
            # it, so PINN keeps a mild penalty (bc=100 measures 5.5e-4,
            # bc=1e4 measures 3.3e-2).
            bc_default = 0.0 if self.method == "DRM" else 100.0
        w = {
            "pde": 1.0,
            "bc": bc_default,
            "data": 1e3 if self.n_data > 0 else 0.0,
            "norm": 0.0,
        }
        if self.weights:
            w.update(self.weights)
        return w


def _solution_model(cfg: PoissonConfig) -> SolutionModel:
    layers = (cfg.dim,) + (cfg.width,) * (cfg.depth - 1) + (1,)
    factor = (
        factor_for_technique("FBC", dim=cfg.dim, kind="box", L=cfg.L)
        if cfg.bc_mode == "FBC"
        else None
    )
    if cfg.bc_mode not in ("FBC", "RB"):
        raise ValueError("bc_mode must be 'FBC' or 'RB'")
    if cfg.bc_type not in ("dirichlet", "neumann"):
        raise ValueError("bc_type must be 'dirichlet' or 'neumann'")
    if cfg.bc_type == "neumann" and cfg.solution != "cos":
        raise ValueError(
            "Neumann BCs require the zero-Neumann manufactured family: "
            "pass solution='cos' (the prod-sin family has nonzero boundary "
            "gradients and nonzero mean)"
        )
    if cfg.bc_type == "neumann" and cfg.bc_mode == "FBC":
        # A multiplicative factor cannot hard-enforce a DERIVATIVE
        # condition; the input cosine feature map can (du/dn = 0 exactly
        # on every face, models/inputmap.py).  FBC+neumann means HARD
        # Neumann: raw net on cos features, no output factor — measured
        # to fix the soft-path failure (RB 1.2e-2 at 5D/20k; see
        # scripts/acceptance.py run_poisson_5d_drm_neumann).
        from ..models import CosineInputMap

        return SolutionModel(NetSpec(layers, activation="sin"),
                             input_map=CosineInputMap(cfg.dim, 0.0, cfg.L))
    return SolutionModel(NetSpec(layers, activation="sin"), factor)


def _exact_fns(cfg: PoissonConfig):
    if cfg.solution == "sin":
        return phys.exact_u_prod_sin, phys.rhs_f_for_u_sin
    if cfg.solution == "cos":
        return phys.exact_u_prod_cos, phys.rhs_f_for_u_cos
    raise ValueError("solution must be 'sin' or 'cos'")


def _critic_model(cfg: PoissonConfig) -> SolutionModel:
    layers = (cfg.dim,) + (cfg.critic_width,) * (cfg.critic_depth - 1) + (1,)
    return SolutionModel(NetSpec(layers, activation="sin"))


def train_poisson_nd(cfg: PoissonConfig) -> Dict:
    if cfg.method not in ("PINN", "DRM", "WAN"):
        raise ValueError("method must be one of {'PINN','DRM','WAN'}")
    if cfg.compute_dtype not in ("float32", "bfloat16", "hybrid",
                                 "hybrid-kernel"):
        raise ValueError(
            "compute_dtype must be 'float32', 'bfloat16', 'hybrid' or "
            "'hybrid-kernel'"
        )
    if cfg.compute_dtype == "hybrid-kernel" and not (
        cfg.method == "PINN" and cfg.jet_impl in ("pallas", "pallas-fused")
    ):
        raise ValueError(
            "compute_dtype='hybrid-kernel' is the Pallas-kernel bf16-dot "
            "bulk mode — requires method='PINN' and jet_impl='pallas' or "
            "'pallas-fused'"
        )
    if cfg.jet_impl not in ("xla", "pallas", "pallas-fused"):
        raise ValueError(
            "jet_impl must be 'xla', 'pallas' or 'pallas-fused'"
        )
    if cfg.coef_mode not in ("stream", "analytic"):
        raise ValueError("coef_mode must be 'stream' or 'analytic'")
    if cfg.coef_mode == "analytic" and not (
        cfg.method == "PINN" and cfg.jet_impl == "pallas-fused"
        and cfg.bc_mode == "FBC" and cfg.solution == "sin"
    ):
        raise ValueError(
            "coef_mode='analytic' = in-kernel coefficients for the box-FBC "
            "prod-sin Poisson PINN — requires method='PINN', "
            "jet_impl='pallas-fused', bc_mode='FBC', solution='sin'"
        )
    # Epoch-scan length cap on the pallas jet path.  The round-3 compile-time
    # ladder (artifacts/compile_cliff.json) found NO cliff on this step
    # (3.4-3.9 s flat for chunk 125..1000), so the default cap is 1000
    # (uncapped in practice) — see runtime.pallas_chunk_cap().
    cap = runtime.pallas_chunk_cap()
    chunk = (min(cfg.chunk, cap) if cfg.jet_impl.startswith("pallas")
             else cfg.chunk)
    ks = cfg.resolved_ks()
    w = cfg.resolved_weights()
    if cfg.bc_type == "neumann":
        # pure-Neumann Poisson is defined up to a constant: pin the mean
        # (the cos family has exact zero mean)
        w.setdefault("mean", 1.0)
    else:
        w.setdefault("mean", 0.0)
    box = Box.cube(cfg.dim, 0.0, cfg.L)
    model = _solution_model(cfg)
    exact_u, rhs_f = _exact_fns(cfg)

    key = jax.random.PRNGKey(cfg.seed)
    k_init, k_x, k_data, k_train = jax.random.split(key, 4)
    params = model.init(k_init)

    # fixed interior collocation set + detached RHS (Poisson_ND.py:193-194)
    if cfg.sampler == "sobol":
        from ..sampling import shifted_qmc, sobol_unit

        U_base = sobol_unit(cfg.seed, cfg.n_interior, cfg.dim)
        lo = jnp.asarray(box.lo)
        hi = jnp.asarray(box.hi)
        X_in = lo + U_base * (hi - lo)

        def draw_interior(key):
            # randomised QMC: fresh Cranley-Patterson rotation of the fixed
            # Sobol base (device-side, jit-safe) — keeps the ~1/N QMC error
            # while removing the fixed-set bias
            return shifted_qmc(U_base, key, box)

    elif cfg.sampler == "uniform":
        X_in = uniform_box(k_x, cfg.n_interior, box)

        def draw_interior(key):
            return uniform_box(key, cfg.n_interior, box)

    else:
        raise ValueError("sampler must be 'uniform' or 'sobol'")
    f_in = rhs_f(X_in, cfg.L, ks)

    if cfg.n_data > 0:
        X_data = uniform_box(k_data, cfg.n_data, box)
        u_data = exact_u(X_data, cfg.L, ks)
    else:
        X_data = u_data = None

    per_face = max(1, cfg.n_boundary // (2 * cfg.dim))

    def aux_terms(params, key, u_interior):
        """bc / data / norm / mean losses shared by every method."""
        if cfg.bc_mode == "RB":
            Xb = face_points(key, per_face, box)
            if cfg.bc_type == "neumann":
                # penalise the normal derivative on each face batch; faces
                # are axis-aligned so du/dn is the corresponding gradient
                # component (sign of the outward normal squares away)
                _, gb = model.value_and_grad(params, Xb)
                comp = jnp.repeat(jnp.arange(cfg.dim), 2 * per_face)
                gn = jnp.take_along_axis(gb, comp[:, None], axis=1)[:, 0]
                bc = jnp.mean(gn**2)
            else:
                bc = jnp.mean(model.apply_batch(params, Xb) ** 2)
        else:
            bc = jnp.asarray(0.0)
        data = (
            data_mse(model.apply_batch(params, X_data), u_data)
            if X_data is not None
            else jnp.asarray(0.0)
        )
        if w["norm"] > 0:
            if cfg.norm_mode == "nontrivial":
                norm = norm_nontrivial(u_interior)
            elif cfg.norm_mode == "l2":
                norm = jnp.mean(u_interior**2)
            else:
                raise ValueError("norm mode should be 'nontrivial' or 'l2'")
        else:
            norm = jnp.asarray(0.0)
        mean_pen = (
            jnp.mean(u_interior) ** 2 if w["mean"] > 0 else jnp.asarray(0.0)
        )
        return bc, data, norm, mean_pen

    def eval_fn(params, key):
        """RMSE vs exact on fresh uniform points (Poisson_ND.py:281-285)."""
        X_te = uniform_box(key, cfg.n_eval, box)
        u = model.apply_batch(params, X_te)
        return jnp.sqrt(jnp.mean((u - exact_u(X_te, cfg.L, ks)) ** 2))

    optimizer = make_optimizer(cfg.lr, schedule=cfg.lr_schedule, total_steps=cfg.epochs)

    if cfg.method in ("PINN", "DRM"):

        def make_loss_fn(dtype: str):
            def loss_fn(params, key):
                if cfg.resample:
                    X_cur = draw_interior(jax.random.fold_in(key, 3))
                    f_cur = rhs_f(X_cur, cfg.L, ks)
                else:
                    X_cur, f_cur = X_in, f_in
                if dtype == "bfloat16":
                    p_c = jax.tree_util.tree_map(
                        lambda x: x.astype(jnp.bfloat16), params
                    )
                    X_c = X_cur.astype(jnp.bfloat16)
                else:
                    p_c, X_c = params, X_cur
                if cfg.method == "PINN":
                    if dtype == "kernel-bf16":
                        # f32 params/streams, 1-pass bf16 kernel dots (the
                        # VMEM jet forward's cheap mode + bf16 backward
                        # dots; lap rel-err ~2e-3 — the hybrid tail
                        # restores f32-class accuracy)
                        jet = model.fields(
                            p_c, X_c, impl="pallas",
                            fwd_impl="pallas2:default",
                            dot_dtype="bfloat16",
                        )
                    else:
                        impl = cfg.jet_impl if dtype != "bfloat16" else "xla"
                        jet = model.fields(p_c, X_c, impl=impl)
                    pde = pinn_poisson(jet.lap.astype(jnp.float32), f_cur)
                    u_int = jet.value.astype(jnp.float32)
                else:
                    u_int, g = model.value_and_grad(p_c, X_c)
                    u_int = u_int.astype(jnp.float32)
                    pde = drm_poisson_energy(
                        u_int, g.astype(jnp.float32), f_cur
                    )
                bc, data, norm, mean_pen = aux_terms(params, key, u_int)
                total = (
                    w["pde"] * pde + w["bc"] * bc + w["data"] * data
                    + w["norm"] * norm + w["mean"] * mean_pen
                )
                return total, {"pde": pde, "bc": bc, "data": data, "norm": norm}

            return loss_fn

        use_fused = cfg.jet_impl == "pallas-fused"
        if use_fused:
            # One-pass fused loss+grad kernel (kernels/fused_step.py): the
            # Poisson residual is linear in the net jet — r = -lap(B*net)
            # - f with coefficients from the factor jet — so the recompute
            # backward can form the loss AND the cotangents in-kernel and
            # the separate jet-forward kernel disappears (measured number
            # in BENCHMARKS.md).  Replaces Poisson_ND.py:64-96's d+1
            # autograd graphs per step.
            from ..kernels import fused_linear_residual, residual_coefficients
            from ..ops.fwdlap import constant_jet

            def factor_jet_at(X_cur):
                if model.factor is not None:
                    return model.factor.jet(X_cur)
                return constant_jet(
                    jnp.ones(X_cur.shape[0], X_cur.dtype), cfg.dim
                )

            from ..kernels import drm_coefficients, fused_drm_energy

            def coef_at(X_cur, f_cur):
                fj = factor_jet_at(X_cur)
                if cfg.method == "DRM":
                    return drm_coefficients(fj, f_cur)
                return residual_coefficients(fj, a0=-1.0, rhs=-f_cur)

            coef_fixed = (None if cfg.resample else coef_at(X_in, f_in))
            need_aux = (w["bc"] > 0 or w["data"] > 0 or w["norm"] > 0
                        or w["mean"] > 0)

            def make_lag_fn(dtype):
                dot_dtype = ("bfloat16" if dtype == "kernel-bf16"
                             else "float32")

                def lag_fn(params, key):
                    if cfg.resample:
                        X_cur = draw_interior(jax.random.fold_in(key, 3))
                        coef = coef_at(X_cur, rhs_f(X_cur, cfg.L, ks))
                    else:
                        X_cur, coef = X_in, coef_fixed
                    if cfg.coef_mode == "analytic":
                        from ..kernels import fused_poisson_analytic

                        pde, _, g_pde = fused_poisson_analytic(
                            params, X_cur, model.spec.activation,
                            L=cfg.L, ks=ks, weight=1.0,
                            dot_dtype=dot_dtype,
                        )
                    else:
                        fused = (fused_drm_energy if cfg.method == "DRM"
                                 else fused_linear_residual)
                        pde, _, g_pde = fused(
                            params, X_cur, coef, model.spec.activation,
                            weight=1.0, dot_dtype=dot_dtype,
                        )
                    total = w["pde"] * pde
                    grads = jax.tree_util.tree_map(
                        lambda g: w["pde"] * g, g_pde
                    )
                    zero = jnp.asarray(0.0)
                    metrics = {"pde": pde, "bc": zero, "data": zero,
                               "norm": zero}
                    if need_aux:
                        # the non-residual terms stay on plain autodiff
                        # (value forwards only — no jets)
                        def aux_loss(p):
                            u_int = (model.apply_batch(p, X_cur)
                                     if (w["norm"] > 0 or w["mean"] > 0)
                                     else jnp.zeros((1,)))
                            bc, data, norm, mean_pen = aux_terms(
                                p, key, u_int
                            )
                            tot = (w["bc"] * bc + w["data"] * data
                                   + w["norm"] * norm
                                   + w["mean"] * mean_pen)
                            return tot, (bc, data, norm)

                        (aux_tot, (bc, data, norm)), g_aux = (
                            jax.value_and_grad(aux_loss, has_aux=True)(
                                params))
                        total = total + aux_tot
                        grads = jax.tree_util.tree_map(
                            jnp.add, grads, g_aux
                        )
                        metrics = {"pde": pde, "bc": bc, "data": data,
                                   "norm": norm}
                    return (total, metrics), grads

                return lag_fn
        else:
            make_lag_fn = None

        def phase_args(dtype):
            """(loss_fn, extra fit kwargs) for one precision phase — the
            fused kernel carries the f32 and kernel-bf16 phases; bf16
            stream phases ride the XLA path as before."""
            if use_fused and dtype in ("float32", "kernel-bf16"):
                return None, {"loss_and_grad_fn": make_lag_fn(dtype)}
            return make_loss_fn(dtype), {}

        if cfg.compute_dtype in ("hybrid", "hybrid-kernel"):
            # bf16 bulk phase (2x step throughput) then an exact-f32 tail:
            # gets bf16's speed with f32's final accuracy.  The f32 phase
            # resumes from the FULL bf16-phase carry (same carry structure:
            # only the loss dtype changes), so Adam moments, the lr-schedule
            # step count and the running best all continue across the switch.
            # 'hybrid-kernel' keeps f32 streams and flips the Pallas kernel
            # into its 1-pass-bf16 dot mode for the bulk instead.
            bulk_dtype = ("kernel-bf16" if cfg.compute_dtype == "hybrid-kernel"
                          else "bfloat16")
            bulk = int(cfg.epochs * cfg.hybrid_bf16_fraction)
            tail = cfg.epochs - bulk
            lf_b, kw_b = phase_args(bulk_dtype)
            r1 = fit(
                lf_b, eval_fn, params,
                epochs=bulk, optimizer=optimizer, key=k_train, chunk=chunk,
                **kw_b,
            )
            lf_t, kw_t = phase_args("float32")
            result = fit(
                lf_t, eval_fn, params,
                epochs=tail, optimizer=optimizer, key=k_train,
                chunk=chunk, start_epoch=bulk, init_carry=r1.carry,
                **kw_t,
            )
            hist = {k: np.concatenate([r1.history[k], result.history[k]])
                    for k in result.history}
            result = result._replace(history=hist)
        else:
            lf, kw0 = phase_args(cfg.compute_dtype)
            result = fit(
                lf, eval_fn, params,
                epochs=cfg.epochs, optimizer=optimizer, key=k_train,
                chunk=chunk, **kw0,
            )
    else:  # WAN
        critic = _critic_model(cfg)
        v_params = critic.init(jax.random.fold_in(k_init, 1))

        # two-pass fused WAN (f32 phases): the Poisson weak form rides the
        # rhs lane (-f*phi), the critic regulariser mean(|grad v|^2 + v^2)
        # rides the fused quadratic mean (V=1/2, weight=2*reg)
        fused_wan = cfg.jet_impl == "pallas-fused"
        if fused_wan:
            from ..kernels import make_fused_quad_mean, quotient_coefficients
            from ._fused_wan import factor_jet_or_one, make_fused_wan_pair

            # fresh resampling per step (Poisson_ND.py:244-253): no
            # per-epoch critic context is possible — use the plain pair
            pair = make_fused_wan_pair(
                model, critic, w_pde=w["pde"], prefactor=1.0)
            u_pde_fn, v_pde_fn = pair.u_pde_fn, pair.v_loss_fn
            quad_reg = (make_fused_quad_mean(
                critic.spec.activation, weight=2.0 * cfg.wan_reg)
                if cfg.wan_reg else None)
            E_zero = jnp.asarray(0.0, jnp.float32)

        def wan_core(u_params, v_params, X, f, dtype):
            if dtype == "bfloat16":
                # net streams in bf16 (the HBM-bound cost); all reductions
                # (weak residual, norms) accumulate in f32
                cast16 = lambda t: jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16), t
                )
                X16 = X.astype(jnp.bfloat16)
                u, gu = model.value_and_grad(cast16(u_params), X16)
                v, gv = critic.value_and_grad(cast16(v_params), X16)
                u, gu, v, gv = (
                    u.astype(jnp.float32), gu.astype(jnp.float32),
                    v.astype(jnp.float32), gv.astype(jnp.float32),
                )
            else:
                u, gu = model.value_and_grad(u_params, X)
                v, gv = critic.value_and_grad(v_params, X)
            wv, dwv = bump_w(X, 0.0, cfg.L)
            phi = wv * v
            gphi = dwv * v[:, None] + wv[:, None] * gv
            weak = wan_weak_residual(gu, phi, gphi, f=f, prefactor=1.0)
            phi_norm = jnp.mean(phi**2)
            loss_pde = wan_pde_loss(weak, phi_norm)
            return loss_pde, weak, phi_norm, u, v, gv

        def make_v_loss_fn(dtype):
            def v_loss_fn(v_params, u_params, key):
                """Critic objective -log(loss_pde) + reg * mean(|grad v|^2
                + v^2), fresh interior sample (Poisson_ND.py:105-128,244-248)."""
                Xc = draw_interior(key)
                fc = rhs_f(Xc, cfg.L, ks)
                if fused_wan and dtype == "float32":
                    wv, dwv = bump_w(Xc, 0.0, cfg.L)
                    lv, _ = v_pde_fn(v_params, u_params, E_zero, Xc,
                                     wv, dwv, f=fc)
                    if quad_reg is not None:
                        coef_r = quotient_coefficients(
                            factor_jet_or_one(critic, Xc), V=0.5)
                        reg2, _ = quad_reg(v_params, Xc, coef_r)
                        lv = lv + reg2
                    return lv
                loss_pde, _, _, _, v, gv = wan_core(
                    u_params, v_params, Xc, fc, dtype
                )
                v_reg = jnp.mean(jnp.sum(gv * gv, axis=-1) + v * v)
                return -jnp.log(loss_pde + 1e-8) + cfg.wan_reg * v_reg

            return v_loss_fn

        def make_u_loss_fn(dtype):
            def u_loss_fn(u_params, v_params, key):
                Xu = draw_interior(key)
                fu = rhs_f(Xu, cfg.L, ks)
                if fused_wan and dtype == "float32":
                    wv, dwv = bump_w(Xu, 0.0, cfg.L)
                    pde_w, aux = u_pde_fn(u_params, E_zero, v_params, Xu,
                                          wv, dwv, f=fu)
                    loss_pde = aux["pde_loss"]
                    weak, phi_norm = aux["weak_residual"], aux["phi_norm"]
                    u_int = model.apply_batch(u_params, Xu)
                else:
                    loss_pde, weak, phi_norm, u_int, _, _ = wan_core(
                        u_params, v_params, Xu, fu, dtype
                    )
                    pde_w = w["pde"] * loss_pde
                bc, data, norm, mean_pen = aux_terms(
                    u_params, jax.random.fold_in(key, 7), u_int
                )
                total = (
                    pde_w + w["bc"] * bc + w["data"] * data
                    + w["norm"] * norm + w["mean"] * mean_pen
                )
                return total, {
                    "pde": loss_pde, "bc": bc, "data": data, "norm": norm,
                    "wan_weak": weak, "wan_phi_norm": phi_norm,
                }

            return u_loss_fn

        v_optimizer = make_optimizer(
            cfg.v_lr if cfg.v_lr is not None else cfg.lr,
            schedule=cfg.lr_schedule,
            total_steps=cfg.epochs * cfg.critic_steps,
        )
        wan_kw = dict(
            v_steps=cfg.critic_steps, u_optimizer=optimizer,
            v_optimizer=v_optimizer, key=k_train, chunk=min(chunk, cap),
            minimax=cfg.minimax, u_ema=cfg.u_ema,
        )
        if cfg.compute_dtype == "hybrid":
            bulk = int(cfg.epochs * cfg.hybrid_bf16_fraction)
            r1 = fit_wan(
                make_u_loss_fn("bfloat16"), make_v_loss_fn("bfloat16"),
                eval_fn, params, v_params, epochs=bulk, **wan_kw,
            )
            result = fit_wan(
                make_u_loss_fn("float32"), make_v_loss_fn("float32"),
                eval_fn, params, v_params, epochs=cfg.epochs - bulk,
                start_epoch=bulk, init_carry=r1.carry, **wan_kw,
            )
            hist = {k: np.concatenate([r1.history[k], result.history[k]])
                    for k in result.history}
            result = result._replace(history=hist)
        else:
            result = fit_wan(
                make_u_loss_fn(cfg.compute_dtype),
                make_v_loss_fn(cfg.compute_dtype),
                eval_fn, params, v_params, epochs=cfg.epochs, **wan_kw,
            )

    # rms of the manufactured solution: mean(sin^2) = 1/2 per dimension, so
    # ||u*||_rms = 2^{-d/2} exactly — gives the relative-L2 of BASELINE.json
    rms_exact = 0.5 ** (cfg.dim / 2.0)
    return {
        "config": dataclasses.asdict(cfg),
        "model": model,
        "result": result,
        "history": result.history,
        "final_l2": (float(result.history["l2"][-1])
                     if "l2" in result.history else None),
        "best_l2": result.best_metric,
        "rel_l2": result.best_metric / rms_exact,
        "best_epoch": result.best_epoch,
    }
