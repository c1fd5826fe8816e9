"""Kramers-Henneberger 1D preset: unified PINN / DRM / WAN with trainable
energy against a finite-difference ground truth.

Reproduces ``train_state_v2`` and ``run_compare``
(``/root/reference/Schrodinger_Equations/Kramers_Henneberger/KH_1D.py:290-653``):

* trainable eigenvalue E as a leaf of the primal pytree, used by the PINN
  residual and the WAN weak form (KH_1D.py:217,233,264); DRM instead tracks
  the Rayleigh quotient as its energy estimate (KH_1D.py:393-399);
* the cycle-averaged potential is evaluated **once** per grid and cached —
  the reference re-runs the 500-point theta quadrature inside every loss
  call of every epoch (KH_1D.py:231,239,259), the dominant flop after
  autodiff in its hot loop;
* WAN: direct ascent ``(-pde_loss)`` for the critic (no -log), critic lr =
  2x primal lr, ratio-squared pde normalisation (KH_1D.py:244-269,336,347);
* data loss on the first ``fraction`` of grid points capped at
  ``max_data_points`` (KH_1D.py:283-287,327); orthogonality strictly
  against FD lower states (KH_1D.py:271-280); boundary penalty
  ``u[0]^2 + u[-1]^2``; optional parity loss;
* sign-aware best tracking on the train grid, dense-grid final L2, and the
  rich JSON row schema of run_compare (KH_1D.py:573-601).
"""

from __future__ import annotations

import dataclasses
import datetime
import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..exp import append_result, save_curves, save_params
from ..losses.zoo import data_mse, norm_integral, orthogonal_projection
from ..models import NetSpec, SolutionModel, factor_for_technique
from ..ops.quadrature import integral_mean, sign_aware_mse
from ..pde import kh as phys
from ..train import fit, fit_wan


@dataclasses.dataclass
class KHConfig:
    method: str = "PINN"               # PINN | DRM | WAN
    n: int = 0                         # eigenstate index
    technique: str = "RAW"             # RAW | FBC (WAN forces RAW)
    layers: Tuple[int, ...] = (1, 64, 64, 64, 1)
    epochs: int = 10000
    lr: float = 1e-3
    # loss weights (train_state_v2 defaults, KH_1D.py:295)
    lambda_pde: float = 1.0
    lambda_data: float = 1.0
    lambda_orth: float = 1e4
    lambda_norm: float = 1e3
    lambda_bc: float = 1e4
    lambda_parity: float = 0.0         # reference spells it lambda_party
    data_fraction: float = 0.25
    max_data_points: Optional[int] = None
    v_layers: Tuple[int, ...] = (1, 50, 50, 50, 1)
    v_steps: int = 3
    train_n: int = 1024
    seed: int = 0
    chunk: int = 1000
    # 'xla' | 'pallas' | 'pallas-fused' (PINN only): 'pallas-fused' = the
    # one-pass fused loss+grad kernel on r = -1/2 lap u + (V - E) u with
    # the in-kernel dL/dE lane (kernels/fused_step.py)
    jet_impl: str = "xla"


def _u_model(cfg: KHConfig, L: float) -> SolutionModel:
    technique = "RAW" if cfg.method == "WAN" else cfg.technique
    factor = factor_for_technique(technique, dim=1, kind="window", L=L)
    return SolutionModel(NetSpec(tuple(cfg.layers), activation="sin"), factor)


def train_kh(cfg: KHConfig, gt: phys.KHGroundTruth, x_train=None) -> Dict:
    if cfg.method not in ("PINN", "DRM", "WAN"):
        raise ValueError("method must be 'PINN' | 'DRM' | 'WAN'")
    if cfg.jet_impl not in ("xla", "pallas", "pallas-fused"):
        raise ValueError("jet_impl must be 'xla', 'pallas' or 'pallas-fused'")
    L = gt.L
    n = cfg.n
    model = _u_model(cfg, L)
    key = jax.random.PRNGKey(cfg.seed)

    if x_train is None:
        x = jnp.linspace(-L, L, cfg.train_n, dtype=jnp.float32)
    else:
        x = jnp.asarray(x_train, jnp.float32)
    X = x.reshape(-1, 1)

    # GT on the train grid (device-side interp; V cached once)
    _, V_train, psi_train = gt.resample(x)
    psi_n = psi_train[:, n]
    lower = psi_train[:, :n]                      # (N, n)

    m = x.shape[0]
    k_data = max(1, int(m * cfg.data_fraction))
    if cfg.max_data_points is not None:
        k_data = min(k_data, int(cfg.max_data_points))
    idx_data = jnp.arange(k_data)
    psi_data = psi_n[idx_data]

    E_init = gt.energy(n)
    u_params = {"net": model.init(key), "E": jnp.asarray(E_init, jnp.float32)}

    parity_sign = 1.0 if n % 2 == 0 else -1.0
    X_neg = -X

    def orth_term(u):
        if n == 0:
            return jnp.asarray(0.0)
        # KH uses eps=1e-12 in the projection denominators (KH_1D.py:279),
        # unlike the analytic-state presets' 1e-8
        return orthogonal_projection(u, lower, 2.0 * L, eps=1e-12)

    def common_terms(net_p, u):
        data = data_mse(u[idx_data], psi_data) if cfg.lambda_data != 0 else jnp.asarray(0.0)
        orth = orth_term(u)
        bc = u[0] ** 2 + u[-1] ** 2
        if cfg.lambda_parity != 0.0:
            u_swap = model.apply_batch(net_p, X_neg)
            parity = jnp.mean((u - parity_sign * u_swap) ** 2)
        else:
            parity = jnp.asarray(0.0)
        return data, orth, bc, parity

    def eval_fn(params, key):
        u = model.apply_batch(params["net"], X)
        return sign_aware_mse(u, psi_n)

    if cfg.method in ("PINN", "DRM"):
        # fused eigen-DRM: two-pass Rayleigh with V; KH's integral-mean
        # +1e-12 denominator (KH_1D.py:239-241) rescales to a plain-mean
        # den_eps of 1e-12/(2L)
        fused_drm = cfg.method == "DRM" and cfg.jet_impl == "pallas-fused"
        if fused_drm:
            from ..kernels import make_fused_rayleigh, quotient_coefficients
            from ._fused_wan import factor_jet_or_one

            ray_loss = make_fused_rayleigh(
                model.spec.activation, weight=1.0,
                den_eps=1e-12 / (2.0 * L))
            coef_ray = quotient_coefficients(
                factor_jet_or_one(model, X), V=V_train)

        def loss_fn(params, key):
            net_p = params["net"]
            if fused_drm:
                core, aux_ray = ray_loss(net_p, X, coef_ray)
                u = model.apply_batch(net_p, X)
                E_tracked = aux_ray["rayleigh"]   # aux: no grad flows (the
                # same semantics as stop_gradient(core) on the XLA path)
                data, orth, bc, parity = common_terms(net_p, u)
                norm_pen = norm_integral(u, 2.0 * L)
                total = (
                    cfg.lambda_pde * core + cfg.lambda_data * data
                    + cfg.lambda_orth * orth + cfg.lambda_norm * norm_pen
                    + cfg.lambda_bc * bc + cfg.lambda_parity * parity
                )
                return total, {
                    "pde": core, "data": data, "orth": orth,
                    "norm": norm_pen, "bc": bc, "parity": parity,
                    "E": E_tracked,
                }
            if cfg.method == "PINN":
                jet = model.fields(
                    net_p, X,
                    impl="pallas" if cfg.jet_impl == "pallas" else "xla",
                )
                u = jet.value
                r = -0.5 * jet.lap + V_train * u - params["E"] * u
                core = jnp.mean(r**2)
                E_tracked = params["E"]
            else:
                u, g = model.value_and_grad(net_p, X)
                num = integral_mean(0.5 * g[:, 0] ** 2 + V_train * u**2, 2.0 * L)
                den = integral_mean(u**2, 2.0 * L) + 1e-12
                core = num / den
                E_tracked = jax.lax.stop_gradient(core)
            data, orth, bc, parity = common_terms(net_p, u)
            norm_pen = norm_integral(u, 2.0 * L)
            total = (
                cfg.lambda_pde * core + cfg.lambda_data * data
                + cfg.lambda_orth * orth + cfg.lambda_norm * norm_pen
                + cfg.lambda_bc * bc + cfg.lambda_parity * parity
            )
            return total, {
                "pde": core, "data": data, "orth": orth, "norm": norm_pen,
                "bc": bc, "parity": parity, "E": E_tracked,
            }

        if cfg.jet_impl == "pallas-fused" and cfg.method == "PINN":
            # One-pass fused loss+grad kernel on r = -1/2 lap u + (V - E) u
            # with u = B*net (B = exp window, or 1 for RAW); coefficients
            # rebuilt per step only through the trainable E; dL/dE from the
            # kernel's extra-output lane.  Replaces KH_1D.py:226-234's
            # chained autograd.grad pair per step.
            from ..kernels import fused_linear_residual, residual_coefficients
            from ..ops.fwdlap import constant_jet

            fj = (model.factor.jet(X) if model.factor is not None
                  else constant_jet(jnp.ones(X.shape[0], X.dtype), 1))

            def lag_fn(params, key):
                coef = residual_coefficients(
                    fj, a0=-0.5, c0=V_train - params["E"], e_lane=True
                )
                core, kaux, g_pde = fused_linear_residual(
                    params["net"], X, coef, model.spec.activation
                )

                def aux_loss(p):
                    u = model.apply_batch(p["net"], X)
                    data, orth, bc, parity = common_terms(p["net"], u)
                    norm_pen = norm_integral(u, 2.0 * L)
                    tot = (
                        cfg.lambda_data * data + cfg.lambda_orth * orth
                        + cfg.lambda_norm * norm_pen + cfg.lambda_bc * bc
                        + cfg.lambda_parity * parity
                    )
                    return tot, (data, orth, bc, parity, norm_pen)

                (aux_tot, (data, orth, bc, parity, norm_pen)), g_aux = (
                    jax.value_and_grad(aux_loss, has_aux=True)(params)
                )
                total = cfg.lambda_pde * core + aux_tot
                grads = {
                    "net": jax.tree_util.tree_map(
                        lambda a, b: cfg.lambda_pde * a + b,
                        g_pde, g_aux["net"],
                    ),
                    # dr/dE = -u  =>  dL/dE = -(2 lambda_pde / N) sum r*u
                    "E": (-2.0 * cfg.lambda_pde / kaux["n"])
                    * kaux["sum_r_ufull"] + g_aux["E"],
                }
                metrics = {"pde": core, "data": data, "orth": orth,
                           "norm": norm_pen, "bc": bc, "parity": parity,
                           "E": params["E"]}
                return (total, metrics), grads

            fit_kwargs = {"loss_and_grad_fn": lag_fn}
        else:
            fit_kwargs = {}

        result = fit(
            loss_fn, eval_fn, u_params,
            epochs=cfg.epochs, optimizer=optax.adam(cfg.lr),
            key=jax.random.fold_in(key, 1), chunk=cfg.chunk,
            **fit_kwargs,
        )
    else:  # WAN
        v_model = SolutionModel(NetSpec(tuple(cfg.v_layers), activation="sin"))
        v_params = v_model.init(jax.random.fold_in(key, 9))

        # fused WAN: KH's ratio-squared convention with integral-mean
        # normalisation rescales to plain means with eps = 1e-12/(2L)
        # (num and den both carry the 2L volume); direct-ascent critic
        fused_wan = cfg.jet_impl == "pallas-fused"
        v_context_fn = None
        if fused_wan:
            from ..ops import bump_w
            from ._fused_wan import make_fused_wan_pair

            pair = make_fused_wan_pair(
                model, v_model, w_pde=cfg.lambda_pde,
                convention="ratio_sq", eps=1e-12 / (2.0 * L),
                objective="neg")
            u_pde_fn = pair.u_pde_fn
            wv_kh, dwv_kh = bump_w(X, -L, L)

            # fixed grid: critic coefficient stream once per epoch
            def v_context_fn(u_params, key):
                return pair.v_coef_fn(u_params["net"], u_params["E"], X,
                                      wv_kh, dwv_kh, V=V_train)
        else:
            # XLA path: u's (value, grad) and the current trainable E are
            # critic-loop invariant at the fixed grid — once per epoch
            def v_context_fn(u_params, key):
                u, gu = model.value_and_grad(u_params["net"], X)
                return (u, gu, u_params["E"])

        def wan_pde(params, v_params, ctx=None):
            if ctx is None:
                u, gu = model.value_and_grad(params["net"], X)
                E_cur = params["E"]
            else:
                u, gu, E_cur = ctx
            v, gv = v_model.value_and_grad(v_params, X)
            # bump weight function on [-L, L] (KH_1D.py:138-148)
            from ..ops import bump_w

            wv, dwv = bump_w(X, -L, L)
            phi = wv * v
            gphi = dwv[:, 0] * v + wv * gv[:, 0]
            I_kin_pot = integral_mean(
                0.5 * gu[:, 0] * gphi + V_train * u * phi, 2.0 * L
            )
            I_u_phi = integral_mean(u * phi, 2.0 * L)
            I_full = I_kin_pot - E_cur * I_u_phi
            norm_phi = integral_mean(phi**2, 2.0 * L) + 1e-12
            pde = (I_full / norm_phi) ** 2      # ratio-squared (KH_1D.py:267)
            return pde, u

        def v_loss_fn(v_params, ctx, key):
            if fused_wan:
                lv, _ = pair.v_loss_from_coef(v_params, X, ctx)
                return lv
            pde, _ = wan_pde(None, v_params, ctx=ctx)
            return -pde                          # direct ascent (KH_1D.py:347-350)

        def u_loss_fn(u_params, v_params, key):
            if fused_wan:
                pde_w, aux = u_pde_fn(u_params["net"], u_params["E"],
                                      v_params, X, wv_kh, dwv_kh,
                                      V=V_train)
                pde = aux["pde_loss"]
                u = model.apply_batch(u_params["net"], X)
            else:
                pde, u = wan_pde(u_params, v_params)
                pde_w = cfg.lambda_pde * pde
            norm_u = norm_integral(u, 2.0 * L)
            data, orth, bc, parity = common_terms(u_params["net"], u)
            total = (
                pde_w + cfg.lambda_norm * norm_u
                + cfg.lambda_data * data + cfg.lambda_orth * orth
                + cfg.lambda_bc * bc + cfg.lambda_parity * parity
            )
            return total, {
                "pde": pde, "data": data, "orth": orth, "norm": norm_u,
                "bc": bc, "parity": parity, "E": u_params["E"],
            }

        result = fit_wan(
            u_loss_fn, v_loss_fn, eval_fn, u_params, v_params,
            epochs=cfg.epochs, v_steps=cfg.v_steps,
            u_optimizer=optax.adam(cfg.lr),
            v_optimizer=optax.adam(cfg.lr * 2.0),   # KH_1D.py:336
            key=jax.random.fold_in(key, 1), chunk=cfg.chunk,
            v_context_fn=v_context_fn,
        )

    best = result.best_params
    return {
        "config": dataclasses.asdict(cfg),
        "model": model,
        "result": result,
        "history": result.history,
        "L2": float(result.best_metric),
        "best_epoch": result.best_epoch,
        "E_est": float(best["E"]) if cfg.method != "DRM" else float(
            result.history["E"][result.best_epoch]
        ),
        "E_ref": E_init,
        "E_track": result.history["E"],
        "idx_data": np.asarray(idx_data),
    }


# ------------------------------------------------------------- run_compare
@dataclasses.dataclass
class KHCompareConfig:
    alpha: float = 10.0
    v0: float = phys.V0_DEFAULT
    L: float = 60.0
    n_ref: int = 5000
    n_max: int = 4
    use_avg: bool = True
    n_theta: int = 500
    train_n: int = 1024
    layers: Tuple[int, ...] = (1, 100, 100, 100, 1)
    technique: str = "FBC"
    v_layers: Tuple[int, ...] = (1, 50, 50, 50, 1)
    v_steps: int = 3
    epochs: int = 10000
    lr: float = 1e-3
    lambda_pde: float = 10.0
    lambda_data: float = 1e4
    lambda_orth: float = 1e4
    lambda_norm: float = 10.0
    lambda_bc: float = 1e4
    lambda_parity: float = 1e4
    data_fraction: float = 0.25
    max_data_points: Optional[int] = 128
    methods: Tuple[str, ...] = ("PINN", "DRM", "WAN")
    jet_impl: str = "xla"              # pallas-fused applies to PINN runs
    save_dir: Optional[str] = None
    results_filename: str = "results_KH_1D_unified.json"
    seed: int = 0
    chunk: int = 1000


def run_compare(cfg: KHCompareConfig) -> List[dict]:
    """Build GT once, train methods x levels, persist models/curves/rows."""
    n_levels = max(cfg.n_max + 2, 10)
    gt = phys.KHGroundTruth(
        alpha=cfg.alpha, v0=cfg.v0, L=cfg.L, N=cfg.n_ref,
        n_levels=n_levels, use_avg=cfg.use_avg, n_theta=cfg.n_theta,
    )
    x_train = jnp.linspace(-cfg.L, cfg.L, cfg.train_n, dtype=jnp.float32)
    timestamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    rows = []
    for n in range(cfg.n_max):
        for method in cfg.methods:
            t0 = time.time()
            run_cfg = KHConfig(
                method=method, n=n,
                technique=("RAW" if method == "WAN" else cfg.technique),
                layers=cfg.layers, epochs=cfg.epochs, lr=cfg.lr,
                lambda_pde=cfg.lambda_pde, lambda_data=cfg.lambda_data,
                lambda_orth=cfg.lambda_orth, lambda_norm=cfg.lambda_norm,
                lambda_bc=cfg.lambda_bc, lambda_parity=cfg.lambda_parity,
                data_fraction=cfg.data_fraction,
                max_data_points=cfg.max_data_points,
                v_layers=cfg.v_layers, v_steps=cfg.v_steps,
                train_n=cfg.train_n, seed=cfg.seed, chunk=cfg.chunk,
                # every leg is fused now: one-pass kernel for the PINN
                # residual, two-pass quotient kernels for DRM and WAN
                jet_impl=cfg.jet_impl,
            )
            res = train_kh(run_cfg, gt, x_train=x_train)
            elapsed = time.time() - t0

            # dense-grid final L2 (KH_1D.py:550-556)
            import jax as _jax

            u_dense = _jax.jit(res["model"].apply_batch)(
                res["result"].best_params["net"], gt.x.reshape(-1, 1)
            )
            l2_dense = float(sign_aware_mse(u_dense, gt.psi[:, n]))

            row = {
                "method": method,
                "n": int(n),
                "alpha": float(cfg.alpha),
                "V0": float(cfg.v0),
                "L": float(cfg.L),
                "use_avg": bool(cfg.use_avg),
                "n_theta": int(cfg.n_theta),
                "train_N": int(cfg.train_n),
                "epochs": int(cfg.epochs),
                "lr": float(cfg.lr),
                "technique": run_cfg.technique,
                "E_ref": float(gt.energy(n)),
                "E_est": res["E_est"],
                "L2_error_train_best": res["L2"],
                "L2_error_dense": l2_dense,
                "elapsed_time_sec": float(elapsed),
                "best_epoch": int(res["best_epoch"]),
                "time_of_best_epoch_est": (
                    elapsed * res["best_epoch"] / cfg.epochs
                    if res["best_epoch"] >= 0 else None
                ),
                "timestamp": timestamp,
                "data_fraction": float(cfg.data_fraction),
                "max_data_points": cfg.max_data_points,
                "v_steps": (cfg.v_steps if method == "WAN" else None),
            }
            if cfg.save_dir:
                tag = f"KH1D_{method}_n{n}_alpha{cfg.alpha:+.3f}_{timestamp}"
                from ..exp.plotting import plot_solution_gt

                row["plot_path"] = plot_solution_gt(
                    gt.x, gt.psi[:, n], u_dense, gt.V, res["E_est"],
                    method, n, os.path.join(cfg.save_dir, tag + ".png"),
                )
                row["model_path"] = save_params(
                    os.path.join(cfg.save_dir, tag + "_best"),
                    res["result"].best_params,
                    meta={"problem": "kh_1d", "layers": list(cfg.layers),
                          "activation": "sin",
                          "technique": run_cfg.technique, "n": n,
                          "L": float(cfg.L), "alpha": float(cfg.alpha)},
                )
                curve_paths = save_curves(
                    cfg.save_dir, tag,
                    {"losses": res["history"]["total"],
                     "L2": res["history"]["l2"],
                     "Etrack": res["E_track"]},
                )
                row["losses_npy"] = curve_paths["losses"]
                row["l2s_npy"] = curve_paths["L2"]
                row["Etrack_npy"] = curve_paths["Etrack"]
                append_result(
                    os.path.join(cfg.save_dir, cfg.results_filename), row
                )
            rows.append(row)
    return rows
