"""Quantum harmonic oscillator presets (1D PINN/DRM and 1D WAN).

Reproduces:
* ``train_pinn_single`` (the second, surviving definition) —
  ``/root/reference/Schrodinger_Equations/Quantum_Harmonic_Oscillator/QHO_1D_PINN_DRM.py:386-575``
  — techniques BC (soft) / OG (hard exp window + orthogonality) / FN (hard
  window + Hermite nodes), fixed exact energy in the residual, trapezoid
  normalisation loss.
* ``train_seperate`` (WAN) — ``QHO_1D_WAN.py:159-362`` — the energy is a
  **trainable parameter** inside the weak form (QHO_1D_WAN.py:101,131); here
  it lives as an extra leaf of the primal parameter pytree, updated by the
  same Adam step (replacing the reference's nn.Parameter).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..losses.zoo import (
    data_mse,
    drm_rayleigh,
    norm_integral,
    norm_trapezoid,
    orthogonal_projection,
    pinn_schrodinger,
    wan_pde_loss,
    wan_weak_residual,
)
from ..models import NetSpec, SolutionModel, factor_for_technique
from ..ops import bump_w
from ..ops.quadrature import sign_aware_mse
from ..pde import qho as phys
from ..sampling import linspace_grid, mid_fraction_every_kth
from ..train import fit, fit_wan, lbfgs_fit, lbfgs_polish, make_wan_optimizers


def _qho_factor(technique: str, n: int, x_max: float):
    return factor_for_technique(
        technique,
        dim=1,
        kind="window",
        L=x_max,
        nodes_per_dim=[phys.nodes(n)] if technique == "FN" else None,
    )


def _lower_states(n: int, x):
    if n <= 0:
        return jnp.zeros((x.shape[0], 0), x.dtype)
    return jnp.stack([phys.psi_1d(k, x) for k in range(n)], axis=1)


@dataclasses.dataclass
class QHO1DConfig:
    n: int = 0
    x_max: float = 6.0
    epochs: int = 3000
    lr: float = 1e-3
    layers: Tuple[int, ...] = (1, 200, 200, 200, 1)
    LBFGS: bool = False
    # 'replace': L-BFGS *instead of* Adam — the mode the reference actually
    # uses for QHO-1D (QHO_1D_PINN_DRM.py:437-439).  'polish': Adam for
    # cfg.epochs then an L-BFGS tail from the best Adam iterate.
    lbfgs_mode: str = "polish"         # polish | replace
    lbfgs_iters: int = 500
    method: str = "DRM"               # PINN | DRM
    technique: str = "BC"             # BC | OG | FN
    grid_n: int = 1000
    data_fraction: float = 0.25
    data_stride: int = 10
    seed: int = 0
    chunk: int = 1000
    # 'xla' | 'pallas' | 'pallas-fused' (PINN only; kernels/fused_step.py)
    jet_impl: str = "xla"


def train_qho_1d(cfg: QHO1DConfig) -> Dict:
    if cfg.method not in ("PINN", "DRM"):
        raise ValueError("method must be 'PINN' or 'DRM'")
    if cfg.jet_impl not in ("xla", "pallas", "pallas-fused"):
        raise ValueError("jet_impl must be 'xla', 'pallas' or 'pallas-fused'")
    if cfg.technique not in ("BC", "OG", "FN"):
        raise ValueError(
            f"Unknown technique: {cfg.technique}. Choose 'BC', 'OG', or 'FN'."
        )
    n, x_max = cfg.n, cfg.x_max
    model = SolutionModel(
        NetSpec(tuple(cfg.layers), activation="sin"),
        _qho_factor(cfg.technique, n, x_max),
    )
    key = jax.random.PRNGKey(cfg.seed)
    params = model.init(key)

    x_grid = linspace_grid(cfg.grid_n, -x_max, x_max)
    x_flat = x_grid[:, 0]
    dx = x_flat[1] - x_flat[0]
    u_exact = phys.psi_1d(n, x_flat)
    idx = mid_fraction_every_kth(cfg.grid_n, cfg.data_fraction, cfg.data_stride)
    x_data, u_data = x_grid[idx], u_exact[idx]
    x_bc = jnp.array([[-x_max], [x_max]])
    lower = _lower_states(n, x_flat)
    V = phys.potential_1d(x_flat)
    E = phys.energy_1d(n)
    hard_bc = cfg.technique in ("OG", "FN")

    # QHO_1D_PINN_DRM.py:441-457
    w = {
        "orth": 100.0 if cfg.technique == "OG" else 0.0,
        "data": 1000.0,
        "bc": 0.0 if hard_bc else 10.0,
        "pde": 10.0 if cfg.method == "PINN" else 0.0,
        "drm": 10.0 if cfg.method == "DRM" else 0.0,
        "norm": 10.0,
    }
    # Orthogonal_loss uses volume 2 * domain_length = 4 * x_max
    # (QHO_1D_PINN_DRM.py:207-209 with domain_length = 2 * X_max).
    orth_volume = 4.0 * x_max

    # fused eigen-DRM: two-pass Rayleigh quotient WITH the potential
    # (QHO_1D_PINN_DRM.py:176-185)
    fused_drm = cfg.method == "DRM" and cfg.jet_impl == "pallas-fused"
    if fused_drm:
        from ..kernels import make_fused_rayleigh, quotient_coefficients
        from ._fused_wan import factor_jet_or_one

        ray_loss = make_fused_rayleigh(
            model.spec.activation, weight=w["drm"])
        coef_ray = quotient_coefficients(
            factor_jet_or_one(model, x_grid), V=V)

    def loss_terms(params):
        if fused_drm:
            total_ray, aux_ray = ray_loss(params, x_grid, coef_ray)
            u = model.apply_batch(params, x_grid)
            terms = {
                "data": data_mse(model.apply_batch(params, x_data), u_data),
                "bc": data_mse(model.apply_batch(params, x_bc),
                               jnp.zeros((2,))),
                "pde": jnp.asarray(0.0),
                "drm": aux_ray["rayleigh"],
                "norm": norm_trapezoid(u, dx),
                "orth": orthogonal_projection(u, lower, orth_volume,
                                              eps=0.0)
                if n > 0 else jnp.asarray(0.0),
            }
            total = total_ray + sum(
                w[k] * terms[k] for k in w if k not in ("drm", "pde"))
            return total, terms
        # compute only the active method's operator (jet for PINN, grad for DRM)
        if w["pde"] > 0:
            jet = model.fields(
                params, x_grid,
                impl="pallas" if cfg.jet_impl == "pallas" else "xla",
            )
            u, g = jet.value, jet.grad
            pde = pinn_schrodinger(u, jet.lap, V, E)
            drm = jnp.asarray(0.0)
        else:
            u, g = model.value_and_grad(params, x_grid)
            pde = jnp.asarray(0.0)
            drm = drm_rayleigh(u, g, V)
        terms = {
            "data": data_mse(model.apply_batch(params, x_data), u_data),
            "bc": data_mse(model.apply_batch(params, x_bc), jnp.zeros((2,))),
            "pde": pde,
            "drm": drm,
            "norm": norm_trapezoid(u, dx),
            "orth": orthogonal_projection(u, lower, orth_volume, eps=0.0)
            if n > 0
            else jnp.asarray(0.0),
        }
        total = sum(w[k] * terms[k] for k in w)
        return total, terms

    def loss_fn(params, key):
        return loss_terms(params)

    def eval_fn(params, key):
        u = model.apply_batch(params, x_grid)
        return jnp.mean((u - u_exact) ** 2)

    if cfg.LBFGS and cfg.lbfgs_mode == "replace":
        # the reference's QHO-1D mode: L-BFGS from scratch, no Adam at all
        # (QHO_1D_PINN_DRM.py:437-439 — torch LBFGS closure per epoch)
        result = lbfgs_fit(
            lambda p: loss_terms(p)[0], lambda p: eval_fn(p, None), params,
            max_iter=cfg.lbfgs_iters,
        )
    else:
        if cfg.jet_impl == "pallas-fused" and cfg.method == "PINN":
            # one-pass fused loss+grad on r = -1/2 lap u + (V - E) u
            # (fixed exact E, QHO_1D_PINN_DRM.py:173); aux terms on autodiff
            # (DRM rides the fused Rayleigh custom_vjp through loss_terms)
            from ..kernels import fused_linear_residual, residual_coefficients
            from ..ops.fwdlap import constant_jet

            fj = (model.factor.jet(x_grid) if model.factor is not None
                  else constant_jet(
                      jnp.ones(x_grid.shape[0], x_grid.dtype), 1))
            coef_fused = residual_coefficients(fj, a0=-0.5, c0=V - E)

            def lag_fn(params, key):
                pde, _, g_pde = fused_linear_residual(
                    params, x_grid, coef_fused, model.spec.activation
                )

                def aux_loss(p):
                    u = model.apply_batch(p, x_grid)
                    terms = {
                        "data": data_mse(
                            model.apply_batch(p, x_data), u_data),
                        "bc": data_mse(
                            model.apply_batch(p, x_bc), jnp.zeros((2,))),
                        "norm": norm_trapezoid(u, dx),
                        "orth": orthogonal_projection(
                            u, lower, orth_volume, eps=0.0)
                        if n > 0 else jnp.asarray(0.0),
                    }
                    return sum(w[k] * terms[k] for k in terms), terms

                (aux_tot, terms), g_aux = jax.value_and_grad(
                    aux_loss, has_aux=True
                )(params)
                total = w["pde"] * pde + aux_tot
                grads = jax.tree_util.tree_map(
                    lambda a, b: w["pde"] * a + b, g_pde, g_aux
                )
                metrics = {"pde": pde, "drm": jnp.asarray(0.0)}
                metrics.update(terms)
                return (total, metrics), grads

            fit_kwargs = {"loss_and_grad_fn": lag_fn}
        else:
            fit_kwargs = {}
        result = fit(
            loss_fn, eval_fn, params,
            epochs=cfg.epochs, optimizer=optax.adam(cfg.lr),
            key=jax.random.fold_in(key, 1), chunk=cfg.chunk,
            **fit_kwargs,
        )
    if cfg.LBFGS and cfg.lbfgs_mode == "polish":
        # polish from the BEST Adam iterate (round 1 polished the final
        # iterate, which the eval metric had already rejected — a no-op)
        polished, _ = lbfgs_polish(
            lambda p: loss_terms(p)[0], result.best_params,
            max_iter=cfg.lbfgs_iters,
        )
        final_m = float(eval_fn(polished, None))
        if final_m < result.best_metric:
            result = result._replace(
                params=polished, best_params=polished, best_metric=final_m,
                best_epoch=cfg.epochs,   # the polish runs after the last epoch
            )
        else:
            result = result._replace(params=polished)

    return {
        "config": dataclasses.asdict(cfg),
        "model": model,
        "result": result,
        "history": result.history,
        "L2_error": float(result.best_metric),
        "min_epoch": result.best_epoch,
        "weights": w,
    }


# ------------------------------------------------------------------------ WAN
@dataclasses.dataclass
class QHO1DWanConfig:
    n: int = 0
    x_max: float = 6.0
    epochs: int = 3000
    lr: float = 1e-3
    layers: Tuple[int, ...] = (1, 200, 200, 200, 1)
    v_layers: Tuple[int, ...] = (1, 100, 100, 100, 1)
    technique: str = "BC"             # BC | FBC | OG
    v_steps: int = 5
    grid_n: int = 1000
    data_fraction: float = 0.25
    data_stride: int = 10
    # WAN saddle-point knobs (see train/trainer.py fit_wan)
    minimax: str = "alternating"
    v_lr: Optional[float] = None
    u_ema: float = 0.0
    lr_schedule: str = "constant"   # constant | cosine | exponential
    lr_decay_steps: int = 0         # decay-then-hold horizon (train/optim.py)
    seed: int = 0
    chunk: int = 500
    # 'pallas-fused': two-pass fused u/v objectives with the exact
    # trainable-E gradient from the in-kernel sum(u*phi) lane
    jet_impl: str = "xla"


def train_qho_1d_wan(cfg: QHO1DWanConfig) -> Dict:
    """WAN with trainable energy: E is a leaf of the primal pytree
    (QHO_1D_WAN.py:101,131)."""
    n, x_max = cfg.n, cfg.x_max
    hard = cfg.technique != "BC"
    # both u and v nets get the exp window when technique != BC
    # (QHO_1D_WAN.py:191-196)
    u_factor = _qho_factor("OG" if hard else "BC", n, x_max)
    u_model = SolutionModel(NetSpec(tuple(cfg.layers), activation="tanh"), u_factor)
    v_model = SolutionModel(
        NetSpec(tuple(cfg.v_layers), activation="tanh"), u_factor
    )

    key = jax.random.PRNGKey(cfg.seed)
    u_params = {"net": u_model.init(key), "E": jnp.asarray(phys.energy_1d(n))}
    v_params = v_model.init(jax.random.fold_in(key, 1))

    x_grid = linspace_grid(cfg.grid_n, -x_max, x_max)
    x_flat = x_grid[:, 0]
    u_exact = phys.psi_1d(n, x_flat)
    idx = mid_fraction_every_kth(cfg.grid_n, cfg.data_fraction, cfg.data_stride)
    x_data, u_data = x_grid[idx], u_exact[idx]
    x_bc = jnp.array([[-x_max], [x_max]])
    lower = _lower_states(n, x_flat)
    V = phys.potential_1d(x_flat)

    # QHO_1D_WAN.py:181-200
    w = {
        "orth": 1000.0 if cfg.technique == "OG" else 0.0,
        "data": 1000.0,
        "pde": 10.0,
        "norm": 10.0,
        "bc": 0.0 if hard else 1000.0,
    }
    volume = 2.0 * x_max

    wv_const, dwv_const = bump_w(x_grid, -x_max, x_max)

    fused = cfg.jet_impl == "pallas-fused"
    v_context_fn = None
    if fused:
        from ._fused_wan import make_fused_wan_pair

        # norm rides the in-kernel mass lane (vol = 2L, QHO_1D_WAN.py:137)
        pair = make_fused_wan_pair(
            u_model, v_model, w_pde=w["pde"], w_norm=w["norm"], vol=volume)
        u_pde_fn = pair.u_pde_fn

        # fixed grid: build the critic coefficient stream (incl. the
        # CURRENT trainable E) once per epoch
        def v_context_fn(u_params, key):
            return pair.v_coef_fn(u_params["net"], u_params["E"], x_grid,
                                  wv_const, dwv_const, V=V)
    else:
        # XLA path: u's (value, grad) and the current trainable E are
        # critic-loop invariant at the fixed grid — once per epoch
        def v_context_fn(u_params, key):
            u, gu = u_model.value_and_grad(u_params["net"], x_grid)
            return (u, gu, u_params["E"])

    def wan_pde(u_params, v_params, ctx=None):
        if ctx is None:
            u, gu = u_model.value_and_grad(u_params["net"], x_grid)
            E_cur = u_params["E"]
        else:
            u, gu, E_cur = ctx
        v, gv = v_model.value_and_grad(v_params, x_grid)
        phi = wv_const * v
        gphi = dwv_const * v[:, None] + wv_const[:, None] * gv
        weak = wan_weak_residual(
            gu, phi, gphi, u=u, V=V, E=E_cur, prefactor=0.5
        )
        phi_norm = jnp.mean(phi**2)
        return wan_pde_loss(weak, phi_norm), u

    def v_loss_fn(v_params, ctx, key):
        if fused:
            lv, _ = pair.v_loss_from_coef(v_params, x_grid, ctx)
            return lv
        loss_pde, _ = wan_pde(None, v_params, ctx=ctx)
        return -jnp.log(loss_pde + 1e-8)

    def u_loss_fn(u_params, v_params, key):
        if fused:
            # E is a primal pytree leaf — its exact gradient rides the
            # custom VJP's u*phi lane (QHO_1D_WAN.py:101,131); pde + norm
            # both in-kernel, grid-sized u forward only for orth (n > 0)
            core, aux = u_pde_fn(u_params["net"], u_params["E"], v_params,
                                 x_grid, wv_const, dwv_const, V=V)
            loss_pde, norm = aux["pde_loss"], aux["norm"]
            if n > 0 and w["orth"] > 0:
                u = u_model.apply_batch(u_params["net"], x_grid)
                orth = orthogonal_projection(u, lower, volume, eps=0.0)
            else:
                orth = jnp.asarray(0.0)
            data = data_mse(
                u_model.apply_batch(u_params["net"], x_data), u_data)
            bc = jnp.mean(u_model.apply_batch(u_params["net"], x_bc) ** 2)
            total = (core + w["orth"] * orth + w["data"] * data
                     + w["bc"] * bc)
            return total, {
                "pde": loss_pde, "norm": norm, "data": data, "bc": bc,
                "orth": orth, "E": u_params["E"],
            }
        loss_pde, u = wan_pde(u_params, v_params)
        pde_w = w["pde"] * loss_pde
        norm = norm_integral(u, volume)
        data = data_mse(u_model.apply_batch(u_params["net"], x_data), u_data)
        bc = jnp.mean(u_model.apply_batch(u_params["net"], x_bc) ** 2)
        orth = (
            orthogonal_projection(u, lower, volume, eps=0.0)
            if n > 0
            else jnp.asarray(0.0)
        )
        total = (
            pde_w + w["norm"] * norm + w["orth"] * orth
            + w["data"] * data + w["bc"] * bc
        )
        return total, {
            "pde": loss_pde, "norm": norm, "data": data, "bc": bc,
            "orth": orth, "E": u_params["E"],
        }

    def eval_fn(u_params, key):
        u = u_model.apply_batch(u_params["net"], x_grid)
        return sign_aware_mse(u, u_exact)

    u_opt, v_opt = make_wan_optimizers(
        cfg.lr, v_lr=cfg.v_lr, epochs=cfg.epochs, v_steps=cfg.v_steps,
        schedule=cfg.lr_schedule, decay_steps=cfg.lr_decay_steps,
    )
    result = fit_wan(
        u_loss_fn, v_loss_fn, eval_fn, u_params, v_params,
        epochs=cfg.epochs, v_steps=cfg.v_steps,
        u_optimizer=u_opt, v_optimizer=v_opt,
        key=jax.random.fold_in(key, 2), chunk=cfg.chunk,
        minimax=cfg.minimax, u_ema=cfg.u_ema,
        v_context_fn=v_context_fn,
    )
    # Rayleigh-quotient energy of the best iterate: <1/2 u'^2 + V u^2> /
    # <u^2>.  The weak-form E parameter is only first-order accurate in the
    # u-error (measured: systematically ~1-3% HIGH across n); the Rayleigh
    # quotient is variational — second-order accurate — so it is the better
    # final estimate.  (The reference's DRM "tracks" E the same way,
    # KH_1D.py:393-399; here we apply it to the WAN best iterate.)
    u_b, gu_b = u_model.value_and_grad(result.best_params["net"], x_grid)
    E_rayleigh = float(
        jnp.mean(0.5 * jnp.sum(gu_b**2, -1) + V * u_b**2)
        / (jnp.mean(u_b**2) + 1e-12)
    )
    return {
        "config": dataclasses.asdict(cfg),
        "model": u_model,
        "v_model": v_model,
        "result": result,
        "history": result.history,
        "L2_error": float(result.best_metric),
        "min_epoch": result.best_epoch,
        "E_est": float(result.best_params["E"]),
        "E_rayleigh": E_rayleigh,
        "E_exact": phys.energy_1d(n),
        "weights": w,
    }
