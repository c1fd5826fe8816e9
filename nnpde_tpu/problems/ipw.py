"""Infinite potential well presets (1D PINN/DRM, 1D WAN, WAN-FN ablation).

Reproduces:
* ``train_seperate`` (PINN/DRM, 4 techniques) —
  ``/root/reference/Schrodinger_Equations/Infinite_Potential_Well/IPW_1D_PINN_DRM.py:105-248``
* ``train_seperate`` (WAN, 3 techniques) — ``IPW_1D_WAN.py:134-333``
* the WAN-FN depth/width ablation variant — ``IPW_1D_WAN_FN.py:137-322``
  (forced-node trial on u, weights data=0 pde=10 norm=1000).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..losses.zoo import (
    data_mse,
    drm_rayleigh_unscaled,
    norm_integral,
    norm_pointwise,
    orthogonal_projection,
    pinn_helmholtz,
    wan_pde_loss,
    wan_weak_residual,
)
from ..models import NetSpec, SolutionModel, factor_for_technique
from ..ops import bump_w
from ..ops.quadrature import sign_aware_mse
from ..pde import ipw as phys
from ..sampling import first_fraction_every_kth, linspace_grid
from ..train import fit, fit_wan, lbfgs_polish, make_wan_optimizers


@dataclasses.dataclass
class IPW1DConfig:
    n: int = 1
    L: float = 2.0
    epochs: int = 3000
    lr: float = 1e-3
    layers: Tuple[int, ...] = (1, 50, 50, 50, 1)
    LBFGS: bool = False
    method: str = "DRM"               # PINN | DRM  (WAN has its own config)
    technique: str = "FN"             # BC | FBC | FN | OG
    grid_n: int = 1000
    data_fraction: float = 0.25
    data_stride: int = 10
    seed: int = 0
    chunk: int = 1000
    # 'xla' | 'pallas' | 'pallas-fused' (PINN only; kernels/fused_step.py)
    jet_impl: str = "xla"


def _make_model(layers, technique, n, L) -> SolutionModel:
    factor = factor_for_technique(
        technique,
        dim=1,
        kind="box",
        L=L,
        nodes_per_dim=[phys.nodes(n, L)] if technique == "FN" else None,
    )
    return SolutionModel(NetSpec(tuple(layers), activation="tanh"), factor)


def _lower_states(n: int, x, L: float):
    """(N, n-1) matrix of exact lower eigenstates (for the OG penalty)."""
    if n <= 1:
        return jnp.zeros((x.shape[0], 0), x.dtype)
    return jnp.stack([phys.psi_1d(k, x, L) for k in range(1, n)], axis=1)


def train_ipw_1d(cfg: IPW1DConfig) -> Dict:
    """PINN/DRM on the 1D well — IPW_1D_PINN_DRM.py:105-248 semantics."""
    if cfg.method not in ("PINN", "DRM"):
        raise ValueError("method must be 'PINN' or 'DRM'")
    if cfg.jet_impl not in ("xla", "pallas", "pallas-fused"):
        raise ValueError("jet_impl must be 'xla', 'pallas' or 'pallas-fused'")
    if cfg.technique not in ("BC", "FBC", "FN", "OG"):
        raise ValueError(
            f"Unknown technique: {cfg.technique}. Choose 'BC', 'FBC', 'FN', or 'OG'."
        )
    n, L = cfg.n, cfg.L
    model = _make_model(cfg.layers, cfg.technique, n, L)
    key = jax.random.PRNGKey(cfg.seed)
    params = model.init(key)

    x_grid = linspace_grid(cfg.grid_n, 0.0, L)
    x_flat = x_grid[:, 0]
    u_exact = phys.psi_1d(n, x_flat, L)
    idx = first_fraction_every_kth(cfg.grid_n, cfg.data_fraction, cfg.data_stride)
    x_data, u_data = x_grid[idx], u_exact[idx]
    x_bc = jnp.array([[0.0], [L]])
    lower = _lower_states(n, x_flat, L)
    k_squared = (n * jnp.pi / L) ** 2      # 2 m E / hbar^2

    hard_bc = cfg.technique in ("FBC", "FN", "OG")
    w = {
        "data": 10000.0,
        "bc": 0.0 if hard_bc else 1000.0,
        "orth": 1000.0 if cfg.technique == "OG" else 0.0,
        "pde": 1.0 if cfg.method == "PINN" else 0.0,
        "drm": 10.0 if cfg.method == "DRM" else 0.0,
        "norm": 1.0 if cfg.method == "PINN" else 0.0,
    }

    # fused eigen-DRM: the two-pass Rayleigh custom_vjp
    # (kernels/fused_quotient.py); weight 2x converts the kernel's
    # 1/2|grad|^2 numerator to the IPW convention (IPW_1D_PINN_DRM.py:85-90)
    fused_drm = cfg.method == "DRM" and cfg.jet_impl == "pallas-fused"
    if fused_drm:
        from ..kernels import make_fused_rayleigh, quotient_coefficients
        from ._fused_wan import factor_jet_or_one

        ray_loss = make_fused_rayleigh(
            model.spec.activation, weight=2.0 * w["drm"])
        coef_ray = quotient_coefficients(factor_jet_or_one(model, x_grid))

    def loss_terms(params):
        if fused_drm:
            total_ray, aux_ray = ray_loss(params, x_grid, coef_ray)
            u = model.apply_batch(params, x_grid)
            terms = {
                "data": data_mse(model.apply_batch(params, x_data), u_data),
                "norm": norm_pointwise(u),
                "pde": jnp.asarray(0.0),
                "drm": 2.0 * aux_ray["rayleigh"],
                "bc": jnp.mean(model.apply_batch(params, x_bc) ** 2),
                "orth": orthogonal_projection(u, lower, L),
            }
            total = total_ray + sum(
                w[k] * terms[k] for k in w if k not in ("drm", "pde"))
            return total, terms
        # compute only the active method's operator: the fused jet (with its
        # backward) for PINN, the cheaper value+grad for DRM
        if w["pde"] > 0:
            jet = model.fields(
                params, x_grid,
                impl="pallas" if cfg.jet_impl == "pallas" else "xla",
            )
            u, g = jet.value, jet.grad
            pde = pinn_helmholtz(u, jet.lap, k_squared)
            drm = jnp.asarray(0.0)
        else:
            u, g = model.value_and_grad(params, x_grid)
            pde = jnp.asarray(0.0)
            drm = drm_rayleigh_unscaled(u, g)
        terms = {
            "data": data_mse(model.apply_batch(params, x_data), u_data),
            "norm": norm_pointwise(u),
            "pde": pde,
            "drm": drm,
            "bc": jnp.mean(model.apply_batch(params, x_bc) ** 2),
            "orth": orthogonal_projection(u, lower, L),
        }
        total = sum(w[k] * terms[k] for k in w)
        return total, terms

    def loss_fn(params, key):
        return loss_terms(params)

    def eval_fn(params, key):
        """Full-grid plain MSE (reference is not sign-aware here,
        IPW_1D_PINN_DRM.py:173-177)."""
        u = model.apply_batch(params, x_grid)
        return jnp.mean((u - u_exact) ** 2)

    if cfg.jet_impl == "pallas-fused" and cfg.method == "PINN":
        # one-pass fused loss+grad on r = lap u + k^2 u (u = B*net, or the
        # raw net for technique 'BC'); aux terms ride plain autodiff
        # (DRM rides the fused Rayleigh custom_vjp through loss_terms)
        from ..kernels import fused_linear_residual, residual_coefficients
        from ..ops.fwdlap import constant_jet

        fj = (model.factor.jet(x_grid) if model.factor is not None
              else constant_jet(jnp.ones(x_grid.shape[0], x_grid.dtype), 1))
        coef_fused = residual_coefficients(fj, a0=1.0, c0=k_squared)

        def lag_fn(params, key):
            pde, _, g_pde = fused_linear_residual(
                params, x_grid, coef_fused, model.spec.activation
            )

            def aux_loss(p):
                u = model.apply_batch(p, x_grid)
                terms = {
                    "data": data_mse(model.apply_batch(p, x_data), u_data),
                    "norm": norm_pointwise(u),
                    "bc": jnp.mean(model.apply_batch(p, x_bc) ** 2),
                    "orth": orthogonal_projection(u, lower, L),
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
    if cfg.LBFGS:
        polished, _ = lbfgs_polish(
            lambda p: loss_terms(p)[0], result.params, max_iter=200
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


# ---------------------------------------------------------------------- WAN
@dataclasses.dataclass
class IPW1DWanConfig:
    n: int = 1
    L: float = 2.0
    epochs: int = 3000
    lr: float = 1e-3
    layers: Tuple[int, ...] = (1, 50, 50, 50, 1)
    v_layers: Tuple[int, ...] = (1, 20, 20, 20, 1)
    technique: str = "FBC"            # BC | FBC | OG | FN (FN = the WAN_FN script)
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
    fn_variant: bool = False          # True -> IPW_1D_WAN_FN weight table
    # 'pallas-fused': two-pass fused u/v objectives
    # (kernels/fused_quotient.py) — weak form + masses in-kernel
    jet_impl: str = "xla"


def train_ipw_1d_wan(cfg: IPW1DWanConfig) -> Dict:
    n, L = cfg.n, cfg.L
    fn_mode = cfg.fn_variant or cfg.technique == "FN"
    u_technique = "FN" if fn_mode else cfg.technique
    u_model = _make_model(cfg.layers, u_technique, n, L)
    v_model = SolutionModel(NetSpec(tuple(cfg.v_layers), activation="tanh"))

    key = jax.random.PRNGKey(cfg.seed)
    u_params = u_model.init(key)
    v_params = v_model.init(jax.random.fold_in(key, 1))

    x_grid = linspace_grid(cfg.grid_n, 0.0, L)
    x_flat = x_grid[:, 0]
    u_exact = phys.psi_1d(n, x_flat, L)
    idx = first_fraction_every_kth(cfg.grid_n, cfg.data_fraction, cfg.data_stride)
    x_data, u_data = x_grid[idx], u_exact[idx]
    x_bc = jnp.array([[0.0], [L]])
    lower = _lower_states(n, x_flat, L)
    E = phys.energy_1d(n, L)

    if fn_mode:
        # IPW_1D_WAN_FN.py:159-163
        w = {"data": 0.0, "pde": 10.0, "norm": 1000.0, "bc": 0.0, "orth": 0.0}
    else:
        # IPW_1D_WAN.py:158-165
        w = {
            "data": 10000.0, "pde": 1.0, "norm": 1.0, "bc": 1000.0,
            "orth": 10000.0 if cfg.technique == "OG" else 0.0,
        }

    # bump w and its derivative are fixed on the static grid — precompute
    wv_const, dwv_const = bump_w(x_grid, 0.0, L)

    fused = cfg.jet_impl == "pallas-fused"
    v_context_fn = None
    if fused:
        from ._fused_wan import make_fused_wan_pair

        # norm rides the in-kernel mass lane; the full-grid u forward then
        # only remains for orth (n > 1)
        pair = make_fused_wan_pair(
            u_model, v_model, w_pde=w["pde"], w_norm=w["norm"], vol=L)
        u_pde_fn = pair.u_pde_fn
        E_fix = jnp.asarray(E, jnp.float32)

        # fixed grid: the critic coefficient stream (u-jet + weak-form
        # algebra) is frozen across the inner critic steps — build once
        # per epoch via fit_wan's v_context_fn
        def v_context_fn(u_params, key):
            return pair.v_coef_fn(u_params, E_fix, x_grid,
                                  wv_const, dwv_const)
    else:
        # XLA path: u's (value, grad) at the fixed grid is invariant
        # across the inner critic steps (u frozen; XLA does not hoist it
        # out of the fori_loop body) — compute once per epoch
        def v_context_fn(u_params, key):
            return u_model.value_and_grad(u_params, x_grid)

    def wan_pde(u_params, v_params, ugu=None):
        u, gu = (ugu if ugu is not None
                 else u_model.value_and_grad(u_params, x_grid))
        v, gv = v_model.value_and_grad(v_params, x_grid)
        phi = wv_const * v
        gphi = dwv_const * v[:, None] + wv_const[:, None] * gv
        weak = wan_weak_residual(gu, phi, gphi, u=u, E=E, prefactor=0.5)
        phi_norm = jnp.mean(phi**2)
        loss_pde = wan_pde_loss(weak, phi_norm)
        return loss_pde, u

    def v_loss_fn(v_params, ctx, key):
        # ctx = the per-epoch critic coefficient stream (fused) or u's
        # precomputed (value, grad) at the fixed grid (XLA path)
        if fused:
            lv, _ = pair.v_loss_from_coef(v_params, x_grid, ctx)
            return lv
        loss_pde, _ = wan_pde(None, v_params, ugu=ctx)
        return -jnp.log(loss_pde + 1e-8)

    def u_loss_fn(u_params, v_params, key):
        if fused:
            # pde + norm both in-kernel (w['pde']/w['norm']-scaled); the
            # grid-sized u forward survives only for the orth projection
            core, aux = u_pde_fn(u_params, E_fix, v_params, x_grid,
                                 wv_const, dwv_const)
            loss_pde, norm = aux["pde_loss"], aux["norm"]
            if n > 1 and w["orth"] > 0:
                u = u_model.apply_batch(u_params, x_grid)
                orth = orthogonal_projection(u, lower, L, eps=0.0)
            else:
                orth = jnp.asarray(0.0)
            data = data_mse(u_model.apply_batch(u_params, x_data), u_data)
            bc = jnp.mean(u_model.apply_batch(u_params, x_bc) ** 2)
            total = (core + w["orth"] * orth + w["data"] * data
                     + w["bc"] * bc)
            return total, {"pde": loss_pde, "norm": norm, "data": data,
                           "bc": bc, "orth": orth}
        loss_pde, u = wan_pde(u_params, v_params)
        norm = norm_integral(u, L)
        data = data_mse(u_model.apply_batch(u_params, x_data), u_data)
        bc = jnp.mean(u_model.apply_batch(u_params, x_bc) ** 2)
        orth = orthogonal_projection(u, lower, L, eps=0.0) if n > 1 else jnp.asarray(0.0)
        total = (
            w["pde"] * loss_pde + w["norm"] * norm + w["orth"] * orth
            + w["data"] * data + w["bc"] * bc
        )
        return total, {"pde": loss_pde, "norm": norm, "data": data, "bc": bc,
                       "orth": orth}

    def eval_fn(u_params, key):
        u = u_model.apply_batch(u_params, x_grid)
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
    return {
        "config": dataclasses.asdict(cfg),
        "model": u_model,
        "v_model": v_model,
        "result": result,
        "history": result.history,
        "L2_error": float(result.best_metric),
        "min_epoch": result.best_epoch,
        "weights": w,
    }
