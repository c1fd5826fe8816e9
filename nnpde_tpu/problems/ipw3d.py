"""3D infinite potential well — a scale superset beyond the reference.

The reference stops at 2D eigenproblems (IPW_2D.py); its 200x200 meshgrid
idiom cannot reach 3D (200^3 = 8M grid points through d+1 autograd graphs).
This preset solves psi_{nx,ny,nz} on [0, L]^3 the TPU way instead:

* SAMPLED collocation (uniform or scrambled Sobol, optionally resampled
  every epoch) at 10^5-10^6 points — the Monte-Carlo residual the Poisson
  preset already uses at d=5 (problems/poisson.py);
* the same separable trial factors one dimension up (FBC box polynomial,
  FN nodal planes per axis — models/trial.py is dim-generic);
* the one-pass fused loss+grad kernel (`jet_impl='pallas-fused'`,
  kernels/fused_step.py) for the Helmholtz residual lap u + k^2 u —
  at d=3 the packed jet-forward kernel also still applies (d + 2 <= 8);
* supervised data on a coarse first-octant lattice (the 3D analogue of
  IPW_2D.py:144-152's quadrant rule) pinning sign and amplitude.

Ground truth is analytic (product of 1D eigenstates, pde/ipw.py:psi_3d).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..losses.zoo import data_mse, drm_rayleigh_unscaled, pinn_helmholtz
from ..models import NetSpec, SolutionModel, factor_for_technique
from .. import runtime
from ..pde import ipw as phys
from ..pde.domain import Box
from ..sampling import shifted_qmc, sobol_unit, uniform_box
from ..train import fit, make_optimizer


@dataclasses.dataclass
class IPW3DConfig:
    nx: int = 1
    ny: int = 1
    nz: int = 1
    L: float = 2.0
    method: str = "PINN"               # PINN | DRM
    technique: str = "FN"              # FBC | FN
    layers: Tuple[int, ...] = (3, 64, 64, 64, 64, 1)
    n_interior: int = 131072
    data_grid_n: int = 16              # coarse first-octant supervision
    epochs: int = 5000
    lr: float = 1e-3
    lr_schedule: str = "cosine"
    resample: bool = True
    sampler: str = "sobol"             # uniform | sobol
    jet_impl: str = "xla"              # xla | pallas | pallas-fused
    weights: Optional[Dict[str, float]] = None
    n_eval: int = 65536
    seed: int = 0
    chunk: int = 500


def train_ipw_3d(cfg: IPW3DConfig) -> Dict:
    if cfg.method not in ("PINN", "DRM"):
        raise ValueError("method must be 'PINN' or 'DRM'")
    if cfg.technique not in ("FBC", "FN"):
        raise ValueError(f"Unknown technique: {cfg.technique}")
    if cfg.jet_impl not in ("xla", "pallas", "pallas-fused"):
        raise ValueError("jet_impl must be 'xla', 'pallas' or 'pallas-fused'")
    chunk = (min(cfg.chunk, runtime.pallas_chunk_cap())
             if cfg.jet_impl.startswith("pallas") else cfg.chunk)
    nq, L = (cfg.nx, cfg.ny, cfg.nz), cfg.L
    factor = factor_for_technique(
        cfg.technique,
        dim=3,
        kind="box",
        L=L,
        nodes_per_dim=[phys.nodes(n, L) for n in nq]
        if cfg.technique == "FN"
        else None,
    )
    model = SolutionModel(NetSpec(tuple(cfg.layers), activation="sin"), factor)
    key = jax.random.PRNGKey(cfg.seed)
    params = model.init(key)
    box = Box.cube(3, 0.0, L)

    def psi(X):
        return phys.psi_3d(*nq, X[:, 0], X[:, 1], X[:, 2], L)

    E = phys.energy_3d(*nq, L)
    k_squared = 2.0 * E

    if cfg.sampler == "sobol":
        U_base = sobol_unit(cfg.seed, cfg.n_interior, 3)

    def draw(key_d):
        if cfg.sampler == "sobol":
            # per-epoch randomised QMC (Cranley-Patterson; samplers.py)
            return shifted_qmc(U_base, key_d, box)
        return uniform_box(key_d, cfg.n_interior, box)

    X_fix = draw(jax.random.fold_in(key, 7))

    # first-octant coarse lattice supervision (IPW_2D.py:144-152 in 3D)
    g = jnp.linspace(0.0, L, cfg.data_grid_n)
    half = cfg.data_grid_n // 2
    gx, gy, gz = jnp.meshgrid(g[:half], g[:half], g[:half], indexing="ij")
    X_data = jnp.stack([gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)], -1)
    u_data = psi(X_data)

    w = {"pde": 10.0 if cfg.method == "PINN" else 0.0,
         "drm": 100.0 if cfg.method == "DRM" else 0.0,
         "data": 1e4}
    if cfg.weights:
        w.update(cfg.weights)

    # fused eigen-DRM (two-pass Rayleigh; weight 2x = the unscaled IPW
    # convention), resample-aware — the coefficient stream is rebuilt per
    # step from the factor jet when QMC resampling is on
    fused_drm = cfg.method == "DRM" and cfg.jet_impl == "pallas-fused"
    if fused_drm:
        from ..kernels import make_fused_rayleigh, quotient_coefficients

        ray_loss = make_fused_rayleigh(
            model.spec.activation, weight=2.0 * w["drm"], den_eps=1e-8)
        coef_ray_fix = (None if cfg.resample
                        else quotient_coefficients(model.factor.jet(X_fix)))

    def loss_fn(params, key_e):
        X_cur = (draw(jax.random.fold_in(key_e, 3)) if cfg.resample
                 else X_fix)
        if fused_drm:
            coef_q = (quotient_coefficients(model.factor.jet(X_cur))
                      if cfg.resample else coef_ray_fix)
            total_drm, aux_ray = ray_loss(params, X_cur, coef_q)
            data = data_mse(model.apply_batch(params, X_data), u_data)
            total = total_drm + w["data"] * data
            return total, {"pde": jnp.asarray(0.0),
                           "drm": 2.0 * aux_ray["rayleigh"], "data": data}
        if cfg.method == "PINN":
            jet = model.fields(
                params, X_cur,
                impl="pallas" if cfg.jet_impl == "pallas" else "xla",
            )
            pde = pinn_helmholtz(jet.value, jet.lap, k_squared)
            drm = jnp.asarray(0.0)
        else:
            u, grad = model.value_and_grad(params, X_cur)
            pde = jnp.asarray(0.0)
            drm = drm_rayleigh_unscaled(u, grad, den_eps=1e-8)
        data = data_mse(model.apply_batch(params, X_data), u_data)
        total = w["pde"] * pde + w["drm"] * drm + w["data"] * data
        return total, {"pde": pde, "drm": drm, "data": data}

    # fixed eval set, plain MSE (sign pinned by the data term)
    X_ev = uniform_box(jax.random.fold_in(key, 11), cfg.n_eval, box)
    u_ev = psi(X_ev)

    def eval_fn(params, key_e):
        u = model.apply_batch(params, X_ev)
        return jnp.mean((u - u_ev) ** 2)

    if cfg.jet_impl == "pallas-fused" and cfg.method == "PINN":
        from ..kernels import fused_linear_residual, residual_coefficients

        coef_fix = (None if cfg.resample
                    else residual_coefficients(
                        model.factor.jet(X_fix), a0=1.0, c0=k_squared))

        def lag_fn(params, key_e):
            if cfg.resample:
                X_cur = draw(jax.random.fold_in(key_e, 3))
                coef = residual_coefficients(
                    model.factor.jet(X_cur), a0=1.0, c0=k_squared
                )
            else:
                X_cur, coef = X_fix, coef_fix
            pde, _, g_pde = fused_linear_residual(
                params, X_cur, coef, model.spec.activation
            )

            def aux_loss(p):
                return w["data"] * data_mse(
                    model.apply_batch(p, X_data), u_data
                )

            data_tot, g_aux = jax.value_and_grad(aux_loss)(params)
            total = w["pde"] * pde + data_tot
            grads = jax.tree_util.tree_map(
                lambda a, b: w["pde"] * a + b, g_pde, g_aux
            )
            metrics = {"pde": pde, "drm": jnp.asarray(0.0),
                       "data": data_tot / w["data"]}
            return (total, metrics), grads

        fit_kwargs = {"loss_and_grad_fn": lag_fn}
    else:
        fit_kwargs = {}

    optimizer = make_optimizer(cfg.lr, schedule=cfg.lr_schedule,
                               total_steps=cfg.epochs)
    result = fit(
        loss_fn, eval_fn, params,
        epochs=cfg.epochs, optimizer=optimizer,
        key=jax.random.fold_in(key, 1), chunk=chunk,
        **fit_kwargs,
    )

    rms_exact = float(jnp.sqrt(jnp.mean(u_ev**2)))
    return {
        "config": dataclasses.asdict(cfg),
        "model": model,
        "result": result,
        "history": result.history,
        "L2_error": float(result.best_metric),
        "rel_l2": float(result.best_metric) ** 0.5 / rms_exact,
        "min_epoch": result.best_epoch,
        "E_exact": E,
        "weights": w,
    }
