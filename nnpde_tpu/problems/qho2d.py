"""2D quantum harmonic oscillator preset (PINN / DRM / WAN in one trainer).

Reproduces ``train_pinn_seperate`` of
``/root/reference/Schrodinger_Equations/Quantum_Harmonic_Oscillator/QHO_2D.py:242-555``
and the paper variant ``QHO_2D_Energy.py:242-581``:

* 200x200 meshgrid on [-L, L]^2, lower-left-quadrant supervised data;
* techniques FBC/OG (2D exp window) and FN (window x Hermite nodal lines,
  QHO_2D.py:145-170);
* WAN branch with 5 inner critic steps, FBC critic net, 2D bump test
  function (QHO_2D.py:172-225, 343-361);
* parity (x -> -x, sign (-1)^n) and symmetry (x <-> y swap when nx == ny)
  losses — unweighted in QHO_2D.py:413, weighted 1000 in the Energy variant
  (QHO_2D_Energy.py:311-313);
* ``trainable_energy`` puts E in the parameter pytree for PINN
  (QHO_2D_Energy.py:287-291,382) — the learned eigenvalue is reported;
* sign-aware L2 tracking (QHO_2D.py:417-423).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..losses.zoo import (
    data_mse,
    drm_rayleigh,
    norm_integral,
    orthogonal_projection,
    pinn_schrodinger,
    reflection_mse,
    wan_pde_loss,
    wan_weak_residual,
)
from ..models import NetSpec, SolutionModel, factor_for_technique
from ..ops import bump_w
from ..ops.quadrature import sign_aware_mse
from ..pde import qho as phys
from ..sampling import meshgrid_2d
from ..train import fit, fit_wan, lbfgs_polish, make_optimizer, make_wan_optimizers


@dataclasses.dataclass
class QHO2DConfig:
    nx: int = 0
    ny: int = 0
    L: float = 6.0
    epochs: int = 10000
    lr: float = 1e-3
    LBFGS: bool = False
    method: str = "PINN"               # PINN | DRM | WAN
    technique: str = "FBC"             # FBC | FN | OG
    layers: Tuple[int, ...] = (2, 50, 50, 50, 50, 1)
    v_layers: Tuple[int, ...] = (2, 20, 20, 20, 1)
    v_steps: int = 5
    grid_n: int = 200
    data_grid_n: int = 50
    n_boundary: int = 200
    trainable_energy: bool = False     # QHO_2D_Energy.py variant
    # separate Adam lr for the E leaf (optax.multi_transform).  The
    # reference shares one lr between net and E (QHO_2D_Energy.py:295) and
    # the eigenvalue drifts ~11% over long runs; a 10-100x smaller E lr
    # keeps it pinned.  None = shared lr (reference behaviour).
    energy_lr: Optional[float] = None
    energy_variant: bool = False       # use the Energy-script weight table
    # WAN saddle-point knobs (see problems/ipw2d.py / train/trainer.py):
    minimax: str = "alternating"       # alternating | extragradient | optimistic
    v_lr: Optional[float] = None       # two-timescale critic lr
    u_ema: float = 0.0                 # EMA-averaged primal iterate
    seed: int = 0
    lr_schedule: str = "constant"   # constant | cosine | exponential
    chunk: int = 500
    weights: Optional[Dict[str, float]] = None   # override the weight table
    # 'xla' | 'pallas' | 'pallas-fused' (PINN only): 'pallas-fused' runs the
    # one-pass fused loss+grad kernel (kernels/fused_step.py) on the strong
    # residual -1/2 lap u + (V - E) u; with trainable_energy the dL/dE seed
    # comes from the kernel's extra-output lane (sum r*u).
    jet_impl: str = "xla"


def _factor(technique: str, nx: int, ny: int, L: float):
    return factor_for_technique(
        technique,
        dim=2,
        kind="window",
        L=L,
        nodes_per_dim=[phys.nodes(nx), phys.nodes(ny)]
        if technique == "FN"
        else None,
    )


def _lower_states_2d(nx: int, ny: int, X):
    """(i, j) with i + j + 1 < nx + ny + 1 (QHO_2D.py:227-239).

    Faithful to the reference INCLUDING its loop bound max(nx,ny)+1: lower
    states with one index above max(nx,ny) (e.g. (3,0) below (2,2)) are not
    penalised by the reference either."""
    cols = []
    for i in range(max(nx, ny) + 1):
        for j in range(max(nx, ny) + 1):
            if i + j + 1 < nx + ny + 1:
                cols.append(phys.psi_2d(i, j, X[:, 0], X[:, 1]))
    if not cols:
        return jnp.zeros((X.shape[0], 0), X.dtype)
    return jnp.stack(cols, axis=1)


def train_qho_2d(cfg: QHO2DConfig) -> Dict:
    if cfg.method not in ("PINN", "DRM", "WAN"):
        raise ValueError("method must be 'PINN', 'DRM' or 'WAN'")
    if cfg.technique not in ("FBC", "FN", "OG"):
        raise ValueError(f"Unknown technique: {cfg.technique}")
    if cfg.trainable_energy and cfg.method != "PINN":
        raise ValueError(
            "trainable_energy requires method='PINN' (QHO_2D_Energy.py "
            "trains E through the strong residual) — a DRM/WAN run would "
            "silently train with the fixed exact E"
        )
    if cfg.jet_impl not in ("xla", "pallas", "pallas-fused"):
        raise ValueError("jet_impl must be 'xla', 'pallas' or 'pallas-fused'")
    nx, ny, L = cfg.nx, cfg.ny, cfg.L

    u_model = SolutionModel(
        NetSpec(tuple(cfg.layers), activation="sin"),
        _factor(cfg.technique, nx, ny, L),
    )
    key = jax.random.PRNGKey(cfg.seed)
    net_params = u_model.init(key)

    X = meshgrid_2d(cfg.grid_n, -L, L)
    u_exact = phys.psi_2d(nx, ny, X[:, 0], X[:, 1])
    V = phys.potential_2d(X[:, 0], X[:, 1])
    E_exact = phys.energy_2d(nx, ny)

    Xd_full = meshgrid_2d(cfg.data_grid_n, -L, L)
    half = cfg.data_grid_n // 2
    mask = (
        jnp.arange(cfg.data_grid_n)[:, None] < half
    ) & (jnp.arange(cfg.data_grid_n)[None, :] < half)
    idx = jnp.nonzero(mask.reshape(-1))[0]
    X_data = Xd_full[idx]
    u_data = phys.psi_2d(nx, ny, X_data[:, 0], X_data[:, 1])

    tb = jnp.linspace(-L, L, cfg.n_boundary)
    X_bc = jnp.concatenate([
        jnp.stack([tb, jnp.full_like(tb, -L)], 1),
        jnp.stack([tb, jnp.full_like(tb, L)], 1),
        jnp.stack([jnp.full_like(tb, -L), tb], 1),
        jnp.stack([jnp.full_like(tb, L), tb], 1),
    ])

    lower = _lower_states_2d(nx, ny, X)

    # weight tables: QHO_2D.py:294-307 vs QHO_2D_Energy.py:294-313
    if cfg.method == "WAN":
        w = {
            "data": 10000.0, "pde": 10.0, "drm": 0.0, "norm": 1000.0,
            "orth": (10000.0 if (cfg.energy_variant and cfg.technique == "OG")
                     else 0.0),
            "bc": (0.0 if cfg.energy_variant
                   else (10000.0 if cfg.technique == "OG" else 0.0)),
        }
    else:
        w = {
            "data": 10000.0,
            "pde": 100.0 if cfg.method == "PINN" else 0.0,
            "drm": 0.0 if cfg.method == "PINN" else 100.0,
            "orth": 0.0 if cfg.method == "PINN" else 10000.0,
            "norm": 0.0,
            "bc": (0.0 if cfg.energy_variant
                   else (10000.0 if cfg.technique == "OG" else 0.0)),
        }
    w["parity"] = 1000.0 if cfg.energy_variant else 1.0
    w["symmetry"] = 1000.0 if cfg.energy_variant else 1.0
    if cfg.weights:
        w.update(cfg.weights)

    sign_x = float((-1) ** nx)
    sign_y = float((-1) ** ny)
    X_swap = X[:, ::-1]
    X_px = jnp.stack([-X[:, 0], X[:, 1]], 1)
    X_py = jnp.stack([X[:, 0], -X[:, 1]], 1)

    def shared_terms(net_p, u):
        # one batched forward over the reflected point sets — one big MXU
        # matmul instead of three grid-sized dispatches
        refl = ([X_swap] if nx == ny else []) + [X_px, X_py]
        u_refl = u_model.apply_batch(net_p, jnp.concatenate(refl, axis=0))
        parts = jnp.split(u_refl, len(refl))
        u_sym = parts[0] if nx == ny else None
        u_px, u_py = parts[-2], parts[-1]
        terms = {
            "data": data_mse(u_model.apply_batch(net_p, X_data), u_data),
            "symmetry": reflection_mse(u, u_sym)
            if nx == ny
            else jnp.asarray(0.0),
            "parity": (
                reflection_mse(u, u_px, sign_x)
                + reflection_mse(u, u_py, sign_y)
            ),
            "orth": orthogonal_projection(u, lower, 4.0 * L * L)
            if w["orth"] > 0
            else jnp.asarray(0.0),
            "bc": jnp.mean(u_model.apply_batch(net_p, X_bc) ** 2) * 4.0
            if w["bc"] > 0
            else jnp.asarray(0.0),
        }
        return terms

    def eval_fn_net(net_p):
        u = u_model.apply_batch(net_p, X)
        return sign_aware_mse(u, u_exact)

    use_E_param = cfg.trainable_energy and cfg.method == "PINN"

    if cfg.method in ("PINN", "DRM"):
        params = {"net": net_params}
        if use_E_param:
            params["E"] = jnp.asarray(E_exact)

        # fused eigen-DRM: two-pass Rayleigh with the 2D oscillator
        # potential (QHO_2D.py:380-384)
        fused_drm = cfg.method == "DRM" and cfg.jet_impl == "pallas-fused"
        if fused_drm:
            from ..kernels import make_fused_rayleigh, quotient_coefficients

            ray_loss = make_fused_rayleigh(
                u_model.spec.activation, weight=1.0, den_eps=1e-8)
            coef_ray = quotient_coefficients(u_model.factor.jet(X), V=V)

        def loss_fn(params, key):
            net_p = params["net"]
            if fused_drm:
                drm, aux_ray = ray_loss(net_p, X, coef_ray)
                u = u_model.apply_batch(net_p, X)
                terms = {"pde": jnp.asarray(0.0),
                         "drm": aux_ray["rayleigh"],
                         "norm": jnp.asarray(0.0)}
                terms.update(shared_terms(net_p, u))
                total = w["drm"] * drm + sum(
                    w[k] * terms[k] for k in w if k not in ("drm", "pde"))
                return total, dict(terms)
            if cfg.method == "PINN":
                jet = u_model.fields(
                    net_p, X,
                    impl="pallas" if cfg.jet_impl == "pallas" else "xla",
                )
                u = jet.value
                E_use = params["E"] if use_E_param else E_exact
                pde = pinn_schrodinger(u, jet.lap, V, E_use)
                drm = jnp.asarray(0.0)
            else:
                u, g = u_model.value_and_grad(net_p, X)
                pde = jnp.asarray(0.0)
                drm = drm_rayleigh(u, g, V, den_eps=1e-8)
            terms = {"pde": pde, "drm": drm, "norm": jnp.asarray(0.0)}
            terms.update(shared_terms(net_p, u))
            total = sum(w[k] * terms[k] for k in w)
            metrics = dict(terms)
            if use_E_param:
                metrics["E"] = params["E"]
            return total, metrics

        def eval_fn(params, key):
            return eval_fn_net(params["net"])

        if cfg.jet_impl == "pallas-fused" and cfg.method == "PINN":
            # One-pass fused loss+grad kernel on the strong residual
            # r = -1/2 lap u + (V - E) u with u = B*net — coefficients from
            # the (fixed) window-factor jet, rebuilt per step only through
            # the (possibly trainable) E scalar.  Replaces QHO_2D.py:363-378
            # / QHO_2D_Energy.py:382's per-direction autograd Hessians.
            from ..kernels import fused_linear_residual, residual_coefficients

            fj = u_model.factor.jet(X)

            def lag_fn(params, key):
                E_use = params["E"] if use_E_param else E_exact
                coef = residual_coefficients(
                    fj, a0=-0.5, c0=V - E_use, e_lane=use_E_param
                )
                pde, kaux, g_pde = fused_linear_residual(
                    params["net"], X, coef, u_model.spec.activation
                )

                def aux_loss(p):
                    u = u_model.apply_batch(p["net"], X)
                    terms = shared_terms(p["net"], u)
                    return sum(w[k] * terms[k] for k in terms), terms

                (aux_tot, terms), g_aux = jax.value_and_grad(
                    aux_loss, has_aux=True
                )(params)
                total = w["pde"] * pde + aux_tot
                grads = {"net": jax.tree_util.tree_map(
                    lambda a, b: w["pde"] * a + b, g_pde, g_aux["net"]
                )}
                metrics = {"pde": pde, "drm": jnp.asarray(0.0),
                           "norm": jnp.asarray(0.0)}
                metrics.update(terms)
                if use_E_param:
                    # dr/dE = -u  =>  dL/dE = -(2 w_pde / N) sum r*u — the
                    # kernel's extra-output lane (e = B).  g_aux["E"] is 0
                    # today (no aux term reads E) but stays in the sum so a
                    # future E-dependent aux term keeps its gradient.
                    grads["E"] = (
                        -2.0 * w["pde"] / kaux["n"]
                    ) * kaux["sum_r_ufull"] + g_aux["E"]
                    metrics["E"] = params["E"]
                return (total, metrics), grads

            fit_kwargs = {"loss_and_grad_fn": lag_fn}
        else:
            fit_kwargs = {}

        optimizer = make_optimizer(
            cfg.lr, schedule=cfg.lr_schedule, total_steps=cfg.epochs
        )
        if use_E_param and cfg.energy_lr is not None:
            import optax

            # per-leaf lr: the net keeps the scheduled Adam, the E scalar
            # gets its own (smaller) one — fixes the long-run E drift
            labels = {
                "net": jax.tree_util.tree_map(lambda _: "net", params["net"]),
                "E": "E",
            }
            optimizer = optax.multi_transform(
                {
                    "net": optimizer,
                    "E": make_optimizer(
                        cfg.energy_lr, schedule=cfg.lr_schedule,
                        total_steps=cfg.epochs,
                    ),
                },
                labels,
            )
        result = fit(
            loss_fn, eval_fn, params,
            epochs=cfg.epochs, optimizer=optimizer,
            key=jax.random.fold_in(key, 1), chunk=cfg.chunk,
            **fit_kwargs,
        )
        if cfg.LBFGS:
            polished, _ = lbfgs_polish(
                lambda p: loss_fn(p, None)[0], result.params, max_iter=500
            )
            fm = float(eval_fn(polished, None))
            if fm < result.best_metric:
                result = result._replace(
                    params=polished, best_params=polished, best_metric=fm,
                    best_epoch=cfg.epochs,   # the polish runs after the last epoch
                )
            else:
                result = result._replace(params=polished)
        learned_E = (
            float(result.best_params["E"]) if use_E_param else E_exact
        )
    else:  # WAN
        v_model = SolutionModel(
            NetSpec(tuple(cfg.v_layers), activation="sin"),
            _factor("FBC", nx, ny, L),
        )
        u_params = {"net": net_params}
        v_params = v_model.init(jax.random.fold_in(key, 9))
        wv_const, dwv_const = bump_w(X, -L, L)

        # two-pass fused WAN objectives (fixed exact E, QHO_2D.py:204-225)
        fused_wan = cfg.jet_impl == "pallas-fused"
        v_context_fn = None
        if fused_wan:
            from ._fused_wan import make_fused_wan_pair

            pair = make_fused_wan_pair(
                u_model, v_model, w_pde=w["pde"])
            u_pde_fn = pair.u_pde_fn
            E_fix = jnp.asarray(E_exact, jnp.float32)

            # fixed grid: critic coefficient stream once per epoch
            def v_context_fn(u_params, key):
                return pair.v_coef_fn(u_params["net"], E_fix, X,
                                      wv_const, dwv_const, V=V)
        else:
            # XLA path: u's (value, grad) at the fixed meshgrid is
            # critic-loop invariant — once per epoch
            def v_context_fn(u_params, key):
                return u_model.value_and_grad(u_params["net"], X)

        def wan_pde(u_params, v_params, ugu=None):
            u, gu = (ugu if ugu is not None
                     else u_model.value_and_grad(u_params["net"], X))
            v, gv = v_model.value_and_grad(v_params, X)
            phi = wv_const * v
            gphi = dwv_const * v[:, None] + wv_const[:, None] * gv
            weak = wan_weak_residual(
                gu, phi, gphi, u=u, V=V, E=E_exact, prefactor=0.5
            )
            phi_norm = jnp.mean(phi**2)
            return wan_pde_loss(weak, phi_norm), u

        def v_loss_fn(v_params, ctx, key):
            if fused_wan:
                lv, _ = pair.v_loss_from_coef(v_params, X, ctx)
                return lv
            loss_pde, _ = wan_pde(None, v_params, ugu=ctx)
            return -jnp.log(loss_pde + 1e-8)

        def u_loss_fn(u_params, v_params, key):
            if fused_wan:
                pde_w, aux = u_pde_fn(u_params["net"], E_fix, v_params, X,
                                      wv_const, dwv_const, V=V)
                loss_pde = aux["pde_loss"]
                u = u_model.apply_batch(u_params["net"], X)
            else:
                loss_pde, u = wan_pde(u_params, v_params)
                pde_w = w["pde"] * loss_pde
            terms = {
                "pde": loss_pde,
                "drm": jnp.asarray(0.0),
                "norm": norm_integral(u, 4.0 * L * L),
            }
            terms.update(shared_terms(u_params["net"], u))
            total = pde_w + sum(w[k] * terms[k] for k in w if k != "pde")
            return total, terms

        def eval_fn(u_params, key):
            return eval_fn_net(u_params["net"])

        u_opt, v_opt = make_wan_optimizers(
            cfg.lr, v_lr=cfg.v_lr, schedule=cfg.lr_schedule,
            epochs=cfg.epochs, v_steps=cfg.v_steps,
        )
        result = fit_wan(
            u_loss_fn, v_loss_fn, eval_fn, u_params, v_params,
            epochs=cfg.epochs, v_steps=cfg.v_steps,
            u_optimizer=u_opt, v_optimizer=v_opt,
            key=jax.random.fold_in(key, 1), chunk=cfg.chunk,
            minimax=cfg.minimax, u_ema=cfg.u_ema,
            v_context_fn=v_context_fn,
        )
        learned_E = E_exact

    return {
        "config": dataclasses.asdict(cfg),
        "model": u_model,
        "result": result,
        "history": result.history,
        "L2_error": float(result.best_metric),
        "min_epoch": result.best_epoch,
        "learned_energy": learned_E,
        "E_exact": E_exact,
        "weights": w,
    }
