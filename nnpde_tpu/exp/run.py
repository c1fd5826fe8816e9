"""Run wrappers: train a problem preset and persist the reference's artifact
contract (best checkpoint + loss/L2 npy curves + a row in the per-family
JSON results ledger).

Row schemas mirror the reference scripts so the post-processing tools work
on either framework's outputs (results fields of IPW_1D_PINN_DRM.py:216-237,
Poisson_ND.py:334-363, QHO_2D.py:502-523).
"""

from __future__ import annotations

import datetime
import os
import time
from typing import Dict, Optional

import numpy as np

from ..problems.ipw import IPW1DConfig, IPW1DWanConfig, train_ipw_1d, train_ipw_1d_wan
from ..problems.ipw2d import IPW2DConfig, train_ipw_2d
from ..problems.poisson import PoissonConfig, train_poisson_nd
from ..problems.qho import QHO1DConfig, QHO1DWanConfig, train_qho_1d, train_qho_1d_wan
from ..problems.qho2d import QHO2DConfig, train_qho_2d
from .checkpoint import save_params
from .ledger import append_result, save_curves


def _stamp() -> str:
    return datetime.datetime.now().strftime("%Y%m%d_%H%M%S")


def _time_of_best(min_epoch: int, elapsed: float, epochs: int):
    """Wall-clock estimate of when the best model appeared; ``None`` when no
    epoch ever improved (min_epoch == -1, e.g. epochs=0 resume templates) —
    the naive formula would write a negative nonsense value to the ledger
    (cf. the guard run_compare already has, problems/kh.py)."""
    if min_epoch < 0:
        return None
    return min_epoch * elapsed / max(epochs, 1)


def _persist(out: Dict, *, save_dir: str, results_file: str, tag: str,
             meta: Dict, extra_row: Optional[Dict] = None,
             v_meta: Optional[Dict] = None) -> Dict:
    os.makedirs(save_dir, exist_ok=True)
    result = out["result"]
    hist = out["history"]
    ckpt = save_params(
        os.path.join(save_dir, f"{tag}_best"), result.best_params, meta=meta
    )
    # per-metric npy curves, reference naming for the two headline metrics
    # (losses / L2_errors) plus every extra tracked term
    curve_dict = {"losses": hist["total"], "L2_errors": hist["l2"]}
    for k, v in hist.items():
        if k not in ("total", "l2"):
            curve_dict[k] = v
    curves = save_curves(save_dir, tag, curve_dict)
    if result.best_v_params is not None:
        # WAN critic snapshot at the best epoch (reference saves best_v,
        # Poisson_ND.py:326-328, IPW_1D_WAN.py:237-240); the critic has its
        # own architecture, so its meta must carry v_layers
        save_params(
            os.path.join(save_dir, f"{tag}_best_v"),
            result.best_v_params,
            meta={**meta, **(v_meta or {}), "role": "critic"},
        )
    row = {
        "tag": tag,
        # result.best_* are polish-aware (an improving L-BFGS step replaces
        # them); the raw history min would disagree with the saved checkpoint
        "L2_error": float(result.best_metric),
        "min_epoch": int(result.best_epoch),
        "best_model_path": ckpt,
        "losses": curves["losses"],
        "L2_errors": curves["L2_errors"],
        "timestamp": meta.get("timestamp"),
    }
    if extra_row:
        row.update(extra_row)
    append_result(os.path.join(save_dir, results_file), row)
    out["row"] = row
    out["checkpoint"] = ckpt
    return out


# ------------------------------------------------------------------- Poisson
def run_poisson_nd(cfg: PoissonConfig, save_dir: str = "results/ND_Poisson") -> Dict:
    t0 = time.time()
    out = train_poisson_nd(cfg)
    elapsed = time.time() - t0
    ts = _stamp()
    ks = cfg.resolved_ks()
    tag = f"{cfg.method}_{cfg.bc_mode}_d{cfg.dim}_ks{'-'.join(map(str, ks))}_{ts}"
    meta = {
        "problem": "poisson_nd", "timestamp": ts,
        "layers": [cfg.dim] + [cfg.width] * (cfg.depth - 1) + [1],
        "activation": "sin", "bc_mode": cfg.bc_mode, "bc_type": cfg.bc_type,
        "L": cfg.L, "ks": list(ks),
    }
    extra = {
        "method": cfg.method, "bc_mode": cfg.bc_mode, "dim": cfg.dim,
        "L": cfg.L, "ks": list(ks), "width": cfg.width, "depth": cfg.depth,
        "n_interior": cfg.n_interior, "n_boundary": cfg.n_boundary,
        "n_data": cfg.n_data, "epochs": cfg.epochs, "lr": cfg.lr,
        "final_l2": out["final_l2"], "best_l2": out["best_l2"],
        "time": elapsed,
    }
    return _persist(
        out, save_dir=save_dir, results_file="results_poisson_nd.json",
        tag=tag, meta=meta, extra_row=extra,
        v_meta={"layers": [cfg.dim] + [cfg.critic_width] * (cfg.critic_depth - 1) + [1]},
    )


# --------------------------------------------------------------------- IPW 1D
def run_ipw_1d(cfg: IPW1DConfig,
               save_dir: str = "results/Infinite_Potential_Well_1D",
               plot: bool = False) -> Dict:
    t0 = time.time()
    out = train_ipw_1d(cfg)
    elapsed = time.time() - t0
    ts = _stamp()
    tag = f"{cfg.method}_n{cfg.n}_{cfg.technique}_{ts}"
    meta = {
        "problem": "ipw_1d", "timestamp": ts, "layers": list(cfg.layers),
        "activation": "tanh", "technique": cfg.technique, "n": cfg.n,
        "L": cfg.L,
    }
    w = out["weights"]
    extra = {
        "method": cfg.method, "n": cfg.n, "epochs": cfg.epochs,
        "LBFGS": cfg.LBFGS, "technique": cfg.technique,
        "time": elapsed,
        "time_of_best_model": _time_of_best(out["min_epoch"], elapsed, cfg.epochs),
        "weight_pde": w["pde"], "weight_drm": w["drm"], "weight_data": w["data"],
        "weight_norm": w["norm"], "weight_bc": w["bc"], "weight_orth": w["orth"],
        "layers": list(cfg.layers),
    }
    out = _persist(out, save_dir=save_dir, results_file="results_IPW_1D.json",
                   tag=tag, meta=meta, extra_row=extra)
    if plot:
        import jax.numpy as jnp

        from ..pde import ipw as _ipw

        out["plot_paths"] = _plot_1d(
            out, save_dir, tag, lo=0.0, hi=cfg.L,
            exact=lambda x: _ipw.psi_1d(cfg.n, jnp.asarray(x), cfg.L),
        )
    return out


def run_ipw_1d_wan(cfg: IPW1DWanConfig,
                   save_dir: str = "results/Infinite_Potential_Well_1D",
                   plot: bool = False) -> Dict:
    t0 = time.time()
    out = train_ipw_1d_wan(cfg)
    elapsed = time.time() - t0
    ts = _stamp()
    # fn_variant forces the FN trial regardless of cfg.technique — the meta
    # must record the factor actually trained or the registry rebuilds the
    # wrong model
    eff_technique = (
        "FN" if (cfg.fn_variant or cfg.technique == "FN") else cfg.technique
    )
    tag = f"WAN_n{cfg.n}_{eff_technique}_{ts}"
    meta = {
        "problem": "ipw_1d_wan", "timestamp": ts, "layers": list(cfg.layers),
        "activation": "tanh", "technique": eff_technique, "n": cfg.n,
        "L": cfg.L,
    }
    w = out["weights"]
    extra = {
        "method": "WAN", "n": cfg.n, "epochs": cfg.epochs,
        "technique": cfg.technique, "time": elapsed,
        "time_of_best_model": _time_of_best(out["min_epoch"], elapsed, cfg.epochs),
        "weight_pde": w["pde"], "weight_data": w["data"], "weight_norm": w["norm"],
        "weight_bc": w["bc"], "weight_orth": w["orth"],
        "layers": list(cfg.layers), "v_layers": list(cfg.v_layers),
    }
    out = _persist(out, save_dir=save_dir, results_file="results_IPW_1D.json",
                   tag=tag, meta=meta, extra_row=extra,
                   v_meta={"layers": list(cfg.v_layers)})
    if plot:
        import jax.numpy as jnp

        from ..pde import ipw as _ipw

        out["plot_paths"] = _plot_1d(
            out, save_dir, tag, lo=0.0, hi=cfg.L,
            exact=lambda x: _ipw.psi_1d(cfg.n, jnp.asarray(x), cfg.L),
        )
    return out


# --------------------------------------------------------------------- QHO 1D
def run_qho_1d(cfg: QHO1DConfig,
               save_dir: str = "results/Quantum_Harmonic_Oscillator_1D",
               plot: bool = False) -> Dict:
    t0 = time.time()
    out = train_qho_1d(cfg)
    elapsed = time.time() - t0
    ts = _stamp()
    tag = f"{cfg.method}_n{cfg.n}_{cfg.technique}_{ts}"
    meta = {
        "problem": "qho_1d", "timestamp": ts, "layers": list(cfg.layers),
        "activation": "sin", "technique": cfg.technique, "n": cfg.n,
        "x_max": cfg.x_max,
    }
    w = out["weights"]
    extra = {
        "method": cfg.method, "n": cfg.n, "epochs": cfg.epochs,
        "LBFGS": cfg.LBFGS, "technique": cfg.technique, "time": elapsed,
        "time_of_best_model": _time_of_best(out["min_epoch"], elapsed, cfg.epochs),
        "weight_pde": w["pde"], "weight_drm": w["drm"], "weight_data": w["data"],
        "weight_norm": w["norm"], "weight_bc": w["bc"], "weight_orth": w["orth"],
    }
    out = _persist(out, save_dir=save_dir, results_file="results_QHO_1D.json",
                   tag=tag, meta=meta, extra_row=extra)
    if plot:
        import jax.numpy as jnp

        from ..pde import qho as _qho

        out["plot_paths"] = _plot_1d(
            out, save_dir, tag, lo=-cfg.x_max, hi=cfg.x_max,
            exact=lambda x: _qho.psi_1d(cfg.n, jnp.asarray(x)),
        )
    return out


def run_qho_1d_wan(cfg: QHO1DWanConfig,
                   save_dir: str = "results/Quantum_Harmonic_Oscillator_1D") -> Dict:
    t0 = time.time()
    out = train_qho_1d_wan(cfg)
    elapsed = time.time() - t0
    ts = _stamp()
    tag = f"WAN_n{cfg.n}_{cfg.technique}_{ts}"
    meta = {
        "problem": "qho_1d_wan", "timestamp": ts, "layers": list(cfg.layers),
        "activation": "tanh", "technique": cfg.technique, "n": cfg.n,
        "x_max": cfg.x_max,
    }
    extra = {
        "method": "WAN", "n": cfg.n, "epochs": cfg.epochs,
        "technique": cfg.technique, "time": elapsed,
        "E_est": out["E_est"], "E_exact": out["E_exact"],
    }
    return _persist(out, save_dir=save_dir, results_file="results_QHO_1D.json",
                    tag=tag, meta=meta, extra_row=extra,
                    v_meta={"layers": list(cfg.v_layers)})


# --------------------------------------------------------------------- 2D IPW
def run_ipw_2d(cfg: IPW2DConfig,
               save_dir: str = "results/Infinite_Potential_Well_2D",
               plot: bool = False) -> Dict:
    t0 = time.time()
    out = train_ipw_2d(cfg)
    elapsed = time.time() - t0
    ts = _stamp()
    tag = f"{cfg.method}_{cfg.technique}_n{cfg.nx}_{cfg.ny}_{ts}"
    meta = {
        "problem": "ipw_2d", "timestamp": ts, "layers": list(cfg.layers),
        "activation": "sin", "technique": cfg.technique,
        "nx": cfg.nx, "ny": cfg.ny, "L": cfg.L,
    }
    w = out["weights"]
    extra = {
        "method": cfg.method, "n": [cfg.nx, cfg.ny], "epochs": cfg.epochs,
        "LBFGS": cfg.LBFGS, "technique": cfg.technique, "time": elapsed,
        "time_of_best_model": _time_of_best(out["min_epoch"], elapsed, cfg.epochs),
        "weight_pde": w["pde"], "weight_drm": w["drm"], "weight_data": w["data"],
        "weight_bc": w["bc"], "weight_orth": w["orth"],
    }
    out = _persist(out, save_dir=save_dir, results_file="results_IPW_2D.json",
                   tag=tag, meta=meta, extra_row=extra,
                   v_meta={"layers": list(cfg.v_layers)})
    if plot:
        from ..pde import ipw as _ipw

        out["plot_path"] = _plot_2d(
            out, save_dir, tag, lo=0.0, hi=cfg.L,
            exact=lambda x, y: _ipw.psi_2d(cfg.nx, cfg.ny, x, y, cfg.L),
        )
    return out


# --------------------------------------------------------------------- 3D IPW
def run_ipw_3d(cfg, save_dir: str = "results/Infinite_Potential_Well_3D",
               plot: bool = False) -> Dict:
    from ..problems.ipw3d import train_ipw_3d

    t0 = time.time()
    out = train_ipw_3d(cfg)
    elapsed = time.time() - t0
    ts = _stamp()
    tag = f"{cfg.method}_{cfg.technique}_n{cfg.nx}_{cfg.ny}_{cfg.nz}_{ts}"
    meta = {
        "problem": "ipw_3d", "timestamp": ts, "layers": list(cfg.layers),
        "activation": "sin", "technique": cfg.technique,
        "nx": cfg.nx, "ny": cfg.ny, "nz": cfg.nz, "L": cfg.L,
    }
    w = out["weights"]
    extra = {
        "method": cfg.method, "n": [cfg.nx, cfg.ny, cfg.nz],
        "epochs": cfg.epochs, "technique": cfg.technique, "time": elapsed,
        "rel_l2": out["rel_l2"], "jet_impl": cfg.jet_impl,
        "n_interior": cfg.n_interior, "sampler": cfg.sampler,
        "weight_pde": w["pde"], "weight_drm": w["drm"],
        "weight_data": w["data"],
    }
    out = _persist(out, save_dir=save_dir,
                   results_file="results_IPW_3D.json",
                   tag=tag, meta=meta, extra_row=extra)
    if plot:
        out["plot_path"] = plot_ipw_3d_slice(out, save_dir, tag)
    return out


def run_subspace(cfg, save_dir: str = "results/Subspace") -> Dict:
    """Persist a simultaneous multi-eigenstate run: checkpoint + curves +
    a ledger row carrying the whole recovered spectrum."""
    from ..problems.subspace import train_subspace

    t0 = time.time()
    out = train_subspace(cfg)
    elapsed = time.time() - t0
    ts = _stamp()
    tag = f"subspace_{cfg.problem}{cfg.dim}d_k{cfg.k}_{ts}"
    meta = {
        "problem": f"subspace_{cfg.problem}", "timestamp": ts,
        "dim": cfg.dim, "k": cfg.k, "x_max": cfg.x_max,
        "layers": [cfg.dim] + [cfg.width] * cfg.depth + [cfg.k],
        "activation": "sin",
    }
    extra = {
        "method": "SUBSPACE", "k": cfg.k, "epochs": cfg.epochs,
        "time": elapsed, "eigenvalues": out["eigenvalues"],
        "exact": out["exact"], "max_eig_rel_err": out["max_eig_rel_err"],
        **({"max_state_rel_l2": out["max_state_rel_l2"]}
           if "max_state_rel_l2" in out else {}),
    }
    persisted = _persist(out, save_dir=save_dir,
                         results_file="results_Subspace.json",
                         tag=tag, meta=meta, extra_row=extra)
    if "_states" in out:
        from .plotting import plot_subspace_states

        x, U, V, psi = out["_states"]
        png = plot_subspace_states(
            x, U, out["eigenvalues"],
            os.path.join(save_dir, f"{tag}_states.png"), psi=psi, V=V)
        persisted["row"]["states_plot"] = png
    return persisted


def plot_ipw_3d_slice(out: Dict, save_dir: str, tag: str, z_frac: float = 0.5,
                      n: int = 200):
    """Mid-plane slice u(x, y, z0) vs exact — the 3D run's visual artifact
    (reuses the 2D heatmap+surface comparison plot)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..pde import ipw as _ipw
    from .plotting import plot_2d_comparison

    cfg = out["config"]
    L, z0 = cfg["L"], cfg["L"] * z_frac
    model = out["model"]
    g = jnp.linspace(0.0, L, n)
    GX, GY = jnp.meshgrid(g, g, indexing="ij")
    pts = jnp.stack([GX.reshape(-1), GY.reshape(-1),
                     jnp.full((n * n,), z0)], 1)
    u = np.asarray(
        jax.jit(model.apply_batch)(out["result"].best_params, pts)
    ).reshape(n, n)
    ue = np.asarray(_ipw.psi_3d(cfg["nx"], cfg["ny"], cfg["nz"],
                                GX, GY, z0, L))
    if np.mean((u - ue) ** 2) > np.mean((u + ue) ** 2):
        u = -u
    return plot_2d_comparison(
        np.asarray(GX), np.asarray(GY), u, ue,
        os.path.join(save_dir, f"slice_z{z_frac:g}_{tag}.png"),
        title=f"{tag} (z = {z0:g})",
    )


# --------------------------------------------------------------------- 2D QHO
def run_qho_2d(cfg: QHO2DConfig,
               save_dir: str = "results/Quantum_Harmonic_Oscillator_2D",
               plot: bool = False) -> Dict:
    t0 = time.time()
    out = train_qho_2d(cfg)
    elapsed = time.time() - t0
    ts = _stamp()
    tag = f"{cfg.method}_{cfg.technique}_n{cfg.nx}_{cfg.ny}_{ts}"
    meta = {
        "problem": "qho_2d", "timestamp": ts, "layers": list(cfg.layers),
        "activation": "sin", "technique": cfg.technique,
        "nx": cfg.nx, "ny": cfg.ny, "L": cfg.L,
    }
    w = out["weights"]
    extra = {
        "method": cfg.method, "n": [cfg.nx, cfg.ny], "epochs": cfg.epochs,
        "LBFGS": cfg.LBFGS, "technique": cfg.technique, "time": elapsed,
        "time_of_best_model": _time_of_best(out["min_epoch"], elapsed, cfg.epochs),
        "weight_pde": w["pde"], "weight_drm": w["drm"], "weight_data": w["data"],
        "weight_norm": w["norm"], "weight_bc": w["bc"], "weight_orth": w["orth"],
        "learned_energy": out["learned_energy"],
    }
    out = _persist(out, save_dir=save_dir, results_file="results_QHO_2D.json",
                   tag=tag, meta=meta, extra_row=extra,
                   v_meta={"layers": list(cfg.v_layers)})
    if plot:
        from ..pde import qho as _qho

        out["plot_path"] = _plot_2d(
            out, save_dir, tag, lo=-cfg.L, hi=cfg.L,
            exact=lambda x, y: _qho.psi_2d(cfg.nx, cfg.ny, x, y),
        )
    return out


def _plot_1d(out, save_dir, tag, *, lo, hi, exact, n: int = 500):
    """Overlay + loss/L2 curve plots per run (the reference's per-run PNG
    emission, IPW_1D_WAN.py:298-332)."""
    import numpy as np

    from .plotting import plot_curves, plot_wavefunction_overlay

    x = np.linspace(lo, hi, n)
    overlay = plot_wavefunction_overlay(
        out["checkpoint"], x, np.asarray(exact(x)),
        os.path.join(save_dir, f"{tag}_solution.png"), title=tag,
    )
    curves = plot_curves([out["row"]], os.path.join(save_dir, tag))
    return [overlay] + curves


def _plot_2d(out, save_dir, tag, *, lo, hi, exact, n: int = 100):
    """100x100 quad comparison plot, sign-aligned (QHO_2D.py:539-551)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .plotting import plot_2d_comparison

    model = out["model"]
    params = out["result"].best_params
    net_p = params["net"] if isinstance(params, dict) and "net" in params else params
    g = jnp.linspace(lo, hi, n)
    GX, GY = jnp.meshgrid(g, g, indexing="ij")
    pts = jnp.stack([GX.reshape(-1), GY.reshape(-1)], 1)
    u = np.asarray(jax.jit(model.apply_batch)(net_p, pts)).reshape(n, n)
    ue = np.asarray(exact(GX, GY))
    if np.mean((u - ue) ** 2) > np.mean((u + ue) ** 2):
        u = -u
    return plot_2d_comparison(
        np.asarray(GX), np.asarray(GY), u, ue,
        os.path.join(save_dir, f"pinn_vs_exact_{tag}.png"),
        title=tag,
    )
