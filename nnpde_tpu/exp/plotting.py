"""Paper-figure generation from ledgers and checkpoints.

Ports the reference post-processing (``/root/reference/Data_process/plot.py``)
without its central fragility: checkpoints are reloaded through the model
registry (:mod:`nnpde_tpu.models.registry`) instead of re-declaring every
network class by copy (plot.py:135-252).

* :func:`plot_curves` — semilog loss / L2-error evolution for ledger-filtered
  runs (plot.py:30-96, academic rcParams + colorblind palette).
* :func:`plot_wavefunction_overlay` — predicted vs exact with two zoom
  insets (boundary + peak, plot.py:254-361).
* :func:`plot_2d_comparison` — 2D heatmaps + 3D surfaces quad plot
  (IPW_2D.py:25-66 / QHO_2D.py:25-66).
* :func:`plot_solution_gt` — KH overlay of prediction, FD reference and the
  dressed potential (KH_1D.py:459-481).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib import rcParams
from mpl_toolkits.axes_grid1.inset_locator import inset_axes, mark_inset

# academic plot style (plot.py:10-28)
STYLE = {
    "font.family": "serif",
    "font.size": 14,
    "axes.labelsize": 16,
    "axes.titlesize": 18,
    "legend.fontsize": 12,
    "xtick.labelsize": 14,
    "ytick.labelsize": 14,
    "figure.figsize": (8, 6),
    "savefig.dpi": 150,
    "lines.linewidth": 2,
    "axes.grid": True,
    "grid.linestyle": "--",
    "grid.alpha": 0.5,
}

# colorblind-friendly palette (plot.py:28)
COLORS = [
    "#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
    "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf",
]


def plot_curves(
    entries: Sequence[Dict],
    out_prefix: str,
    *,
    metric_keys=("losses", "L2_errors"),
    label_fn: Optional[Callable[[Dict], str]] = None,
) -> List[str]:
    """Semilog evolution curves for a list of ledger rows (npy paths)."""
    rcParams.update(STYLE)
    label_fn = label_fn or (
        lambda e: f"{e.get('method', '?')} (n={e.get('n', '?')}, "
                  f"{e.get('technique', '?')})"
    )
    paths = []
    titles = {"losses": "Loss Evolution During Training",
              "L2_errors": "L2 Error Evolution During Training"}
    ylabels = {"losses": "Loss", "L2_errors": "L2 Error"}
    for key in metric_keys:
        fig, ax = plt.subplots()
        any_negative = False
        for idx, e in enumerate(entries):
            curve = np.load(e[key])
            if (curve <= 0).any():
                any_negative = True
            ax.plot(np.arange(len(curve)), curve,
                    label=label_fn(e), color=COLORS[idx % len(COLORS)])
        # semilog for positive curves (the reference style); symlog when a
        # metric legitimately crosses zero (e.g. the Deep-Ritz energy)
        ax.set_yscale("symlog" if any_negative else "log")
        ax.set_xlabel("Epochs")
        ax.set_ylabel(ylabels.get(key, key))
        ax.set_title(titles.get(key, key))
        ax.legend(loc="upper right", frameon=True, shadow=True)
        fig.tight_layout()
        out = f"{out_prefix}_{key}.png"
        fig.savefig(out, bbox_inches="tight")
        plt.close(fig)
        paths.append(out)
    return paths


def load_checkpoint_model(ckpt_path: str):
    """(model, params, meta) from a self-describing checkpoint."""
    from ..models.registry import build_solution_model
    from .checkpoint import load_params

    params, meta = load_params(ckpt_path)
    model = build_solution_model(meta)
    return model, params, meta


def plot_wavefunction_overlay(
    ckpt_path: str,
    x,
    u_exact,
    out_png: str,
    *,
    title: Optional[str] = None,
    insets: bool = True,
) -> str:
    """Prediction vs exact with boundary + peak zoom insets (plot.py:254-361).

    ``x``: (N,) plot grid; ``u_exact``: (N,) analytic truth.
    """
    import jax
    import jax.numpy as jnp

    rcParams.update(STYLE)
    model, params, meta = load_checkpoint_model(ckpt_path)
    net_params = params["net"] if isinstance(params, dict) and "net" in params else params
    # jit the forward: eager dispatch is pathologically slow on remote-TPU
    # backends (see .claude/skills/verify/SKILL.md)
    u = np.asarray(
        jax.jit(model.apply_batch)(net_params, jnp.asarray(x).reshape(-1, 1))
    )
    ue = np.asarray(u_exact)
    if np.mean((u - ue) ** 2) > np.mean((u + ue) ** 2):
        u = -u  # eigenfunction sign gauge

    fig, ax = plt.subplots()
    ax.plot(x, ue, label="Exact", color=COLORS[3], linestyle="--")
    ax.plot(x, u, label="Predicted", color=COLORS[0], linewidth=1.2)
    ax.set_xlabel("x")
    ax.set_ylabel(r"$\psi(x)$")
    if title:
        ax.set_title(title)
    ax.legend(loc="best")

    if insets and len(x) > 16:
        # boundary inset (left edge) + peak inset (argmax of |exact|)
        n = len(x)
        bw = max(n // 20, 4)
        for (lo, hi), loc in (
            ((0, bw), "lower left"),
            ((max(int(np.argmax(np.abs(ue))) - bw // 2, 0),
              min(int(np.argmax(np.abs(ue))) + bw // 2, n - 1)), "upper right"),
        ):
            if hi <= lo:
                continue
            axi = inset_axes(ax, width="30%", height="30%", loc=loc)
            axi.plot(x[lo:hi], ue[lo:hi], color=COLORS[3], linestyle="--",
                     linewidth=1)
            axi.plot(x[lo:hi], u[lo:hi], color=COLORS[0], linewidth=1)
            axi.set_xticks([])
            axi.set_yticks([])
            try:
                mark_inset(ax, axi, loc1=2, loc2=4, fc="none", ec="0.6")
            except Exception:
                pass
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_png) or ".", exist_ok=True)
    fig.savefig(out_png, bbox_inches="tight")
    plt.close(fig)
    return out_png


def plot_2d_comparison(x, y, u_pred, u_exact, out_png: str,
                       title: str = "PINN vs Exact Solution") -> str:
    """2x2 heatmap + 3D surface comparison (IPW_2D.py:25-66)."""
    rcParams.update(STYLE)
    X, Y = np.asarray(x), np.asarray(y)
    Zp, Ze = np.asarray(u_pred), np.asarray(u_exact)
    fig = plt.figure(figsize=(12, 10))
    ax1 = fig.add_subplot(2, 2, 1)
    hm1 = ax1.pcolormesh(X, Y, Zp, shading="auto")
    fig.colorbar(hm1, ax=ax1, label="u_pred")
    ax1.set_title("2D predicted heatmap")
    ax2 = fig.add_subplot(2, 2, 2)
    hm2 = ax2.pcolormesh(X, Y, Ze, shading="auto")
    fig.colorbar(hm2, ax=ax2, label="u_exact")
    ax2.set_title("2D exact heatmap")
    ax3 = fig.add_subplot(2, 2, 3, projection="3d")
    ax3.plot_surface(X, Y, Zp, rcount=100, ccount=100, cmap="viridis",
                     edgecolor="none")
    ax3.set_title("3D predicted surface")
    ax4 = fig.add_subplot(2, 2, 4, projection="3d")
    ax4.plot_surface(X, Y, Ze, rcount=100, ccount=100, cmap="plasma",
                     edgecolor="none")
    ax4.set_title("3D exact surface")
    for ax in (ax1, ax2):
        ax.set_xlabel("x")
        ax.set_ylabel("y")
    fig.suptitle(title)
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_png) or ".", exist_ok=True)
    fig.savefig(out_png, bbox_inches="tight")
    plt.close(fig)
    return out_png


def plot_floquet_harmonics(x, phi_re, phi_im, gt_re, gt_im, M: int,
                           eps_est: float, out_png: str,
                           keep: float = 1e-4) -> str:
    """Floquet-state overlay: neural |phi_m(x)| (lines) vs FD ground truth
    (markers) per harmonic m, on a log scale so the sidebands are visible.
    Harmonics with both neural and FD weight below ``keep`` are skipped.
    (The reference has no analogue — it never solves the time-dependent
    problem; cf. its single-state overlay KH_1D.py:459-481.)"""
    rcParams.update(STYLE)
    x = np.asarray(x)
    amp = np.sqrt(np.asarray(phi_re) ** 2 + np.asarray(phi_im) ** 2)
    amp_gt = np.sqrt(np.asarray(gt_re) ** 2 + np.asarray(gt_im) ** 2)
    fig, ax = plt.subplots(figsize=(10, 6))
    colors = plt.cm.viridis(np.linspace(0.0, 0.85, amp.shape[1]))
    stride = max(1, len(x) // 64)
    for c in range(amp.shape[1]):
        m = c - M
        if amp[:, c].max() < keep and amp_gt[:, c].max() < keep:
            continue
        ax.semilogy(x, amp[:, c] + 1e-12, color=colors[c],
                    label=f"$|\\phi_{{{m}}}|$ neural")
        ax.semilogy(x[::stride], amp_gt[::stride, c] + 1e-12,
                    color=colors[c], marker="o", linestyle="none",
                    markersize=3, alpha=0.6)
    ax.set_ylim(bottom=max(keep * 1e-2, 1e-7))
    ax.set_xlabel("x (a.u.)")
    ax.set_ylabel("$|\\phi_m(x)|$")
    ax.set_title(f"Floquet harmonics: neural (lines) vs FD (dots) | "
                 f"$\\varepsilon$~{eps_est:.6f}")
    ax.legend()
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_png) or ".", exist_ok=True)
    fig.savefig(out_png, dpi=150)
    plt.close(fig)
    return out_png


def plot_subspace_states(x, U, lam, out_png: str, psi=None, V=None,
                         scale: float = 0.35) -> str:
    """Spectrum 'waterfall': each recovered eigenstate u_m, unit-normalised
    and offset by its eigenvalue lambda_m, over the potential; exact states
    (when the level ordering is unambiguous) as dots.  One figure shows the
    whole output of a subspace run — k levels from ONE training — which the
    reference cannot produce in any single run (it retrains per level,
    IPW_1D_PINN_DRM.py:250-261)."""
    rcParams.update(STYLE)
    x = np.asarray(x)
    U = np.asarray(U)
    lam = np.asarray(lam)
    k = U.shape[1]
    span = float(lam[-1] - lam[0]) if k > 1 else 1.0
    amp = scale * (span / max(k - 1, 1)) if k > 1 else scale
    fig, ax = plt.subplots(figsize=(10, 6))
    if V is not None:
        ax.plot(x, np.asarray(V), color="0.55", alpha=0.8, label="$V(x)$")
    colors = plt.cm.viridis(np.linspace(0.0, 0.85, k))
    stride = max(1, len(x) // 64)
    for m in range(k):
        u = U[:, m] / (np.abs(U[:, m]).max() + 1e-30)
        if psi is not None:
            p = np.asarray(psi)[:, m]
            p = p / (np.abs(p).max() + 1e-30)
            if np.mean((u - p) ** 2) > np.mean((u + p) ** 2):
                u = -u
            ax.plot(x[::stride], lam[m] + amp * p[::stride], linestyle="none",
                    marker="o", markersize=2.5, alpha=0.55, color=colors[m])
        ax.axhline(lam[m], color=colors[m], linewidth=0.6, alpha=0.5)
        ax.plot(x, lam[m] + amp * u, color=colors[m],
                label=f"$u_{{{m}}}$, $\\lambda$={lam[m]:.5g}")
    ax.set_xlabel("x")
    ax.set_ylabel("energy offset + scaled state")
    ax.set_title(f"subspace solver: {k} lowest eigenpairs from one run")
    ax.legend(fontsize=8, ncol=2)
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_png) or ".", exist_ok=True)
    fig.savefig(out_png, dpi=150)
    plt.close(fig)
    return out_png


def plot_solution_gt(x, psi_ref, u_pred, v_x, e_est, method: str, n: int,
                     out_png: str) -> str:
    """KH overlay: FD reference, prediction, dressed potential
    (KH_1D.py:459-481)."""
    rcParams.update(STYLE)
    x = np.asarray(x)
    ref = np.asarray(psi_ref)
    up = np.asarray(u_pred)
    if np.mean((up - ref) ** 2) > np.mean((-up - ref) ** 2):
        up = -up
    fig, ax = plt.subplots(figsize=(10, 6))
    ax.plot(x, ref, label=f"ref $\\psi_n$ (n={n})", linewidth=2)
    ax.plot(x, up, label=f"{method} $\\psi_{{pred}}$", linestyle="--")
    ax.plot(x, np.asarray(v_x), label="$V_{KH}(x)$", alpha=0.7)
    if e_est is not None:
        ax.set_title(f"{method} vs Reference | n={n} | E~{e_est:.6f}")
    ax.set_xlabel("x (a.u.)")
    ax.legend()
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_png) or ".", exist_ok=True)
    fig.savefig(out_png, dpi=150)
    plt.close(fig)
    return out_png
