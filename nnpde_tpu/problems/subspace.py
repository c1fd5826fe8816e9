"""Simultaneous multi-eigenstate (subspace) solver — beyond the reference.

The reference computes excited states ONE AT A TIME: a fresh network per
level, trained against orthogonality penalties that project on the saved
lower states (``IPW_1D_PINN_DRM.py:92-103``, ``QHO_1D_PINN_DRM.py:197-212``,
``KH_1D.py:271-280``), driven state-by-state from each script's
``__main__`` loop.  That is k sequential training runs for k states, and
the error of level n compounds the errors of the frozen levels below it.

Here ONE k-channel network learns the k lowest eigenpairs in a single
run, via Gram-metric trace minimisation over the spanned subspace:

    A_ij = mean[ 1/2 grad(u_i).grad(u_j) + V u_i u_j ]      (stiffness)
    G_ij = mean[ u_i u_j ]                                  (Gram)
    loss = tr(G^{-1} A) + ortho_weight * mean((G - I)^2)

By the Courant–Fischer / Ky Fan trace principle, min over k-dimensional
subspaces of tr(G^{-1}A) is the sum of the k lowest eigenvalues of
H = -1/2 Δ + V, so the channels converge to a basis of the lowest
eigenspace.  ``tr(G^{-1}A)`` is rotation-invariant — individual eigenpairs
are recovered afterwards from the tiny k x k generalized eigenproblem
A Y = G Y diag(λ) (:func:`subspace_eigenpairs`); the ``(G - I)^2`` term
never steers WHICH subspace wins, it only pins scale/conditioning.

TPU-first rationale: all k channels ride the same hidden value/Jacobian/
Laplacian streams (:func:`nnpde_tpu.ops.fwdlap.mlp_fwdlap_channels` — the
output layer fans them out), so one subspace epoch costs ~one
single-state epoch: the whole spectrum trains for the price of the
reference's ground state.  A and G are k x k einsum reductions over the
batch (MXU-shaped), and the k x k solves are negligible.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import NetSpec, factor_for_technique
from ..models.solution import ChannelSolutionModel
from ..pde import ipw as ipw_phys
from ..pde import kh as kh_phys
from ..pde import qho as qho_phys
from ..sampling import linspace_grid, meshgrid_2d
from ..train import fit


# --------------------------------------------------------------- assembly
def subspace_matrices(value, grad, V=None, *, prefactor: float = 0.5):
    """(A, G) from per-channel fields on a quadrature batch.

    ``value``: (N, k); ``grad``: (N, d, k); ``V``: (N,) or None.
    Means over the batch approximate (1/Vol) * integrals; the common
    1/Vol cancels in every generalized-eigen quantity downstream.
    """
    G = value.T @ value / value.shape[0]
    A = prefactor * jnp.einsum("ndi,ndj->ij", grad, grad) / value.shape[0]
    if V is not None:
        A = A + (value * V[:, None]).T @ value / value.shape[0]
    return 0.5 * (A + A.T), 0.5 * (G + G.T)


def subspace_trace(A, G, *, ridge: float = 1e-6):
    """``tr(G^{-1} A)`` via Cholesky — smooth (no eigendecomposition on the
    gradient path; eigh derivatives blow up at degeneracies, and QHO-2D
    style spectra ARE degenerate).

    The ridge is RELATIVE (``ridge * tr(G)/k``): an absolute ridge is
    meaningless when the channel scale drifts, and an under-ridged
    near-singular Gram turns the f32 solve into garbage (observed: a
    collapsed IPW init reported sum(lambda) = -64 through the eigh path —
    A and G are both PSD here, so the ridged trace can never go negative).
    """
    k = G.shape[0]
    Gr = G + (ridge * jnp.trace(G) / k) * jnp.eye(k, dtype=G.dtype)
    L = jnp.linalg.cholesky(Gr)
    W = jax.scipy.linalg.cho_solve((L, True), A)
    return jnp.trace(W)


def subspace_eigenpairs(A, G, *, ridge: float = 1e-9):
    """Solve the k x k generalized problem A Y = G Y diag(lam).

    Returns (lam ascending, Y) with Y G-orthonormal: the trained channels
    span the subspace; ``u @ Y`` are the individual eigenfunctions."""
    k = G.shape[0]
    L = jnp.linalg.cholesky(G + ridge * jnp.eye(k, dtype=G.dtype))
    Li = jax.scipy.linalg.solve_triangular(L, jnp.eye(k, dtype=G.dtype),
                                           lower=True)
    M = Li @ A @ Li.T
    lam, Q = jnp.linalg.eigh(0.5 * (M + M.T))
    return lam, Li.T @ Q


# ------------------------------------------------------------------ config
@dataclasses.dataclass
class SubspaceConfig:
    problem: str = "qho"        # 'qho' (window, V=x^2/2) | 'ipw' (box, V=0)
                                # | 'kh' (window, cycle-averaged KH well;
                                #   spectrum/states from the FD eigensolver)
    k: int = 4                  # number of simultaneous eigenstates
    dim: int = 1                # 1 | 2 (tensor-product quadrature grid)
    x_max: float = 6.0          # QHO window half-width; IPW box length L
    epochs: int = 8000
    lr: float = 1e-3
    lr_schedule: str = "cosine"
    width: int = 64
    depth: int = 3
    grid_n: int = 600           # quadrature points per dimension
    eval_grid_n: int = 2000     # dense grid for the final host-side report
    ortho_weight: float = 100.0
    whiten_floor: float = 0.1
    ridge: float = 1e-6
    seed: int = 0
    chunk: int = 1000
    alpha: float = 10.0         # KH only: laser quiver amplitude alpha_0
    fd_grid_n: int = 5000       # KH only: FD ground-truth resolution


def _setup(cfg: SubspaceConfig):
    if cfg.problem == "qho":
        factor = factor_for_technique("OG", dim=cfg.dim, kind="window",
                                      L=cfg.x_max)
        lo, hi = -cfg.x_max, cfg.x_max
        if cfg.dim == 1:
            V = lambda X: qho_phys.potential_1d(X[:, 0])
        else:
            V = lambda X: qho_phys.potential_2d(X[:, 0], X[:, 1])
    elif cfg.problem == "ipw":
        factor = factor_for_technique("FBC", dim=cfg.dim, kind="box",
                                      L=cfg.x_max)
        lo, hi = 0.0, cfg.x_max
        V = None
    elif cfg.problem == "kh":
        # Kramers-Henneberger cycle-averaged soft-core well on [-L, L]
        # (pde/kh.py v_kh_avg — the theta-quadrature of KH_1D.py:32-39),
        # Dirichlet box matching the FD ground truth.  1D only, levels
        # non-degenerate, so the 1D state-rel-L2 scoring path applies
        # with the FD eigenvectors as exact states.
        if cfg.dim != 1:
            raise ValueError("KH subspace solver is 1D")
        factor = factor_for_technique("OG", dim=1, kind="window",
                                      L=cfg.x_max)
        lo, hi = -cfg.x_max, cfg.x_max
        V = lambda X: kh_phys.v_kh_avg(X[:, 0], alpha0=cfg.alpha)
    else:
        raise ValueError(f"unknown subspace problem {cfg.problem!r}")
    if cfg.dim == 1:
        X = linspace_grid(cfg.grid_n + 2, lo, hi)[1:-1]
    elif cfg.dim == 2:
        X = meshgrid_2d(cfg.grid_n, lo, hi)
    else:
        raise ValueError("subspace solver supports dim 1 or 2")
    layers = (cfg.dim,) + (cfg.width,) * cfg.depth + (cfg.k,)
    model = ChannelSolutionModel(NetSpec(layers), factor=factor)
    return model, X, V, (lo, hi)


def _kh_fd_truth(x_max: float, fd_grid_n: int, alpha: float, k: int):
    """FD ground truth for the KH subspace run (cached per config key).

    Same operator, same Dirichlet box [-L, L] and same cycle-averaged
    potential as the training loss — the reference's own gold standard
    (KH_1D.py:46-82 builds exactly this tridiagonal eigensystem)."""
    key = (float(x_max), int(fd_grid_n), float(alpha), int(k))
    hit = _KH_FD_CACHE.get(key)
    if hit is None:
        hit = kh_phys.reference_eigensystem(
            L=x_max, N=fd_grid_n, alpha=alpha, k_max=k)
        _KH_FD_CACHE[key] = hit
    return hit


_KH_FD_CACHE: Dict[tuple, tuple] = {}


def _exact_spectrum(cfg: SubspaceConfig) -> np.ndarray:
    """The k lowest exact levels (with multiplicity, for the 2D spectra)."""
    if cfg.dim == 1:
        if cfg.problem == "qho":
            return np.array([qho_phys.energy_1d(n) for n in range(cfg.k)])
        if cfg.problem == "kh":
            return np.asarray(
                _kh_fd_truth(cfg.x_max, cfg.fd_grid_n, cfg.alpha, cfg.k)[1],
                np.float64)
        return np.array([ipw_phys.energy_1d(n + 1, cfg.x_max)
                         for n in range(cfg.k)])
    pairs = []
    for nx in range(cfg.k + 2):
        for ny in range(cfg.k + 2):
            if cfg.problem == "qho":
                pairs.append(qho_phys.energy_2d(nx, ny))
            else:
                pairs.append(ipw_phys.energy_2d(nx + 1, ny + 1, cfg.x_max))
    return np.sort(np.array(pairs))[: cfg.k]


def _exact_states(cfg: SubspaceConfig, X: np.ndarray) -> Optional[np.ndarray]:
    """(N, k) exact eigenfunctions where the level ordering is unambiguous
    (1D); None for 2D degenerate spectra (use :func:`_exact_state_groups_2d`
    + principal angles instead — individual 2D states are gauge, only the
    degenerate SUBSPACE is physical)."""
    if cfg.dim != 1:
        return None
    x = X[:, 0]
    if cfg.problem == "qho":
        cols = [qho_phys.psi_1d(n, x) for n in range(cfg.k)]
    elif cfg.problem == "kh":
        # FD eigenvectors interpolated onto the eval grid; state_rel_l2
        # re-normalises both sides on that grid, so the FD trapezoid
        # normalisation convention drops out.
        xg, _, psi = _kh_fd_truth(cfg.x_max, cfg.fd_grid_n, cfg.alpha, cfg.k)
        cols = [np.interp(np.asarray(x, np.float64), xg, psi[:, n])
                for n in range(cfg.k)]
    else:
        cols = [ipw_phys.psi_1d(n + 1, x, cfg.x_max) for n in range(cfg.k)]
    return np.stack([np.asarray(c) for c in cols], axis=1)


def _exact_state_groups_2d(cfg: SubspaceConfig, X: np.ndarray):
    """Degenerate clusters of the 2D spectrum, with their exact bases.

    Returns a list of ``(i0, i1, energy, P)``: levels [i0, i1) of the
    sorted spectrum share ``energy`` and ``P`` is the (N, i1-i0) stack of
    the cluster's product eigenfunctions on ``X``.  A cluster that the
    ``k`` cut would slice is returned WHOLE (its full exact basis): the
    learned columns inside the cut must still lie INSIDE the full
    degenerate subspace, which principal angles measure directly."""
    x, y = X[:, 0], X[:, 1]
    pairs = []
    for nx in range(cfg.k + 2):
        for ny in range(cfg.k + 2):
            if cfg.problem == "qho":
                E = qho_phys.energy_2d(nx, ny)
                psi = qho_phys.psi_2d(nx, ny, x, y)
            else:
                E = ipw_phys.energy_2d(nx + 1, ny + 1, cfg.x_max)
                psi = ipw_phys.psi_2d(nx + 1, ny + 1, x, y, cfg.x_max)
            pairs.append((float(E), np.asarray(psi, np.float64)))
    pairs.sort(key=lambda t: t[0])
    groups, i = [], 0
    while i < min(cfg.k, len(pairs)):
        j = i
        while j < len(pairs) and np.isclose(pairs[j][0], pairs[i][0],
                                            rtol=1e-9, atol=1e-9):
            j += 1
        groups.append((i, j, pairs[i][0],
                       np.stack([p for _, p in pairs[i:j]], axis=1)))
        i = j
    return groups


def subspace_group_scores(U: np.ndarray, groups, k: int):
    """Principal-angle validation of learned states against degenerate
    exact subspaces.

    For each cluster ``(i0, i1, E, P)``: orthonormalise the learned
    columns ``U[:, i0:min(i1, k)]`` and the full exact basis ``P`` (QR in
    the discrete L2 inner product — uniform tensor grid, so plain dots),
    take the SVD of the cross-Gram; the singular values are the cosines of
    the principal angles.  ``sin_max = sqrt(1 - cos_min^2)`` is the
    largest angle between the learned span and the exact subspace — 0 iff
    the learned states lie exactly inside it, gauge-free under any
    rotation within a degenerate cluster (the rotation freedom that makes
    per-state rel-L2 meaningless in 2D)."""
    out = []
    for i0, i1, E, P in groups:
        Ug = U[:, i0:min(i1, k)]
        Qu, _ = np.linalg.qr(Ug)
        Qp, _ = np.linalg.qr(P)
        s = np.linalg.svd(Qu.T @ Qp, compute_uv=False)
        cos_min = float(np.clip(s[: Ug.shape[1]].min(), 0.0, 1.0))
        out.append({
            "levels": [int(i0), int(min(i1, k))],
            "energy": float(E),
            "degeneracy": int(i1 - i0),
            "n_learned": int(Ug.shape[1]),
            "sin_max": float(np.sqrt(max(0.0, 1.0 - cos_min**2))),
        })
    return out


def normalize_input_layer(params, lo: float, hi: float, *,
                          half_width: float = 4.0):
    """Rescale the FIRST layer at init so the domain maps to
    [-half_width, half_width] as seen by the sin activations.

    On a small box like IPW's [0, 1], Xavier-init sin units are nearly
    linear (|W0 x| << 1), so the hidden basis is close to rank-2 over the
    batch and no amount of width or epochs recovers the higher states
    (measured: k=4 IPW fails at 0.55 rel-err on EVERY seed at w48 AND
    w96; with this rescaling it trains to ~2e-3 on every seed).  The
    transform is init-only preconditioning — W0' = s W0,
    b0' = b0 - mid*s*sum(W0) realises net((x-mid)*s) in the same
    parameter class, so training is free to undo it.
    """
    s = 2.0 * half_width / (hi - lo)
    mid = 0.5 * (lo + hi)
    W0, b0 = params[0]
    return [(W0 * s, b0 - mid * s * W0.sum(0))] + params[1:]


def whiten_output_layer(model, params, X, *, floor: float = 1e-2):
    """SOFT-whiten the output layer so the channel Gram starts
    well-conditioned.

    A shared trial factor (and a near-linear hidden basis on a small box
    domain) makes freshly-initialised channels nearly parallel: G starts
    close to rank-1 and the early G^{-1} gradients are garbage (measured:
    un-whitened IPW k=3 trains to max eig rel-err 0.64–0.86 — collapsed).
    With u = (h @ W + b) * factor and L L^T = G + floor*tr(G)/k * I, the
    replacement (W L^{-T}, b L^{-T}) equalises channel scales and opens
    the collapsed directions, while the floor caps the amplification at
    ~sqrt(1/floor): EXACT whitening (floor -> 0) inflates the noise
    directions of an already-healthy Gram by 1/sqrt(eps_f32-ish) and
    breaks training instead (measured: QHO 3e-3 -> 0.25 rel-err).  One
    k x k Cholesky at init, no training-loop cost.
    """
    jet_val = model.apply_batch(params, X)
    G = jet_val.T @ jet_val / jet_val.shape[0]
    k = G.shape[0]
    L = jnp.linalg.cholesky(
        G + floor * (jnp.trace(G) / k) * jnp.eye(k, dtype=G.dtype))
    Lit = jax.scipy.linalg.solve_triangular(
        L, jnp.eye(k, dtype=G.dtype), lower=True).T
    W_last, b_last = params[-1]
    return params[:-1] + [(W_last @ Lit, b_last @ Lit)]


# ---------------------------------------------------------------- training
def train_subspace(cfg: SubspaceConfig, *, progress=None) -> Dict:
    """One training run -> the k lowest eigenpairs.

    Returns a dict with per-level eigenvalues, their errors vs the exact
    spectrum, per-level sign-aware rel-L2 (1D), and the FitResult curves.
    """
    model, X, V, (lo, hi) = _setup(cfg)
    Vx = V(X) if V is not None else None
    pref = 0.5

    def matrices(params):
        jet = model.fields(params, X)
        return subspace_matrices(jet.value, jet.grad, Vx, prefactor=pref)

    def loss_fn(params, key):
        A, G = matrices(params)
        k = G.shape[0]
        trace = subspace_trace(A, G, ridge=cfg.ridge)
        eye = jnp.eye(k, dtype=G.dtype)
        ortho = jnp.mean((G - eye) ** 2)
        loss = trace + cfg.ortho_weight * ortho
        return loss, {"trace": trace, "ortho": ortho}

    def eval_fn(params, key):
        # the variational objective itself: the ridged trace == sum of the
        # k generalized eigenvalues — lower is strictly better, needs no
        # ground truth, and (unlike an f32 eigh of an ill-conditioned pair)
        # is PSD-safe: it cannot go negative and hijack best-tracking.
        A, G = matrices(params)
        return subspace_trace(A, G, ridge=cfg.ridge)

    if cfg.lr_schedule == "cosine":
        sched = optax.cosine_decay_schedule(cfg.lr, cfg.epochs)
    else:
        sched = cfg.lr
    opt = optax.adam(sched)
    params = model.init(jax.random.PRNGKey(cfg.seed))
    params = normalize_input_layer(params, lo, hi)
    params = whiten_output_layer(model, params, X, floor=cfg.whiten_floor)
    res = fit(loss_fn, eval_fn, params, epochs=cfg.epochs, optimizer=opt,
              key=jax.random.PRNGKey(cfg.seed + 1), chunk=cfg.chunk,
              progress=progress)

    # ---- host-side report on a dense grid (rotated individual states)
    report = evaluate_subspace(cfg, model, res.best_params)
    report["best_epoch"] = res.best_epoch
    report["best_sum_lambda"] = res.best_metric
    report["timing"] = res.timing
    report["history"] = res.history
    report["best_params"] = res.best_params
    report["result"] = res
    return report


def evaluate_subspace(cfg: SubspaceConfig, model, params) -> Dict:
    """Rotate the trained channels into individual eigenfunctions and score
    them against the analytic spectrum/states on a dense grid."""
    dense_cfg = dataclasses.replace(cfg, grid_n=cfg.eval_grid_n)
    _, Xd, Vd_fn, _ = _setup(dense_cfg)
    Vd = np.asarray(Vd_fn(Xd), np.float64) if Vd_fn is not None else None
    jet = model.fields(params, Xd)
    # float64 host-side assembly: the f32 einsum accumulation floor is
    # ~5e-4 relative on the k x k integrals, well above a converged net's
    # eigenvalue error — the report must not be quantised by the reporter.
    val = np.asarray(jet.value, np.float64)
    grad = np.asarray(jet.grad, np.float64)
    N = val.shape[0]
    G = val.T @ val / N
    A = 0.5 * np.einsum("ndi,ndj->ij", grad, grad) / N
    if Vd is not None:
        A = A + (val * Vd[:, None]).T @ val / N
    A, G = 0.5 * (A + A.T), 0.5 * (G + G.T)
    L = np.linalg.cholesky(G + 1e-12 * np.eye(cfg.k))
    Li = np.linalg.inv(L)
    M = Li @ A @ Li.T
    lam, Q = np.linalg.eigh(0.5 * (M + M.T))
    Y = Li.T @ Q
    U = val @ Y                                        # (N, k) eigenfunctions

    exact = _exact_spectrum(cfg)
    abs_err = np.abs(lam - exact)
    rel_err = abs_err / np.maximum(np.abs(exact), 1e-12)

    out: Dict = {
        "eigenvalues": lam.tolist(),
        "exact": exact.tolist(),
        "eig_abs_err": abs_err.tolist(),
        "eig_rel_err": rel_err.tolist(),
        "max_eig_rel_err": float(np.max(rel_err)),
    }
    psi = _exact_states(cfg, np.asarray(Xd))
    if cfg.dim == 1:
        # dense-grid states for post-processing (exp/run.run_subspace plots
        # the recovered spectrum); private key — never serialised
        out["_states"] = (np.asarray(Xd)[:, 0], U,
                          np.asarray(Vd) if Vd is not None else None, psi)
    if psi is not None:
        rels = []
        for m in range(cfg.k):
            u = U[:, m] / (np.linalg.norm(U[:, m]) + 1e-30)
            p = psi[:, m] / (np.linalg.norm(psi[:, m]) + 1e-30)
            rels.append(float(min(np.linalg.norm(u - p),
                                  np.linalg.norm(u + p))))
        out["state_rel_l2"] = rels
        out["max_state_rel_l2"] = float(np.max(rels))
    elif cfg.dim == 2:
        # degenerate spectra: per-cluster principal-angle validation —
        # the learned span of each degenerate group vs its exact subspace
        groups = _exact_state_groups_2d(cfg, np.asarray(Xd))
        scores = subspace_group_scores(U, groups, cfg.k)
        out["subspace_groups"] = scores
        out["max_subspace_sin"] = float(max(s["sin_max"] for s in scores))
    return out
