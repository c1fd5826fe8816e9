"""2D infinite potential well preset (PINN / DRM / WAN, techniques FBC/FN/OG).

Reproduces ``train_pinn_seperate``
(``/root/reference/Schrodinger_Equations/Infinite_Potential_Well/IPW_2D.py:127-382``):
200x200 meshgrid collocation on [0, L]^2, lower-left-quadrant supervised
data (IPW_2D.py:144-152), unweighted symmetry (nx == ny) and parity
(x -> L - x with sign (-1)^(n+1)) losses (IPW_2D.py:234-245), degeneracy-
aware orthogonality for DRM (i^2+j^2 < nx^2+ny^2, IPW_2D.py:112-124), OG
boundary penalty on 200-point edges (IPW_2D.py:154-163,249-256).

The reference's README shows 2D-well WAN results but IPW_2D.py has no WAN
branch (SURVEY.md §2.3, defect list).  This preset ADDS the missing WAN:
weak form ``int 1/2 grad u . grad phi - E u phi`` with the known eigenvalue,
2D bump test function, finite-norm regularisation ``(L^2 mean(u^2) - 1)^2``
with the heavy weight of the WAN-FN trial space (IPW_1D_WAN_FN.py:159-163),
and the 5-inner-critic-step protocol of QHO_2D.py:343-361.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..losses.zoo import (
    data_mse,
    drm_rayleigh_unscaled,
    norm_integral,
    orthogonal_projection,
    pinn_helmholtz,
    reflection_mse,
    wan_pde_loss,
    wan_weak_residual,
)
from ..kernels import make_fused_rayleigh, quotient_coefficients
from ..models import NetSpec, SolutionModel, factor_for_technique
from ..ops import bump_w
from ..ops.quadrature import sign_aware_mse
from ..pde import ipw as phys
from ..sampling import meshgrid_2d
from .. import runtime
from ..train import fit, fit_wan, lbfgs_polish, make_optimizer, make_wan_optimizers


@dataclasses.dataclass
class IPW2DConfig:
    nx: int = 1
    ny: int = 1
    L: float = 2.0
    epochs: int = 10000
    lr: float = 1e-3
    LBFGS: bool = False
    method: str = "PINN"              # PINN | DRM | WAN
    technique: str = "FBC"            # FBC | FN | OG
    layers: Tuple[int, ...] = (2, 50, 50, 50, 50, 1)
    v_layers: Tuple[int, ...] = (2, 20, 20, 20, 1)
    v_steps: int = 5
    # >1 enables multi-test-function WAN: an n x n grid of localised bumps,
    # one weak residual per bump (framework extension — the reference's
    # single global bump yields rank-1 gradient information per step)
    n_test_grid: int = 1
    # WAN only: draw a fresh uniform collocation sample per critic/primal
    # step instead of the fixed meshgrid (removes the fixed-grid weak-form
    # quadrature bias; the Poisson WAN does this, Poisson_ND.py:244-253)
    wan_resample: bool = False
    # WAN only: per-eval deterministic whole-grid jitter (Cranley–Patterson
    # shift of a cell-centered lattice: X = (idx + s) * L/n, s ~ U[0,1)^2
    # per loss evaluation).  An unbiased estimator of the weak-form
    # integrals WITHOUT the per-point sampling noise that makes
    # ``wan_resample`` fail (3.7e-2, docs/WAN_FLOOR.md) — the n^2-point
    # lattice mean has O(h^2) shift-to-shift variation vs O(1/sqrt(N))
    # for iid uniform points.
    grid_jitter: bool = False
    # WAN + grid_jitter only: keep the anchor terms (norm/parity/symmetry/
    # orth/data) on the FIXED grid while the weak form rides the jittered
    # lattice.  Round-Q finding (docs/WAN_FLOOR.md): the full-horizon
    # jitter run's error is 1.95e-3 raw but 8.48e-4 after one global
    # amplitude rescale — jitter's composition loss is amplitude wander
    # from the norm anchor's quadrature target moving with the lattice
    # every epoch.  The anchors pin symmetries and scale, not integrals
    # that need unbiased quadrature; the fixed grid does that job
    # noise-free.  Costs one extra grid-sized forward per primal eval.
    jitter_anchors_fixed: bool = False
    # WAN only: saddle-point update rule (train/trainer.py fit_wan) —
    # alternating GDA (the reference protocol), extragradient, or optimistic
    minimax: str = "alternating"
    # WAN only: critic lr (None = same as cfg.lr).  Setting v_lr > lr gives
    # the classic two-timescale GDA (the KH reference uses 2x, KH_1D.py:336)
    v_lr: Optional[float] = None
    # WAN only: EMA decay for the averaged primal iterate (0 disables)
    u_ema: float = 0.0
    # Scale-free eval: score the unit-normalised iterate (u * (1/L)/rms(u))
    # instead of the raw net output.  Deterministic GT-free postprocess —
    # an eigenfunction's amplitude is normalisation convention; under
    # grid_jitter the raw amplitude wanders with the norm anchor's moving
    # quadrature target and best-iterate selection stops seeing the shape
    # (docs/WAN_FLOOR.md rounds Q/R).
    eval_selfnorm: bool = False
    grid_n: int = 200
    data_grid_n: int = 50
    n_boundary: int = 200
    seed: int = 0
    lr_schedule: str = "constant"   # constant | cosine | exponential
    # decay horizon when shorter than epochs: past it the lr holds at the
    # schedule floor (train/optim.py decay_steps; the WAN "decay fast,
    # then hold" protocol — wan_floor_screen.json)
    lr_decay_steps: int = 0
    # schedule floor as a fraction of lr (cosine alpha / exponential
    # decay_rate; train/optim.py final_scale)
    lr_final_scale: float = 0.01
    # float32 | bfloat16 | hybrid (PINN + DRM; see problems/poisson.py)
    compute_dtype: str = "float32"
    hybrid_bf16_fraction: float = 0.8
    # jet/gradient backend: 'pallas' = lane-packed VMEM kernels on TPU
    # (PINN jets AND the DRM/WAN value+grad path; BENCHMARKS.md)
    jet_impl: str = "xla"
    chunk: int = 1000
    # Optional overrides of the reference weight table.  NOTE: the reference
    # table has lambda_data = 0 and no norm loss (IPW_2D.py:172-177), so its
    # PINN branch admits the trivial u = 0 minimiser — pass e.g.
    # {'data': 1e4} or {'norm': 10.0} here to pin a nontrivial solution.
    weights: Optional[Dict[str, float]] = None


def unit_normalize(u, target_rms, *, eps: float = 1e-30):
    """Rescale a sampled field to a fixed rms convention: u * c / rms(u).

    Scale-invariant by construction (u and c*u map to the same function),
    which is the property ``eval_selfnorm`` needs: under grid_jitter the
    raw amplitude wanders with the norm anchor's moving quadrature target
    and hides the shape from best-iterate selection.

    ``target_rms`` must be the rms of the comparison target ON THE SAME
    eval grid (i.e. both sides reduced to one discrete norm convention —
    the standard scale-free eigenfunction distance min_± ||û ∓ ψ̂||).
    Round-4 defect fixed here: the old signature took ``L`` and used the
    CONTINUUM constant 1/L, but the endpoint-inclusive meshgrid rms of
    ψ differs from 1/L by (n-1)/n per dim ≈ 2.5e-3 at grid_n=400 — a
    quadrature bias LARGER than the 1e-3 acceptance gate, which is why
    the round-4 selfnorm seed-0 row read raw 2.65e-3 over an 8.48e-4
    shape (docs/WAN_FLOOR.md round T)."""
    return u * (target_rms / jnp.sqrt(jnp.mean(u * u) + eps))


def _lower_states_2d(nx: int, ny: int, X, L: float):
    """Degeneracy-aware lower states: (i, j) with i^2+j^2 < nx^2+ny^2.

    Faithful to IPW_2D.py:112-124 INCLUDING its loop bound max(nx,ny): lower
    states with a quantum number above max(nx,ny) (e.g. (4,1) below (3,3))
    are not penalised by the reference either."""
    cols = []
    for i in range(1, max(nx, ny) + 1):
        for j in range(1, max(nx, ny) + 1):
            if i**2 + j**2 < nx**2 + ny**2:
                cols.append(phys.psi_2d(i, j, X[:, 0], X[:, 1], L))
    if not cols:
        return jnp.zeros((X.shape[0], 0), X.dtype)
    return jnp.stack(cols, axis=1)


def train_ipw_2d(cfg: IPW2DConfig, init_params=None, init_v_params=None,
                 compile_only: bool = False, init_carry=None,
                 start_epoch: int = 0, run_epochs=None) -> Dict:
    """``init_params``/``init_v_params`` warm-start the nets (staged-
    annealing protocol for the WAN minimax: converge at one lr horizon,
    restart the schedule from the best iterate at a lower lr).

    ``compile_only``: lower+compile the training step and return its
    memory-analysis dict instead of training (HBM-pressure probe; see
    train/trainer.py:_compile_probe).  Hybrid configs probe the bulk
    phase (the bigger program).

    ``init_carry``/``start_epoch``/``run_epochs``: segmented training.
    Runs ``run_epochs`` epochs (default: the rest of the horizon) of the
    FULL ``cfg.epochs`` schedule starting at global epoch ``start_epoch``
    from a prior ``result.carry`` — bit-identical to one continuous run
    (per-epoch keys fold in the absolute epoch index, the lr schedule
    rides the optimizer state; tests/test_resume.py).  This is what makes
    multi-hour floor runs survivable across bounded sessions/outages:
    checkpoint the carry between segments (scripts/wan_floor.py
    --segmented).  Not supported with compute_dtype='hybrid' (two-phase
    precision switch has its own internal segmentation)."""
    if cfg.method not in ("PINN", "DRM", "WAN"):
        raise ValueError("method must be 'PINN', 'DRM' or 'WAN'")
    if (init_carry is not None or start_epoch or run_epochs is not None) \
            and cfg.compute_dtype == "hybrid":
        raise ValueError("segmented resume is not supported with "
                         "compute_dtype='hybrid'")
    seg_epochs = (cfg.epochs - start_epoch) if run_epochs is None \
        else run_epochs
    if start_epoch + seg_epochs > cfg.epochs:
        raise ValueError("start_epoch + run_epochs exceeds cfg.epochs")
    if cfg.compute_dtype not in ("float32", "bfloat16", "hybrid"):
        raise ValueError(
            "compute_dtype must be 'float32', 'bfloat16' or 'hybrid'"
        )
    # Epoch-scan length cap (see runtime.pallas_chunk_cap(): the round-3
    # ladder found no cliff on either step shape, so the default cap of
    # 1000 is uncapped in practice; NNPDE_PALLAS_CHUNK_CAP overrides).
    cap = runtime.pallas_chunk_cap()
    chunk = (min(cfg.chunk, cap) if cfg.jet_impl.startswith("pallas")
             else cfg.chunk)
    if cfg.jet_impl not in ("xla", "pallas", "pallas-fused"):
        raise ValueError("jet_impl must be 'xla', 'pallas' or 'pallas-fused'")
    # multi-bump WAN (n_test_grid > 1) rides the K-lane fused kernels
    # (kernels/fused_multibump.py) under jet_impl='pallas-fused'
    if cfg.technique not in ("FBC", "FN", "OG"):
        raise ValueError(f"Unknown technique: {cfg.technique}")
    nx, ny, L = cfg.nx, cfg.ny, cfg.L

    factor = factor_for_technique(
        cfg.technique,
        dim=2,
        kind="box",
        L=L,
        nodes_per_dim=[phys.nodes(nx, L), phys.nodes(ny, L)]
        if cfg.technique == "FN"
        else None,
    )
    model = SolutionModel(NetSpec(tuple(cfg.layers), activation="sin"), factor)
    key = jax.random.PRNGKey(cfg.seed)
    params = init_params if init_params is not None else model.init(key)

    X = meshgrid_2d(cfg.grid_n, 0.0, L)                       # (n^2, 2)
    u_exact = phys.psi_2d(nx, ny, X[:, 0], X[:, 1], L)

    # supervised quadrant: 50x50 grid, first 25x25 block (IPW_2D.py:144-152)
    Xd_full = meshgrid_2d(cfg.data_grid_n, 0.0, L)
    half = cfg.data_grid_n // 2
    mask = (
        jnp.arange(cfg.data_grid_n)[:, None] < half
    ) & (jnp.arange(cfg.data_grid_n)[None, :] < half)
    idx = jnp.nonzero(mask.reshape(-1))[0]
    X_data = Xd_full[idx]
    u_data = phys.psi_2d(nx, ny, X_data[:, 0], X_data[:, 1], L)

    # OG boundary points: 200 per edge
    tb = jnp.linspace(0.0, L, cfg.n_boundary)
    X_bc = jnp.concatenate([
        jnp.stack([tb, jnp.zeros_like(tb)], 1),
        jnp.stack([tb, jnp.full_like(tb, L)], 1),
        jnp.stack([jnp.zeros_like(tb), tb], 1),
        jnp.stack([jnp.full_like(tb, L), tb], 1),
    ])

    lower = _lower_states_2d(nx, ny, X, L)
    E = phys.energy_2d(nx, ny, L)
    k_squared = 2.0 * E

    # IPW_2D.py:172-177 (+ unweighted parity/symmetry at :258); the WAN
    # table follows QHO_2D.py:294-300 with the WAN-FN finite-norm weight
    if cfg.method == "WAN":
        w = {
            "data": 10000.0, "pde": 10.0, "drm": 0.0, "orth": 0.0,
            "bc": 10000.0 if cfg.technique == "OG" else 0.0,
            "parity": 1.0, "symmetry": 1.0, "norm": 1000.0,
        }
    else:
        w = {
            "data": 0.0,
            "pde": 10.0 if cfg.method == "PINN" else 0.0,
            "drm": 0.0 if cfg.method == "PINN" else 100.0,
            "orth": 0.0 if cfg.method == "PINN" else 10000.0,
            "bc": 10000.0 if cfg.technique == "OG" else 0.0,
            "parity": 1.0,
            "symmetry": 1.0,
            "norm": 0.0,
        }
    if cfg.weights:
        w.update(cfg.weights)
    sign_x = 1.0 if nx % 2 == 1 else -1.0
    sign_y = 1.0 if ny % 2 == 1 else -1.0

    X_swap = X[:, ::-1]
    X_px = jnp.stack([L - X[:, 0], X[:, 1]], 1)
    X_py = jnp.stack([X[:, 0], L - X[:, 1]], 1)

    def shared_terms(params, u, dtype="float32", Xq=None):
        """``Xq``: the quadrature set ``u`` was evaluated at (None = the
        fixed grid).  Under ``grid_jitter`` the jittered lattice is passed
        so every integral term rides the SAME forward — reflections of a
        Cranley–Patterson-shifted lattice are equally unbiased, and the
        extra fixed-grid forward (the grid400 HBM-pressure suspect,
        TODO Open #3) disappears."""
        if Xq is None:
            Xs, Xpx, Xpy, low = X_swap, X_px, X_py, lower
        else:
            Xs = Xq[:, ::-1]
            Xpx = jnp.stack([L - Xq[:, 0], Xq[:, 1]], 1)
            Xpy = jnp.stack([Xq[:, 0], L - Xq[:, 1]], 1)
            low = (_lower_states_2d(nx, ny, Xq, L)
                   if w["orth"] > 0 else lower)
        if dtype == "bfloat16":
            # cast the full-grid reflection forwards (the expensive ones);
            # reductions and the small data term stay f32
            p_c = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16), params
            )

            def fwd(Xa):
                return model.apply_batch(
                    p_c, Xa.astype(jnp.bfloat16)
                ).astype(jnp.float32)
        else:
            def fwd(Xa):
                return model.apply_batch(params, Xa)
        # one batched forward over the (up to 3) reflected point sets —
        # one big MXU matmul instead of three grid-sized dispatches
        refl = ([Xs] if nx == ny else []) + [Xpx, Xpy]
        u_refl = fwd(jnp.concatenate(refl, axis=0))
        parts = jnp.split(u_refl, len(refl))
        u_sym = parts[0] if nx == ny else None
        u_px, u_py = parts[-2], parts[-1]
        return {
            "data": data_mse(model.apply_batch(params, X_data), u_data),
            "symmetry": reflection_mse(u, u_sym)
            if nx == ny
            else jnp.asarray(0.0),
            "parity": (
                reflection_mse(u, u_px, sign_x)
                + reflection_mse(u, u_py, sign_y)
            ),
            "orth": orthogonal_projection(u, low, L * L)
            if w["orth"] > 0
            else jnp.asarray(0.0),
            "bc": jnp.mean(model.apply_batch(params, X_bc) ** 2) * 4.0
            if w["bc"] > 0
            else jnp.asarray(0.0),
            "norm": norm_integral(u, L * L)
            if w["norm"] > 0
            else jnp.asarray(0.0),
        }

    # two-pass fused Rayleigh quotient for the DRM branch (pass A sums +
    # seeded pass B via custom_vjp, kernels/fused_quotient.py); weight 2x
    # converts the kernel's 1/2|grad|^2 numerator to the reference's
    # unscaled IPW convention (IPW_2D.py:226-227)
    fused_drm = (cfg.method == "DRM" and cfg.jet_impl == "pallas-fused")
    if fused_drm:
        ray_loss = make_fused_rayleigh(
            model.spec.activation, weight=2.0 * w["drm"], den_eps=1e-8)
        coef_ray = quotient_coefficients(factor.jet(X))

    def make_loss_terms(dtype):
        if fused_drm and dtype == "float32":
            def loss_terms(params):
                total_drm, aux = ray_loss(params, X, coef_ray)
                u = model.apply_batch(params, X)
                terms = {"pde": jnp.asarray(0.0),
                         "drm": 2.0 * aux["rayleigh"]}
                terms.update(shared_terms(params, u))
                total = total_drm + sum(
                    w[k] * terms[k] for k in w if k not in ("drm", "pde"))
                return total, terms

            return loss_terms

        def loss_terms(params):
            if dtype == "bfloat16":
                p_c = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16), params
                )
                X_c = X.astype(jnp.bfloat16)
            else:
                p_c, X_c = params, X
            impl = ("pallas" if cfg.jet_impl == "pallas"
                    and dtype != "bfloat16" else "xla")
            if cfg.method == "PINN":
                jet = model.fields(p_c, X_c, impl=impl)
                u = jet.value.astype(jnp.float32)
                pde = pinn_helmholtz(
                    u, jet.lap.astype(jnp.float32), k_squared
                )
                drm = jnp.asarray(0.0)
            else:
                u, g = model.value_and_grad(p_c, X_c, impl=impl)
                u = u.astype(jnp.float32)
                pde = jnp.asarray(0.0)
                drm = drm_rayleigh_unscaled(
                    u, g.astype(jnp.float32), den_eps=1e-8
                )
            terms = {"pde": pde, "drm": drm}
            terms.update(shared_terms(params, u))
            total = sum(w[k] * terms[k] for k in w)
            return total, terms

        return loss_terms

    loss_terms = make_loss_terms(
        "float32" if cfg.compute_dtype == "hybrid" else cfg.compute_dtype
    )

    def loss_fn(params, key):
        return loss_terms(params)

    def eval_fn(params, key):
        """Plain MSE on the training grid (IPW_2D.py:262-266); WAN uses the
        sign-aware variant like the other adversarial trainers.

        ``eval_selfnorm``: eigenfunctions are defined up to scale, so
        score the explicitly unit-normalised iterate — both sides reduced
        to the SAME discrete grid-norm convention (u * rms(ψ)/rms(u) vs
        ψ, the standard scale-free eigenfunction distance; equals the
        optimal-rescale error to second order in the error, and is
        convention-matching, not shape-fitting: only the single scalar
        rms(ψ) enters, never ψ's shape).  Round-Q data: under grid_jitter
        the norm anchor's quadrature target moves with the lattice and
        the amplitude wanders ~0.1% epoch-to-epoch, hiding an 8.48e-4
        shape under a 1.95e-3 raw error; scale-free eval makes
        best-iterate selection see the shape (docs/WAN_FLOOR.md rounds
        R and T — round T pre-registers this exact metric)."""
        u = model.apply_batch(params, X)
        if cfg.eval_selfnorm:
            u = unit_normalize(u, jnp.sqrt(jnp.mean(u_exact * u_exact)))
        if cfg.method == "WAN":
            return sign_aware_mse(u, u_exact)
        return jnp.mean((u - u_exact) ** 2)

    if cfg.method == "WAN":
        v_model = SolutionModel(
            NetSpec(tuple(cfg.v_layers), activation="sin"),
            factor_for_technique("FBC", dim=2, kind="box", L=L),
        )
        v_params = (init_v_params if init_v_params is not None
                    else v_model.init(jax.random.fold_in(key, 9)))
        if cfg.n_test_grid > 1:
            from ..ops import bump_grid, bump_w_multi

            centers, hw = bump_grid(0.0, L, 2, cfg.n_test_grid)
            wv_multi, dwv_multi = bump_w_multi(X, centers, hw)  # (K,N),(K,N,2)
        else:
            wv_const, dwv_const = bump_w(X, 0.0, L)
        if cfg.grid_jitter:
            # cell-centered lattice base (points strictly inside (0, L)):
            # X_lat + s*h with s ~ U[0,1)^2 is the Cranley–Patterson shifted
            # lattice rule — E_s[mean f(X)] = (1/L^2) int f exactly
            h_cell = L / cfg.grid_n
            g_lat = jnp.arange(cfg.grid_n, dtype=X.dtype) * h_cell
            Xl, Yl = jnp.meshgrid(g_lat, g_lat, indexing="ij")
            X_lat = jnp.stack([Xl.reshape(-1), Yl.reshape(-1)], -1)

        def net_vg(m, p, Xw, dtype):
            """Net value+grad at the compute dtype (reductions stay f32).

            bf16 rides the XLA stream path (the Pallas kernels are f32-in;
            same convention as make_loss_terms above)."""
            if dtype == "bfloat16":
                p_c = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16), p
                )
                u, g = m.value_and_grad(
                    p_c, Xw.astype(jnp.bfloat16), impl="xla"
                )
                return u.astype(jnp.float32), g.astype(jnp.float32)
            impl = ("pallas" if cfg.jet_impl.startswith("pallas")
                    else cfg.jet_impl)
            return m.value_and_grad(p, Xw, impl=impl)

        def pick_points(key):
            """Quadrature set + single-bump (w, dw) for this step (the
            jitter / resample / fixed-grid rules of wan_pde)."""
            if cfg.grid_jitter and key is not None:
                s = jax.random.uniform(key, (2,), X.dtype)
                Xw = X_lat + s[None, :] * h_cell
                wv_c, dwv_c = bump_w(Xw, 0.0, L)
            elif cfg.wan_resample and key is not None:
                Xw = jax.random.uniform(key, X.shape, X.dtype, 0.0, L)
                wv_c, dwv_c = bump_w(Xw, 0.0, L)
            else:
                Xw, wv_c, dwv_c = X, wv_const, dwv_const
            return Xw, wv_c, dwv_c

        def pick_points_multi(key):
            """Multi-bump variant: stacked (K, N) / (K, N, 2) windows."""
            from ..ops import bump_w_multi as _bwm

            if cfg.grid_jitter and key is not None:
                s = jax.random.uniform(key, (2,), X.dtype)
                Xw = X_lat + s[None, :] * h_cell
                wv_m, dwv_m = _bwm(Xw, centers, hw)
            elif cfg.wan_resample and key is not None:
                Xw = jax.random.uniform(key, X.shape, X.dtype, 0.0, L)
                wv_m, dwv_m = _bwm(Xw, centers, hw)
            else:
                Xw, wv_m, dwv_m = X, wv_multi, dwv_multi
            return Xw, wv_m, dwv_m

        def wan_pde(u_params, v_params, key=None, dtype="float32",
                    ugu=None):
            # ``ugu``: optional precomputed (u, grad u) at the FIXED grid —
            # the per-epoch critic context (u is frozen across the inner
            # critic steps, so its jet is loop-invariant; XLA does not
            # hoist it out of the fori_loop body)
            if cfg.grid_jitter and key is not None:
                s = jax.random.uniform(key, (2,), X.dtype)
                Xw = X_lat + s[None, :] * h_cell
                wv_c, dwv_c = (None, None) if cfg.n_test_grid > 1 else (
                    bump_w(Xw, 0.0, L)
                )
            elif cfg.wan_resample and key is not None:
                import jax as _jax

                Xw = _jax.random.uniform(key, X.shape, X.dtype, 0.0, L)
                wv_c, dwv_c = bump_w(Xw, 0.0, L)
            else:
                Xw = X
                wv_c, dwv_c = (None, None) if cfg.n_test_grid > 1 else (
                    wv_const, dwv_const
                )
            u, gu = (ugu if ugu is not None
                     else net_vg(model, u_params, Xw, dtype))
            v, gv = net_vg(v_model, v_params, Xw, dtype)
            if cfg.n_test_grid > 1:
                if (cfg.wan_resample or cfg.grid_jitter) and key is not None:
                    from ..ops import bump_w_multi

                    wv_m, dwv_m = bump_w_multi(Xw, centers, hw)
                else:
                    wv_m, dwv_m = wv_multi, dwv_multi
                # one weak residual per localised test function phi_k = w_k v
                phi = wv_m * v[None, :]                           # (K, N)
                gphi = (dwv_m * v[None, :, None]
                        + wv_m[:, :, None] * gv[None, :, :])      # (K, N, 2)
                integrand = (
                    0.5 * jnp.sum(gu[None] * gphi, axis=-1)
                    - E * u[None, :] * phi
                )
                weak_k = jnp.mean(integrand, axis=1)              # (K,)
                norm_k = jnp.mean(phi**2, axis=1)                 # (K,)
                return jnp.mean(weak_k**2 / (norm_k + 1e-8)), u, Xw
            phi = wv_c * v
            gphi = dwv_c * v[:, None] + wv_c[:, None] * gv
            weak = wan_weak_residual(gu, phi, gphi, u=u, E=E, prefactor=0.5)
            return wan_pde_loss(weak, jnp.mean(phi**2)), u, Xw

        # two-pass fused WAN step (kernels/fused_quotient.py): the weak
        # residual and phi/u masses accumulate in-kernel (pass A), the
        # quotient scalars combine in XLA, and pass B seeds the reverse
        # sweep — custom_vjp, so fit_wan's value_and_grad (all three
        # minimax modes) picks it up unchanged.  The parity/symmetry/
        # data/norm terms keep their reference quadrature rules on the
        # standard path (they need u forwards at reflected points anyway).
        fused_wan = cfg.jet_impl == "pallas-fused"
        # with a FIXED quadrature grid, the critic coefficient stream is
        # frozen across the inner critic steps — build once per epoch
        fused_fixed = fused_wan and not (cfg.grid_jitter or cfg.wan_resample)
        multibump = cfg.n_test_grid > 1
        if fused_wan:
            from ._fused_wan import (
                make_fused_wan_multi_pair, make_fused_wan_pair,
            )

            if multibump:
                pair = make_fused_wan_multi_pair(
                    model, v_model, int(centers.shape[0]), w_pde=w["pde"])
            else:
                pair = make_fused_wan_pair(model, v_model, w_pde=w["pde"])
            u_pde_fn = pair.u_pde_fn
            E_fix = jnp.asarray(E, jnp.float32)
            pick = pick_points_multi if multibump else pick_points
            wv_fix, dwv_fix = ((wv_multi, dwv_multi) if multibump
                               else (wv_const, dwv_const))
        if fused_fixed:
            def fused_context_fn(u_params, key):
                return pair.v_coef_fn(u_params, E_fix, X, wv_fix, dwv_fix)
        # the XLA path gets a per-epoch critic context too whenever the
        # quadrature grid is fixed: (u, grad u) at X is invariant across
        # the inner critic steps, so compute it once per epoch (and at the
        # EG lookahead point) instead of once per critic step
        xla_fixed = not (cfg.grid_jitter or cfg.wan_resample)

        def make_wan_losses(dtype):
            """-> (u_loss_fn, v_loss_fn, v_context_fn or None)."""
            if fused_wan and dtype == "float32":
                def v_loss_fn(v_params, ctx, key):
                    # ctx = the per-epoch coefficient stream (fixed grid)
                    # or the primal params (jitter/resample: points and
                    # therefore the u-jet change per inner step)
                    if fused_fixed:
                        lv, _ = pair.v_loss_from_coef(v_params, X, ctx)
                        return lv
                    Xw, wv_c, dwv_c = pick(key)
                    lv, _ = pair.v_loss_fn(v_params, ctx, E_fix, Xw,
                                           wv_c, dwv_c)
                    return lv

                def u_loss_fn(u_params, v_params, key):
                    Xw, wv_c, dwv_c = pick(key)
                    pde_w, aux = u_pde_fn(u_params, E_fix, v_params, Xw,
                                          wv_c, dwv_c)
                    # u forward for the quadrature terms (same rules as
                    # the XLA path: jitter rides the lattice, resample
                    # keeps the fixed grid)
                    if cfg.grid_jitter and not cfg.jitter_anchors_fixed:
                        u, Xq = model.apply_batch(u_params, Xw), Xw
                    else:
                        u, Xq = model.apply_batch(u_params, X), None
                    terms = {"pde": aux["pde_loss"], "drm": jnp.asarray(0.0)}
                    terms.update(shared_terms(u_params, u, dtype, Xq=Xq))
                    total = pde_w + sum(
                        w[k] * terms[k] for k in w if k != "pde")
                    return total, terms

                return (u_loss_fn, v_loss_fn,
                        fused_context_fn if fused_fixed else None)

            if xla_fixed:
                def v_context_fn(u_params, key):
                    return net_vg(model, u_params, X, dtype)

                def v_loss_fn(v_params, ugu, key):
                    loss_pde, _, _ = wan_pde(None, v_params, None, dtype,
                                             ugu=ugu)
                    return -jnp.log(loss_pde + 1e-8)
            else:
                v_context_fn = None

                def v_loss_fn(v_params, u_params, key):
                    loss_pde, _, _ = wan_pde(u_params, v_params, key, dtype)
                    return -jnp.log(loss_pde + 1e-8)

            def u_loss_fn(u_params, v_params, key):
                loss_pde, u_w, Xw = wan_pde(u_params, v_params, key, dtype)
                if cfg.grid_jitter and cfg.jitter_anchors_fixed:
                    # jittered weak form + fixed-grid anchors: the extra
                    # fixed-grid forward buys a noise-free amplitude/
                    # symmetry target (round-Q attack)
                    u, Xq = model.apply_batch(u_params, X), None
                elif cfg.grid_jitter:
                    # every integral term rides the jittered lattice (same
                    # forward as the weak form; reflections of a shifted
                    # lattice are equally unbiased) — no second full-grid
                    # forward (the grid400 HBM-crash suspect, TODO Open #3)
                    u, Xq = u_w, Xw
                elif cfg.wan_resample:
                    # iid-uniform points make reflection/norm estimates
                    # noisy — those terms stay on the fixed grid
                    if dtype == "bfloat16":
                        p_c = jax.tree_util.tree_map(
                            lambda x: x.astype(jnp.bfloat16), u_params
                        )
                        u = model.apply_batch(
                            p_c, X.astype(jnp.bfloat16)
                        ).astype(jnp.float32)
                    else:
                        u = model.apply_batch(u_params, X)
                    Xq = None
                else:
                    u, Xq = u_w, None
                terms = {"pde": loss_pde, "drm": jnp.asarray(0.0)}
                terms.update(shared_terms(u_params, u, dtype, Xq=Xq))
                total = sum(w[k] * terms[k] for k in w)
                return total, terms

            return u_loss_fn, v_loss_fn, v_context_fn

        u_loss_fn, v_loss_fn, v_context_fn = make_wan_losses(
            "float32" if cfg.compute_dtype == "hybrid" else cfg.compute_dtype
        )

        u_opt, v_opt = make_wan_optimizers(
            cfg.lr, v_lr=cfg.v_lr, schedule=cfg.lr_schedule,
            epochs=cfg.epochs, v_steps=cfg.v_steps,
            decay_steps=cfg.lr_decay_steps,
            final_scale=cfg.lr_final_scale,
        )
        wan_kw = dict(
            v_steps=cfg.v_steps, u_optimizer=u_opt, v_optimizer=v_opt,
            chunk=min(chunk, cap), minimax=cfg.minimax, u_ema=cfg.u_ema,
        )
        if cfg.compute_dtype == "hybrid":
            import numpy as _np

            # bf16 compute for the bulk of the minimax, f32 tail from the
            # FULL carry (both optimizer states, best iterate, EMA, OGDA
            # grads ride across the precision switch) — the same protocol
            # as the PINN/DRM hybrid below (VERDICT r2 #7: measure, don't
            # refuse).  Measured verdict at the winner config
            # (grid300/30k): 7.90e-3 vs 1.63e-3 f32 — the adversarial
            # dynamics are precision-sensitive, so f32 stays the WAN
            # default (docs/WAN_FLOOR.md round L).
            bulk = int(cfg.epochs * cfg.hybrid_bf16_fraction)
            u16, v16, ctx16 = make_wan_losses("bfloat16")
            r1 = fit_wan(
                u16, v16, eval_fn, params, v_params, epochs=bulk,
                key=jax.random.fold_in(key, 1), compile_only=compile_only,
                v_context_fn=ctx16, **wan_kw,
            )
            if compile_only:
                return r1
            result = fit_wan(
                u_loss_fn, v_loss_fn, eval_fn, params, v_params,
                epochs=cfg.epochs - bulk,
                key=jax.random.fold_in(key, 1), start_epoch=bulk,
                init_carry=r1.carry, v_context_fn=v_context_fn, **wan_kw,
            )
            hist = {k: _np.concatenate([r1.history[k], result.history[k]])
                    for k in result.history}
            result = result._replace(history=hist)
        else:
            result = fit_wan(
                u_loss_fn, v_loss_fn, eval_fn, params, v_params,
                epochs=seg_epochs, start_epoch=start_epoch,
                init_carry=init_carry,
                key=jax.random.fold_in(key, 1), compile_only=compile_only,
                v_context_fn=v_context_fn, **wan_kw,
            )
            if compile_only:
                return result
    else:
        optimizer = make_optimizer(
            cfg.lr, schedule=cfg.lr_schedule, total_steps=cfg.epochs,
            decay_steps=cfg.lr_decay_steps, final_scale=cfg.lr_final_scale,
        )
        if cfg.jet_impl == "pallas-fused" and cfg.method == "PINN":
            # One-pass fused loss+grad kernel on the Helmholtz residual
            # r = lap u + k^2 u (u = B*net; coefficients from the factor
            # jet, fixed grid).  Replaces IPW_2D.py:210-222's per-direction
            # second-order autograd passes; the f32 phases only — the bf16
            # bulk phase keeps the XLA stream path (kernels are f32-in).
            # (DRM rides the fused Rayleigh custom_vjp through loss_terms
            # instead — see make_loss_terms above.)
            from ..kernels import fused_linear_residual, residual_coefficients

            coef_fused = residual_coefficients(
                factor.jet(X), a0=1.0, c0=k_squared
            )

            def lag_fn(p_all, key):
                pde, _, g_pde = fused_linear_residual(
                    p_all, X, coef_fused, model.spec.activation
                )

                def aux_loss(p):
                    u = model.apply_batch(p, X)
                    terms = shared_terms(p, u)
                    return sum(w[k] * terms[k] for k in terms), terms

                (aux_tot, terms), g_aux = jax.value_and_grad(
                    aux_loss, has_aux=True
                )(p_all)
                total = w["pde"] * pde + aux_tot
                grads = jax.tree_util.tree_map(
                    lambda a, b: w["pde"] * a + b, g_pde, g_aux
                )
                metrics = {"pde": pde, "drm": jnp.asarray(0.0)}
                metrics.update(terms)
                return (total, metrics), grads

            # fused carries only the exact-f32 phases: plain f32 runs and
            # the f32 tail of 'hybrid'.  A pure-bf16 run keeps the XLA
            # bf16-stream loss the user asked for (kernels are f32-in).
            fused_kw = ({"loss_and_grad_fn": lag_fn}
                        if cfg.compute_dtype != "bfloat16" else {})
        else:
            fused_kw = {}
        if cfg.compute_dtype == "hybrid":
            import numpy as _np

            # f32 tail resumes from the FULL bf16 carry — Adam moments,
            # lr-schedule step and the running best continue across the
            # precision switch (carry structure is dtype-independent)
            bulk = int(cfg.epochs * cfg.hybrid_bf16_fraction)
            lt16 = make_loss_terms("bfloat16")
            r1 = fit(
                lambda p, k: lt16(p), eval_fn, params,
                epochs=bulk, optimizer=optimizer,
                key=jax.random.fold_in(key, 1), chunk=chunk,
                compile_only=compile_only,
            )
            if compile_only:
                return r1
            result = fit(
                loss_fn, eval_fn, params,
                epochs=cfg.epochs - bulk, optimizer=optimizer,
                key=jax.random.fold_in(key, 1), chunk=chunk,
                start_epoch=bulk, init_carry=r1.carry, **fused_kw,
            )
            hist = {k: _np.concatenate([r1.history[k], result.history[k]])
                    for k in result.history}
            result = result._replace(history=hist)
        else:
            result = fit(
                loss_fn, eval_fn, params,
                epochs=seg_epochs, optimizer=optimizer,
                start_epoch=start_epoch, init_carry=init_carry,
                key=jax.random.fold_in(key, 1), chunk=chunk,
                compile_only=compile_only, **fused_kw,
            )
            if compile_only:
                return result
        # ADVICE r4 (low): under segmented training the polish must run
        # exactly once, after the LAST segment — running it per segment
        # would overwrite best tracking with a polish the returned carry
        # doesn't contain, silently diverging from the continuous run.
        if cfg.LBFGS and start_epoch + seg_epochs == cfg.epochs:
            polished, _ = lbfgs_polish(lambda p: loss_terms(p)[0], result.params,
                                       max_iter=500)
            final_m = float(eval_fn(polished, None))
            if final_m < result.best_metric:
                result = result._replace(
                    params=polished, best_params=polished, best_metric=final_m,
                    best_epoch=cfg.epochs,   # the polish runs after the last epoch
                )
            else:
                result = result._replace(params=polished)

    # relative-L2: sqrt(MSE) / rms(psi_exact) — the BASELINE.json metric
    rms_exact = float(jnp.sqrt(jnp.mean(u_exact**2)))
    return {
        "config": dataclasses.asdict(cfg),
        "model": model,
        "result": result,
        "history": result.history,
        "L2_error": float(result.best_metric),
        "rel_l2": float(result.best_metric) ** 0.5 / rms_exact,
        "min_epoch": result.best_epoch,
        "weights": w,
    }
