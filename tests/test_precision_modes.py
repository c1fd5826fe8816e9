"""Precision-mode knob: bf16/hybrid fast paths across all three methods.

Round-1 restricted reduced precision to the Poisson PINN path; round 2
extends it to DRM and WAN (VERDICT.md item 3) and carries the optimizer
state across the hybrid bf16->f32 phase switch instead of silently
re-initialising Adam (ADVICE.md item 1).
"""

import numpy as np

from nnpde_tpu.problems.poisson import PoissonConfig, train_poisson_nd


def _small(method, dtype, **kw):
    return PoissonConfig(
        dim=1, method=method, bc_mode="FBC", epochs=300, chunk=150,
        n_interior=512, n_eval=512, width=32, depth=4,
        compute_dtype=dtype, lr=2e-3, **kw,
    )


def test_bf16_compute_dtype_trains():
    out = train_poisson_nd(_small("PINN", "bfloat16"))
    assert np.all(np.isfinite(out["history"]["l2"]))
    # converges (bf16 noise floor is ~1e-3 RMSE; loose smoke bound here)
    assert out["best_l2"] < 0.1, out["best_l2"]


def test_hybrid_compute_dtype_trains():
    out = train_poisson_nd(_small("PINN", "hybrid", hybrid_bf16_fraction=0.5))
    assert len(out["history"]["l2"]) == 300  # merged bf16+f32 histories
    assert np.all(np.isfinite(out["history"]["l2"]))
    assert out["best_l2"] < 0.1, out["best_l2"]


def test_bf16_drm_trains():
    out = train_poisson_nd(_small("DRM", "bfloat16", resample=True))
    assert np.all(np.isfinite(out["history"]["l2"]))
    assert out["best_l2"] < 0.5, out["best_l2"]


def test_hybrid_drm_trains():
    out = train_poisson_nd(
        _small("DRM", "hybrid", resample=True, hybrid_bf16_fraction=0.5)
    )
    assert len(out["history"]["l2"]) == 300
    assert np.all(np.isfinite(out["history"]["l2"]))


def test_bf16_wan_trains():
    cfg = _small("WAN", "bfloat16")
    cfg.epochs, cfg.chunk = 100, 50
    out = train_poisson_nd(cfg)
    assert np.all(np.isfinite(out["history"]["l2"]))
    assert np.all(np.isfinite(out["history"]["total"]))


def test_hybrid_wan_trains():
    cfg = _small("WAN", "hybrid", hybrid_bf16_fraction=0.5)
    cfg.epochs, cfg.chunk = 100, 50
    out = train_poisson_nd(cfg)
    assert len(out["history"]["l2"]) == 100
    assert np.all(np.isfinite(out["history"]["l2"]))


def test_hybrid_carries_optimizer_state():
    """The f32 tail must resume from the bf16 carry: with a cosine schedule
    the lr at the switch must continue decaying, not restart from peak.
    We check indirectly but deterministically: a hybrid run's f32 tail
    starting from the carried state must match a pure-f32 run resumed from
    the same carry (fit is deterministic given carry + start_epoch)."""
    import jax

    from nnpde_tpu.train import fit, make_optimizer

    def loss_fn(p, k):
        return (p["w"] ** 2).sum(), {}

    def eval_fn(p, k):
        return (p["w"] ** 2).sum()

    params = {"w": np.asarray([1.0, -2.0], np.float32)}
    opt = make_optimizer(1e-1, schedule="cosine", total_steps=40)
    key = jax.random.PRNGKey(0)
    r1 = fit(loss_fn, eval_fn, params, epochs=20, optimizer=opt, key=key,
             chunk=10)
    # resumed tail: must continue the schedule (step 20..39), so it should
    # bit-match the tail of a single 40-epoch run
    r2 = fit(loss_fn, eval_fn, params, epochs=20, optimizer=opt, key=key,
             chunk=10, init_carry=r1.carry, start_epoch=20)
    full = fit(loss_fn, eval_fn, params, epochs=40, optimizer=opt, key=key,
               chunk=10)
    np.testing.assert_allclose(
        np.asarray(r2.params["w"]), np.asarray(full.params["w"]), rtol=1e-6
    )


def test_ipw2d_wan_hybrid_trains():
    """The 2D-well WAN accepts bf16/hybrid compute (VERDICT r2 #7 replaced
    the former ValueError with a measured A/B; this guards the plumbing —
    full carry across the precision switch, concatenated history)."""
    from nnpde_tpu.problems.ipw2d import IPW2DConfig, train_ipw_2d

    for dt in ("bfloat16", "hybrid"):
        out = train_ipw_2d(IPW2DConfig(
            nx=1, ny=1, method="WAN", technique="FN", epochs=20, grid_n=24,
            compute_dtype=dt, chunk=10, minimax="extragradient", v_lr=4e-3,
        ))
        assert len(out["history"]["l2"]) == 20
        assert np.all(np.isfinite(out["history"]["l2"]))


def test_hybrid_kernel_mode_trains():
    """compute_dtype='hybrid-kernel': f32 streams with the Pallas kernel's
    1-pass-bf16 dot mode as the bulk phase, exact-kernel tail (VERDICT r2
    #3).  Interpret mode on CPU; requires PINN + jet_impl='pallas'."""
    import pytest

    out = train_poisson_nd(PoissonConfig(
        dim=2, method="PINN", bc_mode="FBC", epochs=60, n_interior=256,
        chunk=30, compute_dtype="hybrid-kernel", jet_impl="pallas",
        hybrid_bf16_fraction=0.5))
    assert len(out["history"]["l2"]) == 60
    assert np.all(np.isfinite(out["history"]["l2"]))
    with pytest.raises(ValueError, match="hybrid-kernel"):
        train_poisson_nd(PoissonConfig(dim=2, method="DRM",
                                       compute_dtype="hybrid-kernel"))


def test_hybrid_kernel_mode_on_fused_path():
    """'hybrid-kernel' x jet_impl='pallas-fused': the fused kernel carries
    BOTH phases (bf16-dot bulk, f32-dot tail) through the
    loss_and_grad_fn hook."""
    out = train_poisson_nd(PoissonConfig(
        dim=2, method="PINN", bc_mode="FBC", epochs=60, n_interior=256,
        chunk=30, compute_dtype="hybrid-kernel", jet_impl="pallas-fused",
        hybrid_bf16_fraction=0.5))
    assert len(out["history"]["l2"]) == 60
    assert np.all(np.isfinite(out["history"]["l2"]))
