"""Precision-mode knob: bf16 fast path trains and stays finite."""

import numpy as np

from nnpde_tpu.problems.poisson import PoissonConfig, train_poisson_nd


def test_bf16_compute_dtype_trains():
    out = train_poisson_nd(PoissonConfig(
        dim=1, method="PINN", bc_mode="FBC", epochs=300, chunk=150,
        n_interior=512, n_eval=512, width=32, depth=4,
        compute_dtype="bfloat16", lr=2e-3,
    ))
    assert np.all(np.isfinite(out["history"]["l2"]))
    # converges (bf16 noise floor is ~1e-3 RMSE; loose smoke bound here)
    assert out["best_l2"] < 0.1, out["best_l2"]


def test_hybrid_compute_dtype_trains():
    out = train_poisson_nd(PoissonConfig(
        dim=1, method="PINN", bc_mode="FBC", epochs=200, chunk=100,
        n_interior=512, n_eval=512, width=32, depth=4,
        compute_dtype="hybrid", hybrid_bf16_fraction=0.5, lr=2e-3,
    ))
    assert len(out["history"]["l2"]) == 200  # merged bf16+f32 histories
    assert np.all(np.isfinite(out["history"]["l2"]))
    assert out["best_l2"] < 0.1, out["best_l2"]


def test_reduced_precision_rejected_for_drm():
    import pytest

    with pytest.raises(ValueError, match="PINN"):
        train_poisson_nd(PoissonConfig(method="DRM", compute_dtype="hybrid",
                                       epochs=1))
