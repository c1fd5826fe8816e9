"""KH unified-benchmark integration tests (small GT + short trainings)."""

import numpy as np
import pytest

from nnpde_tpu.pde import kh as phys
from nnpde_tpu.problems.kh import KHCompareConfig, KHConfig, run_compare, train_kh


@pytest.fixture(scope="module")
def gt_small():
    # field-free atom on a modest box: fast FD solve, bound ground state
    return phys.KHGroundTruth(alpha=0.0, L=20.0, N=1200, n_levels=4)


def test_kh_pinn_ground_state(gt_small):
    out = train_kh(
        KHConfig(method="PINN", n=0, technique="FBC", epochs=1500,
                 layers=(1, 48, 48, 1), train_n=512, chunk=750,
                 lambda_pde=10.0, lambda_data=1e4, lambda_norm=10.0,
                 data_fraction=0.5, max_data_points=500),
        gt_small,
    )
    # data must cover the wavefunction support: with the defaults' left-tail
    # quarter the trainable-E PINN drifts to a spurious free state (the
    # reference's demo likewise uses data_fraction=0.5, KH_1D.py:633)
    assert out["L2"] < 5e-3, out["L2"]
    assert abs(out["E_est"] - out["E_ref"]) < 0.05
    assert len(out["E_track"]) == 1500


def test_kh_drm_tracks_rayleigh(gt_small):
    out = train_kh(
        KHConfig(method="DRM", n=0, technique="FBC", epochs=800,
                 layers=(1, 48, 48, 1), train_n=512, chunk=400,
                 lambda_pde=10.0, lambda_data=1e4, lambda_norm=10.0,
                 data_fraction=0.5, max_data_points=500),
        gt_small,
    )
    assert out["L2"] < 2e-2, out["L2"]
    # DRM's energy estimate is the tracked Rayleigh quotient
    assert abs(out["E_est"] - out["E_ref"]) < 0.5


def test_kh_wan_runs(gt_small):
    out = train_kh(
        KHConfig(method="WAN", n=0, epochs=300, layers=(1, 32, 32, 1),
                 v_layers=(1, 16, 16, 1), v_steps=2, train_n=512, chunk=150),
        gt_small,
    )
    assert np.all(np.isfinite(out["history"]["l2"]))
    assert out["L2"] < out["history"]["l2"][0]


def test_kh_excited_state_orthogonality(gt_small):
    out = train_kh(
        KHConfig(method="PINN", n=1, technique="FBC", epochs=800,
                 layers=(1, 48, 48, 1), train_n=512, chunk=400,
                 lambda_pde=10.0, lambda_data=1e4, lambda_norm=10.0,
                 data_fraction=0.5, max_data_points=500),
        gt_small,
    )
    # sign-aware L2 well below trivial level; orth term active
    assert out["L2"] < 5e-2, out["L2"]
    assert np.any(out["history"]["orth"] > 0)


def test_run_compare_ledger(tmp_path):
    cfg = KHCompareConfig(
        alpha=0.0, L=20.0, n_ref=800, n_max=1, epochs=60,
        layers=(1, 16, 16, 1), v_layers=(1, 8, 8, 1), train_n=256,
        methods=("PINN", "DRM"), save_dir=str(tmp_path), chunk=60,
    )
    rows = run_compare(cfg)
    assert len(rows) == 2
    for row in rows:
        assert {"E_ref", "E_est", "L2_error_dense", "elapsed_time_sec"} <= set(row)
    # ledger written and loadable
    from nnpde_tpu.exp import load_results
    ledger = load_results(str(tmp_path / cfg.results_filename))
    assert len(ledger) == 2
    # curves + checkpoint exist
    import os
    assert os.path.exists(rows[0]["losses_npy"])
    from nnpde_tpu.exp import load_params
    params, meta = load_params(rows[0]["model_path"])
    assert meta["n"] == 0 and "E" in params
