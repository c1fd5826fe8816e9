"""Sweep drivers: tiny-scale smoke runs writing a shared ledger."""

import os

from nnpde_tpu.exp.ledger import load_results
from nnpde_tpu.exp.sweeps import (
    WAN_FN_U_LAYERS,
    WAN_FN_V_LAYERS,
    sweep_ipw_1d,
    sweep_ipw_wan_fn_ablation,
    sweep_poisson,
    sweep_qho_2d_energy,
)


def test_ablation_grids_match_reference():
    assert len(WAN_FN_U_LAYERS) == 12 and len(WAN_FN_V_LAYERS) == 12
    assert WAN_FN_U_LAYERS[0] == (1, 10, 1)
    assert WAN_FN_V_LAYERS[-1] == (1, 50, 50, 50, 50, 1)


def test_sweep_ipw_1d(tmp_path):
    rows = sweep_ipw_1d(
        [1], epochs=10, chunk=10, layers=(1, 8, 1), save_dir=str(tmp_path)
    )
    assert len(rows) == 8  # {PINN,DRM} x {BC,FBC,FN,OG}
    assert len(load_results(str(tmp_path / "results_IPW_1D.json"))) == 8
    combos = {(r["method"], r["technique"]) for r in rows}
    assert ("PINN", "BC") in combos and ("DRM", "OG") in combos


def test_sweep_poisson(tmp_path):
    rows = sweep_poisson(
        dims=[1], methods=["PINN"], epochs=10, chunk=10,
        n_interior=64, width=8, depth=3, n_eval=64, save_dir=str(tmp_path),
    )
    assert len(rows) == 1
    assert rows[0]["dim"] == 1


def test_sweep_wan_fn_ablation(tmp_path):
    rows = sweep_ipw_wan_fn_ablation(
        n=2, epochs=5, chunk=5, pairs=[0, 4], save_dir=str(tmp_path)
    )
    assert len(rows) == 2
    assert rows[0]["layers"] == [1, 10, 1]
    assert rows[1]["v_layers"] == [1, 20, 1]
    # ablation table fields available for results_process --require layers
    assert all("layers" in r for r in rows)


def test_sweep_qho2d_energy_shape(tmp_path):
    rows = sweep_qho_2d_energy(
        n_values=[(0, 0)], epochs=4, chunk=4, grid_n=16, data_grid_n=8,
        n_boundary=8, layers=(2, 8, 8, 1), v_layers=(2, 8, 1),
        save_dir=str(tmp_path),
    )
    # PINN x {FBC,FN} + DRM x {FN,OG} + WAN x {FN,OG}
    assert len(rows) == 6
    assert {r["technique"] for r in rows} == {"FBC", "FN", "OG"}
    assert all("learned_energy" in r for r in rows)


def test_sweep_kh_alpha(tmp_path):
    from nnpde_tpu.exp.sweeps import sweep_kh_alpha

    rows = sweep_kh_alpha(
        alphas=[0.0, 5.0], n_max=1, epochs=10,
        L=15.0, n_ref=300, train_n=128, layers=(1, 8, 8, 1),
        v_layers=(1, 8, 1), methods=("PINN",),
        save_dir=str(tmp_path), chunk=10,
    )
    assert len(rows) == 2
    assert {r["alpha"] for r in rows} == {0.0, 5.0}
    import os
    assert os.path.exists(str(tmp_path / "results_KH_1D_alpha0.0.json"))


def test_top_level_api():
    import nnpde_tpu

    for name in ("PoissonConfig", "train_poisson_nd", "IPW2DConfig",
                 "QHO2DConfig", "KHCompareConfig", "run_compare",
                 "KHGroundTruth"):
        assert hasattr(nnpde_tpu, name), name
