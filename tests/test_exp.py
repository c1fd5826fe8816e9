"""exp layer round-trip tests: runners -> ledger/curves/checkpoints ->
registry reload -> plots -> CSV."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from nnpde_tpu.exp.cli import main as cli_main
from nnpde_tpu.exp.ledger import load_results
from nnpde_tpu.exp.plotting import (
    load_checkpoint_model,
    plot_2d_comparison,
    plot_curves,
    plot_wavefunction_overlay,
)
from nnpde_tpu.exp.results_process import results_to_csv
from nnpde_tpu.exp.run import run_ipw_1d, run_poisson_nd
from nnpde_tpu.pde import ipw
from nnpde_tpu.problems.ipw import IPW1DConfig
from nnpde_tpu.problems.poisson import PoissonConfig


@pytest.fixture(scope="module")
def ipw_run(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ipw"))
    out = run_ipw_1d(
        IPW1DConfig(n=2, method="PINN", technique="FN", epochs=150,
                    layers=(1, 24, 24, 1), chunk=150),
        save_dir=d,
    )
    return d, out


def test_runner_persists_reference_contract(ipw_run):
    d, out = ipw_run
    row = out["row"]
    # reference row schema fields (IPW_1D_PINN_DRM.py:216-237)
    for k in ("method", "n", "epochs", "L2_error", "min_epoch", "technique",
              "weight_pde", "weight_drm", "weight_data", "weight_norm",
              "weight_bc", "weight_orth", "time", "time_of_best_model",
              "best_model_path", "losses", "L2_errors"):
        assert k in row, k
    ledger = load_results(os.path.join(d, "results_IPW_1D.json"))
    assert len(ledger) == 1
    assert os.path.exists(row["losses"]) and os.path.exists(row["L2_errors"])
    curve = np.load(row["L2_errors"])
    assert len(curve) == 150
    assert abs(float(np.min(curve)) - row["L2_error"]) < 1e-10


def test_checkpoint_reloads_via_registry(ipw_run):
    d, out = ipw_run
    model, params, meta = load_checkpoint_model(out["checkpoint"])
    assert meta["problem"] == "ipw_1d" and meta["n"] == 2
    x = jnp.linspace(0.0, 2.0, 101).reshape(-1, 1)
    u = model.apply_batch(params, x)
    # FN trial still enforced after reload: node of psi_2 at x = L/2
    assert abs(float(u[50])) < 1e-5
    # and the reloaded model reproduces the recorded best L2
    ue = ipw.psi_1d(2, x[:, 0], 2.0)
    l2 = float(jnp.mean((model.apply_batch(params, jnp.linspace(0, 2.0, 1000).reshape(-1, 1))
                         - ipw.psi_1d(2, jnp.linspace(0, 2.0, 1000), 2.0)) ** 2))
    assert abs(l2 - out["row"]["L2_error"]) < 1e-6


def test_plot_curves_and_overlay(ipw_run, tmp_path):
    d, out = ipw_run
    entries = load_results(os.path.join(d, "results_IPW_1D.json"))
    paths = plot_curves(entries, str(tmp_path / "curves"))
    assert all(os.path.exists(p) for p in paths)
    x = np.linspace(0, 2.0, 400)
    ue = np.asarray(ipw.psi_1d(2, jnp.asarray(x), 2.0))
    p = plot_wavefunction_overlay(
        out["checkpoint"], x, ue, str(tmp_path / "overlay.png"),
        title="IPW n=2",
    )
    assert os.path.exists(p) and os.path.getsize(p) > 10_000


def test_plot_2d_quad(tmp_path):
    g = np.linspace(0, 2, 40)
    X, Y = np.meshgrid(g, g, indexing="ij")
    Z = np.sin(np.pi * X) * np.sin(np.pi * Y)
    p = plot_2d_comparison(X, Y, Z, Z, str(tmp_path / "quad.png"))
    assert os.path.exists(p)


def test_results_to_csv(ipw_run, tmp_path):
    d, _ = ipw_run
    out_csv = results_to_csv(
        os.path.join(d, "results_IPW_1D.json"), str(tmp_path / "t.csv"),
        require_keys=["layers"],
    )
    lines = open(out_csv).read().strip().splitlines()
    assert lines[0].startswith("method,")
    assert len(lines) == 2


def test_cli_end_to_end(tmp_path, capsys):
    rc = cli_main([
        "ipw1d", "--n", "1", "--method", "DRM", "--technique", "FBC",
        "--epochs", "60", "--chunk", "60",
        "--layers", "1,16,16,1", "--save-dir", str(tmp_path),
    ])
    assert rc == 0
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "L2_error" in printed and os.path.exists(printed["best_model_path"])


def test_cli_poisson(tmp_path, capsys):
    rc = cli_main([
        "poisson", "--dim", "1", "--method", "PINN", "--epochs", "80",
        "--chunk", "80", "--n-interior", "256", "--width", "16",
        "--depth", "3", "--save-dir", str(tmp_path),
    ])
    assert rc == 0
    ledger = load_results(str(tmp_path / "results_poisson_nd.json"))
    assert len(ledger) == 1 and ledger[0]["dim"] == 1


def test_checkpoint_dict_pytree_leaf_integrity(tmp_path):
    """Regression: dict pytrees flatten in sorted-key order; the checkpoint
    spec must match or leaves are silently reassigned (E got a bias vector,
    the first weight got the energy scalar)."""
    import jax.numpy as jnp

    from nnpde_tpu.exp.checkpoint import load_params, save_params

    params = {
        "net": [(jnp.arange(6.0).reshape(2, 3), jnp.array([7.0, 8.0, 9.0]))],
        "E": jnp.asarray(5.0),
    }
    path = save_params(str(tmp_path / "p"), params, meta={"k": 1})
    restored, meta = load_params(path)
    assert float(restored["E"]) == 5.0
    np.testing.assert_array_equal(restored["net"][0][0], np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(restored["net"][0][1], [7.0, 8.0, 9.0])


def test_critic_checkpoint_rebuilds_critic_architecture(tmp_path):
    """WAN critic checkpoints must rebuild with the critic's factor rules
    and v_layers, not the primal's."""
    import glob

    from nnpde_tpu.exp.run import run_ipw_1d_wan
    from nnpde_tpu.problems.ipw import IPW1DWanConfig

    out = run_ipw_1d_wan(
        IPW1DWanConfig(n=2, technique="FN", epochs=10, chunk=10,
                       layers=(1, 16, 1), v_layers=(1, 8, 1), v_steps=1),
        save_dir=str(tmp_path),
    )
    # primal meta must record FN (the trial actually trained)
    model, params, meta = load_checkpoint_model(out["checkpoint"])
    assert meta["technique"] == "FN"
    vckpts = glob.glob(str(tmp_path / "*_best_v.npz"))
    assert len(vckpts) == 1
    v_model, v_params, v_meta = load_checkpoint_model(vckpts[0])
    assert v_meta["role"] == "critic"
    assert v_meta["layers"] == [1, 8, 1]
    # ipw_1d critic is raw: no trial factor, evaluable anywhere
    assert v_model.factor is None
    v = v_model.apply_batch(v_params, jnp.array([[0.5]]))
    assert np.isfinite(float(v[0]))


def test_checkpoint_none_pytree_node(tmp_path):
    from nnpde_tpu.exp.checkpoint import load_params, save_params

    params = {"net": [(jnp.ones((2, 2)), jnp.zeros(2))], "extra": None}
    path = save_params(str(tmp_path / "p"), params)
    restored, _ = load_params(path)
    assert restored["extra"] is None
    np.testing.assert_array_equal(restored["net"][0][0], np.ones((2, 2)))
