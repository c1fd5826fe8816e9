"""Short-training integration tests for the 2D eigenvalue presets.

Uses reduced grids (48x48) so CPU CI stays fast; thresholds are loose
smoke-convergence bounds (the full-accuracy runs live in the benchmark
configs)."""

import numpy as np
import pytest

from nnpde_tpu.problems.ipw2d import IPW2DConfig, train_ipw_2d
from nnpde_tpu.problems.qho2d import QHO2DConfig, train_qho_2d


def ipw_cfg(**kw):
    base = dict(nx=1, ny=1, epochs=500, grid_n=48, data_grid_n=20,
                n_boundary=50, chunk=250, layers=(2, 32, 32, 32, 1),
                v_layers=(2, 16, 16, 1), v_steps=2)
    base.update(kw)
    return IPW2DConfig(**base)


def qho_cfg(**kw):
    base = dict(nx=0, ny=0, epochs=500, grid_n=48, data_grid_n=20,
                n_boundary=50, chunk=250, layers=(2, 32, 32, 32, 1),
                v_layers=(2, 16, 16, 1), v_steps=2)
    base.update(kw)
    return QHO2DConfig(**base)


def test_ipw_2d_pinn_fbc_reference_weights_collapse():
    """Faithful reproduction: the reference's PINN weight table (data=0, no
    norm, IPW_2D.py:172-177) admits the trivial u=0 minimiser — pde loss
    goes to ~0 while L2 stays at mean(psi^2) = 0.25."""
    out = train_ipw_2d(ipw_cfg(method="PINN", epochs=300, chunk=150))
    assert out["history"]["pde"][-1] < 1e-4
    assert 0.15 < out["history"]["l2"][-1] < 0.3


def test_ipw_2d_pinn_fbc_with_data():
    out = train_ipw_2d(ipw_cfg(method="PINN", weights={"data": 1e4}))
    assert out["L2_error"] < 0.05, out["L2_error"]


def test_ipw_2d_drm_ground_state():
    """DRM's Rayleigh quotient minimiser is the ground state; the quotient is
    scale-invariant (reference table pins nothing — data=0), so pin the
    amplitude with the optional norm weight."""
    out = train_ipw_2d(ipw_cfg(method="DRM", epochs=800, chunk=400,
                               weights={"norm": 100.0}))
    assert out["L2_error"] < 0.1, out["L2_error"]


def test_ipw_2d_fn_forces_nodal_lines():
    """The FN trial factor enforces nodal lines structurally (any params)."""
    import jax.numpy as jnp
    out = train_ipw_2d(ipw_cfg(nx=2, ny=2, method="DRM", technique="FN",
                               epochs=2, chunk=2))
    # nodes of psi_2 on [0,2]: x = 1.0 — evaluate along that line
    pts = jnp.stack([jnp.full((5,), 1.0), jnp.linspace(0.2, 1.8, 5)], 1)
    u = out["model"].apply_batch(out["result"].params, pts)
    assert float(jnp.max(jnp.abs(u))) < 1e-5


def test_ipw_2d_wan_runs_and_improves():
    """The WAN branch the reference README promises but never implemented
    (SURVEY.md §2.3) — weak form with known E + finite-norm regulariser."""
    out = train_ipw_2d(ipw_cfg(
        method="WAN", technique="FN", nx=2, ny=2, epochs=200, chunk=100,
        v_layers=(2, 16, 16, 1), v_steps=2,
    ))
    h = out["history"]
    assert np.all(np.isfinite(h["l2"]))
    assert "wan_loss_v" in h
    assert out["weights"]["norm"] == 1000.0  # finite-norm regularisation
    assert out["L2_error"] <= h["l2"][0]
    assert "rel_l2" in out


def test_unit_normalize_scale_invariant():
    """eval_selfnorm's core property: u and c*u map to the SAME function,
    and an already-unit-norm field is a fixed point (round-R lever,
    docs/WAN_FLOOR.md)."""
    import jax.numpy as jnp

    from nnpde_tpu.pde import ipw as phys
    from nnpde_tpu.problems.ipw2d import unit_normalize
    from nnpde_tpu.sampling import meshgrid_2d

    L = 1.0
    X = meshgrid_2d(64, 0.0, L)
    psi = phys.psi_2d(3, 3, X[:, 0], X[:, 1], L)
    rms = jnp.sqrt(jnp.mean(psi * psi))
    ref = unit_normalize(psi, rms)
    for c in (1.0, 2.0, 1e-3):
        n = unit_normalize(c * psi, rms)
        assert float(jnp.max(jnp.abs(n - ref))) < 1e-4
    # a sign flip passes through (sign_aware_mse downstream handles it)
    assert float(jnp.max(jnp.abs(unit_normalize(-psi, rms) + ref))) < 1e-4
    # EXACT fixed point under the round-T convention: the target rms is
    # the discrete grid rms of psi itself, so normalising psi is a
    # bit-level no-op up to float rounding — no quadrature bias.  (The
    # old continuum 1/L constant left an O(1/grid_n) bias, larger than
    # the 1e-3 acceptance gate at grid_n=400 — docs/WAN_FLOOR.md round T.)
    assert float(jnp.max(jnp.abs(unit_normalize(psi, rms) - psi))) < 1e-6
    # and a rescaled copy comes back to psi exactly, i.e. the metric
    # sqrt(mean((unit_normalize(u) - psi)^2)) is zero for u = c*psi
    assert float(jnp.max(jnp.abs(unit_normalize(7.3 * psi, rms) - psi))) < 1e-5


def test_ipw_2d_wan_selfnorm_eval_runs():
    """The scale-free eval path compiles and tracks a finite history."""
    out = train_ipw_2d(ipw_cfg(
        method="WAN", technique="FN", nx=2, ny=2, epochs=120, chunk=60,
        grid_jitter=True, eval_selfnorm=True,
        v_layers=(2, 16, 16, 1), v_steps=2,
    ))
    h = out["history"]
    assert np.all(np.isfinite(h["l2"]))
    assert "rel_l2" in out


def test_ipw_2d_weights():
    out = train_ipw_2d(ipw_cfg(method="DRM", technique="OG", epochs=2, chunk=2))
    w = out["weights"]
    assert w["drm"] == 100.0 and w["orth"] == 10000.0 and w["bc"] == 10000.0
    assert w["data"] == 0.0


def test_qho_2d_pinn_fbc():
    out = train_qho_2d(qho_cfg(method="PINN"))
    assert out["L2_error"] < 0.01, out["L2_error"]


def test_qho_2d_drm():
    out = train_qho_2d(qho_cfg(method="DRM", epochs=800, chunk=400))
    assert out["L2_error"] < 0.05, out["L2_error"]


def test_qho_2d_wan_runs():
    out = train_qho_2d(qho_cfg(method="WAN", epochs=200, chunk=100))
    assert np.all(np.isfinite(out["history"]["l2"]))
    assert out["L2_error"] < out["history"]["l2"][0]


def test_qho_2d_trainable_energy():
    out = train_qho_2d(qho_cfg(
        method="PINN", technique="FN", trainable_energy=True,
        energy_variant=True, nx=1, ny=0, epochs=400, chunk=200,
    ))
    assert np.isfinite(out["learned_energy"])
    assert abs(out["learned_energy"] - out["E_exact"]) < 0.5
    assert "E" in out["history"]
    # energy-variant weight table: parity/symmetry weighted 1000, bc dropped
    assert out["weights"]["parity"] == 1000.0
    assert out["weights"]["bc"] == 0.0


def test_qho_2d_symmetry_loss_active_only_when_equal():
    out = train_qho_2d(qho_cfg(nx=1, ny=0, epochs=2, chunk=2))
    assert np.all(out["history"]["symmetry"] == 0.0)
    out = train_qho_2d(qho_cfg(nx=1, ny=1, epochs=2, chunk=2))
    assert out["history"]["symmetry"][-1] >= 0.0


def test_qho_2d_trainable_energy_rejected_for_drm_wan():
    import pytest

    for method in ("DRM", "WAN"):
        with pytest.raises(ValueError, match="trainable_energy"):
            train_qho_2d(qho_cfg(method=method, trainable_energy=True,
                                 epochs=1, chunk=1))
