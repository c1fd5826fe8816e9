"""Short-training integration tests for the 1D eigenvalue presets."""

import numpy as np
import pytest

from nnpde_tpu.problems.ipw import (
    IPW1DConfig,
    IPW1DWanConfig,
    train_ipw_1d,
    train_ipw_1d_wan,
)
from nnpde_tpu.problems.qho import (
    QHO1DConfig,
    QHO1DWanConfig,
    train_qho_1d,
    train_qho_1d_wan,
)


# ---------------------------------------------------------------------- IPW
@pytest.mark.parametrize("method,technique,n", [
    ("PINN", "FBC", 2), ("DRM", "FN", 2), ("PINN", "OG", 2),
    # BC (soft penalty, raw net) is the weakest technique — the reason the
    # reference introduced FBC/FN/OG; only the ground state converges fast
    ("DRM", "BC", 1),
])
def test_ipw_1d_methods_converge(method, technique, n):
    out = train_ipw_1d(IPW1DConfig(
        n=n, method=method, technique=technique, epochs=600, chunk=300,
    ))
    # reference layers (1,50,50,50,1); at 3000 epochs PINN/FBC reaches ~1e-4
    assert out["L2_error"] < 0.08, (method, technique, out["L2_error"])
    assert len(out["history"]["l2"]) == 600


def test_ipw_1d_weights_match_reference():
    out = train_ipw_1d(IPW1DConfig(n=1, method="PINN", technique="BC",
                                   epochs=2, chunk=2))
    assert out["weights"] == {
        "data": 10000.0, "bc": 1000.0, "orth": 0.0,
        "pde": 1.0, "drm": 0.0, "norm": 1.0,
    }
    out = train_ipw_1d(IPW1DConfig(n=3, method="DRM", technique="OG",
                                   epochs=2, chunk=2))
    assert out["weights"]["orth"] == 1000.0 and out["weights"]["bc"] == 0.0
    assert out["weights"]["drm"] == 10.0 and out["weights"]["norm"] == 0.0


def test_ipw_1d_rejects_bad_args():
    with pytest.raises(ValueError, match="technique"):
        train_ipw_1d(IPW1DConfig(technique="XX", epochs=1))
    with pytest.raises(ValueError, match="method"):
        train_ipw_1d(IPW1DConfig(method="WAN", epochs=1))


def test_ipw_1d_wan_runs():
    out = train_ipw_1d_wan(IPW1DWanConfig(
        n=1, technique="FBC", epochs=200, chunk=100,
        layers=(1, 32, 32, 1), v_layers=(1, 16, 16, 1), v_steps=3,
    ))
    h = out["history"]
    assert np.all(np.isfinite(h["l2"]))
    assert "wan_loss_v" in h
    assert out["L2_error"] < h["l2"][0]


def test_ipw_1d_wan_fn_variant_weights():
    out = train_ipw_1d_wan(IPW1DWanConfig(
        n=2, technique="FN", epochs=2, chunk=2,
        layers=(1, 16, 1), v_layers=(1, 8, 1), v_steps=1,
    ))
    assert out["weights"] == {
        "data": 0.0, "pde": 10.0, "norm": 1000.0, "bc": 0.0, "orth": 0.0,
    }


# ---------------------------------------------------------------------- QHO
@pytest.mark.parametrize("method,technique", [
    ("PINN", "FN"), ("DRM", "FN"), ("DRM", "OG"),
])
def test_qho_1d_methods_converge(method, technique):
    out = train_qho_1d(QHO1DConfig(
        n=1, method=method, technique=technique,
        epochs=800, layers=(1, 64, 64, 1), chunk=400,
    ))
    assert out["L2_error"] < 0.02, (method, technique, out["L2_error"])


def test_qho_1d_weights_match_reference():
    out = train_qho_1d(QHO1DConfig(n=0, method="PINN", technique="BC",
                                   epochs=2, chunk=2, layers=(1, 8, 1)))
    assert out["weights"] == {
        "orth": 0.0, "data": 1000.0, "bc": 10.0,
        "pde": 10.0, "drm": 0.0, "norm": 10.0,
    }


def test_qho_1d_wan_trainable_energy():
    out = train_qho_1d_wan(QHO1DWanConfig(
        n=0, technique="OG", epochs=300, chunk=150,
        layers=(1, 32, 32, 1), v_layers=(1, 16, 16, 1), v_steps=3,
    ))
    assert np.isfinite(out["E_est"])
    # energy initialised at the exact value and should not run away
    assert abs(out["E_est"] - out["E_exact"]) < 0.5
    assert out["L2_error"] < out["history"]["l2"][0]
    assert "E" in out["history"]


def test_qho_1d_wan_reports_rayleigh_energy():
    """E_rayleigh must be the variational estimate of the best iterate —
    for a short run it is finite and at least as close to E_exact as a
    random init would be; for the EXACT eigenstate the quotient formula
    recovers the exact energy (checked directly on the grid)."""
    import jax.numpy as jnp

    from nnpde_tpu.pde import qho as phys
    from nnpde_tpu.sampling import linspace_grid

    out = train_qho_1d_wan(QHO1DWanConfig(
        n=0, technique="OG", epochs=200, chunk=100,
        layers=(1, 32, 32, 1), v_layers=(1, 16, 16, 1), v_steps=2,
    ))
    assert np.isfinite(out["E_rayleigh"])

    # quotient formula sanity on the exact state (finite-difference grad):
    x = linspace_grid(4001, -6.0, 6.0)[:, 0]
    psi = phys.psi_1d(1, x)
    dpsi = jnp.gradient(psi, x)
    V = phys.potential_1d(x)
    E_ray = float(jnp.mean(0.5 * dpsi**2 + V * psi**2) / jnp.mean(psi**2))
    assert abs(E_ray - phys.energy_1d(1)) < 2e-3
