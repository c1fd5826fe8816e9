"""Problem-physics unit tests against analytic / scipy oracles."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special

from nnpde_tpu.ops import batched_value_grad_lap, bump_w, bump_w_1d_jet, BUMP_I1
from nnpde_tpu.pde import ipw, qho, kh


# ----------------------------------------------------------------- Hermite/QHO
@pytest.mark.parametrize("n", range(6))
def test_hermite_matches_scipy(n):
    x = np.linspace(-3, 3, 101)
    # f32 evaluation (device dtype); H_5(3) ~ 3816 so compare in rtol ~ f32 eps
    ours = np.asarray(qho.phys_hermite(n, jnp.asarray(x, jnp.float32)))
    ref = scipy.special.eval_hermite(n, x)
    np.testing.assert_allclose(ours, ref, rtol=3e-5, atol=1e-4)


@pytest.mark.parametrize("n", range(4))
def test_qho_psi_solves_schrodinger(n):
    """-(1/2) psi'' + V psi = E_n psi for the analytic states."""
    X = jnp.linspace(-4.0, 4.0, 200).reshape(-1, 1)
    u, g, lap = batched_value_grad_lap(lambda x: qho.psi_1d(n, x[0]))(X)
    resid = -0.5 * lap + qho.potential_1d(X[:, 0]) * u - qho.energy_1d(n) * u
    assert float(jnp.max(jnp.abs(resid))) < 5e-3


@pytest.mark.parametrize("n", range(1, 6))
def test_qho_nodes_are_zeros(n):
    for node in qho.nodes(n):
        val = float(qho.psi_1d(n, jnp.asarray(node, jnp.float64)))
        assert abs(val) < 1e-5


def test_qho_node_table_matches_reference_values():
    """Computed Hermite roots reproduce the hard-coded reference tables
    (QHO_1D_PINN_DRM.py:114-133)."""
    scale = 2 ** (-1 / 4)
    np.testing.assert_allclose(qho.nodes(1), [0.0], atol=1e-12)
    np.testing.assert_allclose(
        qho.nodes(2), [-(2 ** (-3 / 4)), 2 ** (-3 / 4)], rtol=1e-10
    )
    np.testing.assert_allclose(
        qho.nodes(3),
        [-(2 ** (-3 / 4)) * math.sqrt(3), 0.0, 2 ** (-3 / 4) * math.sqrt(3)],
        rtol=1e-9, atol=1e-12,
    )
    np.testing.assert_allclose(
        qho.nodes(5),
        [
            -scale * math.sqrt((5 + math.sqrt(10)) / 2),
            -scale * math.sqrt((5 - math.sqrt(10)) / 2),
            0.0,
            scale * math.sqrt((5 - math.sqrt(10)) / 2),
            scale * math.sqrt((5 + math.sqrt(10)) / 2),
        ],
        rtol=1e-9, atol=1e-12,
    )


# ------------------------------------------------------------------------- IPW
@pytest.mark.parametrize("n", [1, 3, 5])
def test_ipw_psi_normalised_and_nodes(n):
    L = 2.0
    x = jnp.linspace(0.0, L, 20001)
    psi = ipw.psi_1d(n, x, L)
    integral = float(jnp.trapezoid(psi**2, x))
    assert abs(integral - 1.0) < 1e-3
    for node in ipw.nodes(n, L):
        assert abs(float(ipw.psi_1d(n, jnp.asarray(node), L))) < 1e-5


def test_ipw_energy():
    assert abs(ipw.energy_1d(1, 2.0) - (math.pi**2) / 8.0) < 1e-12
    assert abs(ipw.energy_2d(3, 3, 2.0) - 2 * ipw.energy_1d(3, 2.0)) < 1e-12


# ------------------------------------------------------------------------ bump
def test_bump_value_matches_reference_formula():
    t = jnp.asarray([-0.5, 0.0, 0.5, 0.999, 1.5])
    w, dw, d2w = bump_w_1d_jet(t)
    expected = np.where(
        np.abs(np.asarray(t)) < 1, np.exp(1.0 / (np.asarray(t) ** 2 - 1.0)) / BUMP_I1, 0.0
    )
    np.testing.assert_allclose(np.asarray(w), expected, rtol=1e-5, atol=1e-30)
    assert float(w[-1]) == 0.0 and float(dw[-1]) == 0.0


def test_bump_derivative_matches_autodiff():
    t = jnp.linspace(-0.95, 0.95, 41)
    w, dw, d2w = bump_w_1d_jet(t)
    dw_ad = jax.vmap(jax.grad(lambda s: bump_w_1d_jet(s)[0]))(t)
    d2w_ad = jax.vmap(jax.grad(jax.grad(lambda s: bump_w_1d_jet(s)[0])))(t)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ad), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2w), np.asarray(d2w_ad), rtol=1e-3, atol=1e-4)


def test_bump_nd_product_and_gradient():
    X = jax.random.uniform(jax.random.PRNGKey(0), (32, 3), minval=0.0, maxval=2.0)
    w, dw = bump_w(X, 0.0, 2.0)

    def w_point(x):
        return bump_w(x[None, :], 0.0, 2.0)[0][0]

    w2 = jax.vmap(w_point)(X)
    dw2 = jax.vmap(jax.grad(w_point))(X)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w2), rtol=1e-5, atol=1e-30)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw2), rtol=1e-4, atol=1e-5)


# -------------------------------------------------------------------------- KH
def test_kh_free_particle_eigenvalues():
    """With V=0 the FD solver must return particle-in-a-box energies."""
    x, E, psi = kh.reference_eigensystem(L=10.0, N=2000, alpha=0.0, v0=0.0, k_max=3)
    expected = [((k * math.pi) ** 2) / (2 * (20.0) ** 2) for k in range(1, 4)]
    np.testing.assert_allclose(E, expected, rtol=1e-3)
    # trapezoid-normalised
    dx = x[1] - x[0]
    w = np.ones_like(x); w[0] = w[-1] = 0.5
    for k in range(3):
        assert abs(dx * np.sum(w * psi[:, k] ** 2) - 1.0) < 1e-10


def test_kh_soft_core_ground_state_bound():
    """Soft-core well must produce a negative (bound) ground state."""
    x, E, psi = kh.reference_eigensystem(L=30.0, N=1500, alpha=0.0, k_max=2)
    assert E[0] < 0.0
    assert E[0] < E[1]


def test_kh_cycle_average_reduces_depth():
    """Averaging over the quiver motion shallows the potential minimum."""
    x = np.linspace(-10, 10, 101)
    v0 = kh.v_base(x)
    vavg = kh.v_kh_avg(x, alpha0=10.0)
    assert vavg.min() > v0.min()


def test_kh_groundtruth_resample_device_side():
    gt = kh.KHGroundTruth(alpha=0.0, L=15.0, N=800, n_levels=3)
    x_new = jnp.linspace(-15.0, 15.0, 257)
    xr, vr, psir = gt.resample(x_new)
    assert psir.shape == (257, 3)
    # resampled psi agrees with direct FD at matching resolution
    idx = jnp.argmin(jnp.abs(x_new))
    assert np.isfinite(float(psir[idx, 0]))
    # V matches direct evaluation
    np.testing.assert_allclose(
        np.asarray(vr), np.asarray(kh.v_base(x_new)), rtol=1e-5
    )
