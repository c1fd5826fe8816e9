"""Floquet extension tests: multi-channel jets and the time-periodic KH
quasi-energy physics (the reference's README names the time-dependent KH
problem as future work — /root/reference/README.md; KH_1D.py:32-39 only ever
solves the cycle-averaged limit, which is the M=0 row here)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpde_tpu.models import NetSpec, factor_for_technique
from nnpde_tpu.models.mlp import init_mlp, _resolve_activation
from nnpde_tpu.ops.fwdlap import (
    compose_product_jet_channels,
    mlp_fwdlap_channels,
)
from nnpde_tpu.pde import kh as phys


def _channel_oracle(params, activation):
    act = _resolve_activation(activation)

    def f(x):
        h = x
        for (W, b) in params[:-1]:
            h = act(h @ W + b)
        W, b = params[-1]
        return h @ W + b

    return f


@pytest.mark.parametrize("activation,d,c", [("sin", 1, 6), ("tanh", 2, 5)])
def test_channel_jet_matches_autodiff(activation, d, c):
    spec = NetSpec((d, 16, 16, c), activation=activation)
    params = init_mlp(jax.random.PRNGKey(0), spec)
    X = jax.random.uniform(jax.random.PRNGKey(1), (9, d), minval=-1.5, maxval=1.5)
    jet = mlp_fwdlap_channels(params, X, activation)
    f = _channel_oracle(params, activation)
    val = jax.vmap(f)(X)
    grad = jax.vmap(jax.jacfwd(f))(X).transpose(0, 2, 1)     # (N, d, C)
    lap = jnp.trace(jax.vmap(jax.hessian(f))(X), axis1=2, axis2=3)
    np.testing.assert_allclose(jet.value, val, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(jet.grad, grad, rtol=1e-4, atol=1e-4)
    scale = float(jnp.abs(lap).max()) + 1e-6
    np.testing.assert_allclose(
        np.asarray(jet.lap) / scale, np.asarray(lap) / scale, atol=5e-4
    )


def test_channel_product_jet_matches_autodiff():
    spec = NetSpec((1, 16, 16, 4), activation="sin")
    params = init_mlp(jax.random.PRNGKey(2), spec)
    fac = factor_for_technique("FBC", dim=1, kind="window", L=2.0)
    X = jax.random.uniform(jax.random.PRNGKey(3), (7, 1), minval=-1.9, maxval=1.9)
    jet = compose_product_jet_channels(
        mlp_fwdlap_channels(params, X, "sin"), fac.jet(X)
    )
    raw = _channel_oracle(params, "sin")

    def g(x):
        return raw(x) * fac.value_point(x)

    val = jax.vmap(g)(X)
    grad = jax.vmap(jax.jacfwd(g))(X).transpose(0, 2, 1)
    lap = jnp.trace(jax.vmap(jax.hessian(g))(X), axis1=2, axis2=3)
    np.testing.assert_allclose(jet.value, val, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(jet.grad, grad, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(jet.lap, lap, rtol=3e-3, atol=3e-3)


# ------------------------------------------------------------------ physics
def test_fourier_components_symmetries():
    """c_0 == cycle average; even j real, odd j imaginary (th -> pi - th)."""
    x = np.linspace(-20, 20, 101)
    cr, ci = phys.v_fourier_components(x, alpha0=6.0, j_max=4, n_theta=256)
    # j = 0 is the averaged KH potential.  v_kh_avg keeps the reference's
    # endpoint-inclusive theta grid (KH_1D.py:35) which double-counts
    # theta = 0 == 2pi — an O(1/n_theta) bias, so agreement is limited to
    # ~2.5e-4 at n_theta=4001 even though the periodic grid is spectral.
    vbar = phys.v_kh_avg(x, alpha0=6.0, n_theta=4001)
    np.testing.assert_allclose(cr[0], vbar, rtol=6e-4, atol=2e-7)
    assert np.abs(ci[0]).max() < 1e-12
    assert np.abs(ci[2]).max() < 1e-12          # even j: real
    assert np.abs(cr[1]).max() < 1e-12          # odd j: imaginary
    assert np.abs(cr[3]).max() < 1e-12


def test_floquet_m0_equals_cycle_average():
    x, eps, Phi = phys.floquet_eigensystem(
        L=30, N=600, alpha=6.0, omega=3.0, M=0, k_max=2, n_theta=256
    )
    _, E, psi = phys.reference_eigensystem(
        L=30, N=600, alpha=6.0, k_max=2, use_avg=True, n_theta=256
    )
    np.testing.assert_allclose(eps, E[: len(eps)], atol=5e-5)
    # eigenfunctions match up to phase
    for k in range(len(eps)):
        ov = abs(np.trapezoid(psi[:, k] * Phi[:, 0, k].conj(), x))
        assert ov > 0.999


def test_floquet_sidebands_regime():
    """In the slow-drive regime the quasi-energy measurably departs from
    the cycle average and the sidebands carry real weight — the physics
    the reference's averaged solver cannot represent."""
    x, eps, Phi = phys.floquet_eigensystem(
        L=30, N=800, alpha=2.0, omega=0.3, M=3, k_max=1, n_theta=256
    )
    _, E, _ = phys.reference_eigensystem(
        L=30, N=800, alpha=2.0, k_max=1, use_avg=True, n_theta=256
    )
    dx = x[1] - x[0]
    w = np.ones(len(x))
    w[0] = w[-1] = 0.5
    wts = dx * np.einsum("x,xm->m", w, np.abs(Phi[:, :, 0]) ** 2)
    sideband = 1.0 - wts[3]
    assert sideband > 0.01                      # >1% weight off m = 0
    assert abs(eps[0] - E[0]) > 3e-4            # resolvable eps shift
    np.testing.assert_allclose(wts.sum(), 1.0, atol=1e-8)


# ----------------------------------------------------------- solution model
def test_channel_solution_model_fields_vs_generic():
    from nnpde_tpu.models import ChannelSolutionModel

    model = ChannelSolutionModel(
        NetSpec((1, 16, 16, 6), activation="sin"),
        factor_for_technique("FBC", dim=1, kind="window", L=3.0),
    )
    params = model.init(jax.random.PRNGKey(4))
    X = jax.random.uniform(jax.random.PRNGKey(5), (11, 1), minval=-2.5, maxval=2.5)
    jet = model.fields(params, X)
    oracle = model.fields_generic(params, X)
    np.testing.assert_allclose(jet.value, oracle.value, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(jet.grad, oracle.grad, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(jet.lap, oracle.lap, rtol=3e-3, atol=1e-4)
    # apply_batch consistent with fields.value
    np.testing.assert_allclose(
        model.apply_batch(params, X), jet.value, rtol=1e-6, atol=1e-7
    )


def test_channel_solution_model_dim_mismatch():
    from nnpde_tpu.models import ChannelSolutionModel

    with pytest.raises(ValueError):
        ChannelSolutionModel(
            NetSpec((2, 8, 4), activation="sin"),
            factor_for_technique("FBC", dim=1, kind="window", L=1.0),
        )


# --------------------------------------------------------------- end-to-end
def test_floquet_pinn_short_training_converges():
    """Short-budget neural Floquet solve: the loss machinery must pull the
    phase-aware error down ~two orders and keep the trainable quasi-energy
    near the FD value (full-accuracy runs live in ACCEPTANCE.json)."""
    from nnpde_tpu.problems import KHFloquetConfig, train_kh_floquet

    cfg = KHFloquetConfig(
        epochs=1200, chunk=400, train_n=384, n_ref=800, M=2, seed=0
    )
    out = train_kh_floquet(cfg)
    h = out["history"]
    assert float(h["l2"][-1]) < 0.05 * float(h["l2"][0])
    assert out["rel_l2"] < 0.2
    assert abs(out["eps_est"] - out["eps_ref"]) < 5e-3
    w = np.asarray(out["harmonic_weights"])
    assert w[cfg.M] > 0.5                        # m = 0 dominates
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-6)
