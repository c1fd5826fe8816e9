"""Derivative-operator unit tests: generic forward-over-reverse vs analytic,
and the fused forward-Laplacian vs the generic oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpde_tpu.models import (
    NetSpec,
    SolutionModel,
    SeparableFactor,
    factor_for_technique,
    poly_box,
    exp_window,
    nodes_poly,
    product1d,
)
from nnpde_tpu.ops import batched_value_grad_lap
from nnpde_tpu.pde import poisson


def test_laplacian_prod_sin_analytic():
    """lap of prod sin(k pi x / L) = -sum (k pi/L)^2 u  (the manufactured
    Poisson identity, reference Poisson_ND.py:49-58)."""
    L, ks = 2.0, [1, 2, 3]
    d = len(ks)

    def u_fn(x):
        out = 1.0
        for i, k in enumerate(ks):
            out = out * jnp.sin(k * jnp.pi * x[i] / L)
        return out

    X = jax.random.uniform(jax.random.PRNGKey(0), (64, d), minval=0.0, maxval=L)
    u, g, lap = batched_value_grad_lap(u_fn)(X)
    expected = -poisson.rhs_f_for_u_sin(X, L, ks)
    np.testing.assert_allclose(np.asarray(lap), np.asarray(expected), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(u), np.asarray(poisson.exact_u_prod_sin(X, L, ks)), rtol=1e-5, atol=1e-6
    )


FACTORS = {
    "none": lambda d: None,
    "box": lambda d: SeparableFactor([poly_box(2.0)] * d),
    "window": lambda d: SeparableFactor([exp_window(6.0)] * d),
    "box+nodes": lambda d: SeparableFactor(
        [product1d(poly_box(2.0), nodes_poly([0.5, 1.2]))] * d
    ),
}


@pytest.mark.parametrize("activation", ["sin", "tanh"])
@pytest.mark.parametrize("factor_name", list(FACTORS))
@pytest.mark.parametrize("d", [1, 2, 5])
def test_fused_fwdlap_matches_generic(activation, factor_name, d):
    spec = NetSpec(layers=(d, 16, 16, 1), activation=activation)
    model = SolutionModel(spec, FACTORS[factor_name](d))
    params = model.init(jax.random.PRNGKey(1))
    X = jax.random.uniform(jax.random.PRNGKey(2), (32, d), minval=0.1, maxval=1.9)

    fused = model.fields(params, X)
    oracle = model.fields_generic(params, X)
    np.testing.assert_allclose(np.asarray(fused.value), np.asarray(oracle.value), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fused.grad), np.asarray(oracle.grad), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused.lap), np.asarray(oracle.lap), rtol=1e-3, atol=1e-4)


def test_factor_jet_matches_autodiff():
    """Closed-form factor jets vs autodiff of the factor value."""
    fac = SeparableFactor(
        [product1d(poly_box(2.0), nodes_poly([0.4, 1.0, 1.6])), exp_window(2.0)]
    )
    X = jax.random.uniform(jax.random.PRNGKey(3), (16, 2), minval=-1.9, maxval=1.9)
    jet = fac.jet(X)
    u, g, lap = batched_value_grad_lap(fac.value_point)(X)
    np.testing.assert_allclose(np.asarray(jet.value), np.asarray(u), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jet.grad), np.asarray(g), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jet.lap), np.asarray(lap), rtol=1e-3, atol=1e-3)


def test_factor_for_technique_semantics():
    # BC/RAW/RB -> no factor
    assert factor_for_technique("BC", dim=1, kind="box", L=2.0) is None
    assert factor_for_technique("RAW", dim=1, kind="window", L=6.0) is None
    # FBC on [0,L]: vanishes at faces
    fac = factor_for_technique("FBC", dim=2, kind="box", L=2.0)
    X = jnp.array([[0.0, 1.0], [2.0, 1.0], [1.0, 1.0]])
    v = fac.value(X)
    assert abs(float(v[0])) < 1e-6 and abs(float(v[1])) < 1e-6
    assert float(v[2]) != 0.0
    # FN forces interior nodes too
    fac = factor_for_technique(
        "FN", dim=1, kind="box", L=2.0, nodes_per_dim=[[0.5, 1.5]]
    )
    X = jnp.array([[0.5], [1.5], [1.0]])
    v = fac.value(X)
    assert abs(float(v[0])) < 1e-6 and abs(float(v[1])) < 1e-6
    assert float(v[2]) != 0.0


def test_fused_fwdlap_is_differentiable():
    """Reverse-mode through the fused jet (needed for PINN training)."""
    spec = NetSpec(layers=(2, 8, 8, 1), activation="sin")
    model = SolutionModel(spec, SeparableFactor([poly_box(2.0)] * 2))
    params = model.init(jax.random.PRNGKey(4))
    X = jax.random.uniform(jax.random.PRNGKey(5), (16, 2), maxval=2.0)

    def loss(p):
        jet = model.fields(p, X)
        return jnp.mean(jet.lap**2) + jnp.mean(jet.value**2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    assert any(float(jnp.max(jnp.abs(x))) > 0 for x in flat)
