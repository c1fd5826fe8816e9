"""Fused loss+grad kernel vs the XLA autodiff oracle.

The fused kernel computes ``w * mean(r^2)`` (r linear in the net jet) and
its parameter gradients in one pass; the oracle builds the same loss from
:func:`nnpde_tpu.ops.fwdlap.mlp_fwdlap` and differentiates with
``jax.value_and_grad``.  Interpreter mode off-TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpde_tpu.kernels.fused_step import (
    fused_linear_residual,
    residual_coefficients,
)
from nnpde_tpu.models import NetSpec, SolutionModel, factor_for_technique
from nnpde_tpu.ops.fwdlap import mlp_fwdlap


def _rand_coef(key, N, d):
    return jax.random.normal(key, (N, d + 4), jnp.float32)


def _oracle(params, X, coef, activation, weight):
    d = X.shape[1]
    jet = mlp_fwdlap(params, X, activation)
    r = (coef[:, 0] * jet.value
         + jnp.sum(coef[:, 1:1 + d] * jet.grad, axis=1)
         + coef[:, d + 1] * jet.lap
         + coef[:, d + 2])
    return weight * jnp.mean(r ** 2)


def _tree_rel_err(a, b):
    num = sum(float(jnp.sum((x - y) ** 2))
              for x, y in zip(jax.tree_util.tree_leaves(a),
                              jax.tree_util.tree_leaves(b)))
    den = sum(float(jnp.sum(y ** 2)) for y in jax.tree_util.tree_leaves(b))
    return (num / max(den, 1e-30)) ** 0.5


@pytest.mark.parametrize("d,width,act,lane_pack", [
    (1, 16, "sin", 1),
    (2, 16, "tanh", 1),
    (2, 16, "sin", 2),
    (3, 32, "sin", 2),
    (5, 16, "sin", 1),
    (7, 16, "sin", 2),   # no input-dim cap (unlike the pallas2 forward)
    (10, 16, "sin", 1),  # d = 2x the reference's max dimension
])
def test_fused_matches_oracle(d, width, act, lane_pack):
    key = jax.random.PRNGKey(d * 131 + width)
    spec = NetSpec((d, width, width, width, 1), activation=act)
    model = SolutionModel(spec)
    params = model.init(key)
    N = 300                                  # non-multiple of tile -> pads
    X = jax.random.uniform(jax.random.fold_in(key, 1), (N, d), maxval=1.5)
    coef = _rand_coef(jax.random.fold_in(key, 2), N, d)
    w = 7.0

    loss, aux, grads = fused_linear_residual(
        params, X, coef, act, weight=w, bwd_tile=128, lane_pack=lane_pack,
        interpret=True,
    )
    loss_o, grads_o = jax.value_and_grad(_oracle)(params, X, coef, act, w)
    assert np.isfinite(float(loss))
    assert abs(float(loss) - float(loss_o)) <= 1e-5 * max(
        abs(float(loss_o)), 1e-8)
    assert _tree_rel_err(grads, grads_o) <= 1e-5
    assert aux["n"] == N


def test_extra_output_lane_accumulates_r_u():
    """Lane e: sum r*e*value (the trainable-E gradient seed)."""
    d, width, act = 2, 16, "sin"
    key = jax.random.PRNGKey(0)
    model = SolutionModel(NetSpec((d, width, width, 1), activation=act))
    params = model.init(key)
    N = 200
    X = jax.random.uniform(jax.random.fold_in(key, 1), (N, d), maxval=1.0)
    coef = _rand_coef(jax.random.fold_in(key, 2), N, d)

    _, aux, _ = fused_linear_residual(
        params, X, coef, act, bwd_tile=128, interpret=True)
    jet = mlp_fwdlap(params, X, act)
    r = (coef[:, 0] * jet.value
         + jnp.sum(coef[:, 1:1 + d] * jet.grad, axis=1)
         + coef[:, d + 1] * jet.lap + coef[:, d + 2])
    want = float(jnp.sum(r * coef[:, d + 3] * jet.value))
    assert abs(float(aux["sum_r_ufull"]) - want) <= 1e-4 * max(
        abs(want), 1e-6)


@pytest.mark.parametrize("op", ["poisson", "helmholtz", "schrodinger"])
def test_residual_coefficients_match_full_solution(op):
    """coef built from the factor jet reproduces the composed-solution
    residual: r == a0*lap(B*net) + b0.grad(B*net) + c0*(B*net) + rhs."""
    d, L = 2, 2.0
    key = jax.random.PRNGKey(3)
    model = SolutionModel(
        NetSpec((d, 16, 16, 1), activation="sin"),
        factor_for_technique("FBC", dim=d, kind="box", L=L),
    )
    params = model.init(key)
    N = 150
    X = jax.random.uniform(jax.random.fold_in(key, 1), (N, d), maxval=L)
    fj = model.factor.jet(X)
    if op == "poisson":                       # -lap u - f  (Poisson_ND.py:91)
        rhs = jnp.sin(X[:, 0])
        coef = residual_coefficients(fj, a0=-1.0, rhs=-rhs)
        a0, b0, c0 = -1.0, None, None
    elif op == "helmholtz":                   # lap u + k^2 u
        coef = residual_coefficients(fj, a0=1.0, c0=4.0)
        a0, b0, c0, rhs = 1.0, None, 4.0, None
    else:                                     # -1/2 lap u + (V-E) u
        V = 0.5 * jnp.sum(X ** 2, axis=1)
        coef = residual_coefficients(fj, a0=-0.5, c0=V - 1.5, e_lane=True)
        a0, b0, c0, rhs = -0.5, None, V - 1.5, None

    loss, _, grads = fused_linear_residual(
        params, X, coef, "sin", weight=3.0, bwd_tile=128, interpret=True)

    def oracle(p):
        jet = model.fields(p, X)              # composed B*net jet
        r = a0 * jet.lap
        if c0 is not None:
            r = r + c0 * jet.value
        if op == "poisson":
            r = r - jnp.sin(X[:, 0])
        return 3.0 * jnp.mean(r ** 2)

    loss_o, grads_o = jax.value_and_grad(oracle)(params)
    assert abs(float(loss) - float(loss_o)) <= 1e-5 * max(
        abs(float(loss_o)), 1e-8)
    assert _tree_rel_err(grads, grads_o) <= 1e-5


def test_poisson_trains_with_fused_step():
    """jet_impl='pallas-fused' (one-pass fused loss+grad kernel, interpret
    mode on CPU) must train the 1D Poisson PINN like the XLA path — same
    loss definition, same optimizer trajectory up to fp ordering."""
    from nnpde_tpu.problems.poisson import PoissonConfig, train_poisson_nd

    base = dict(dim=1, epochs=150, n_interior=256, chunk=75,
                width=16, depth=3, seed=0)
    a = train_poisson_nd(PoissonConfig(jet_impl="xla", **base))
    b = train_poisson_nd(PoissonConfig(jet_impl="pallas-fused", **base))
    assert np.isfinite(b["rel_l2"])
    assert b["rel_l2"] < 2.0 * a["rel_l2"] + 1e-3
    # same loss definition: first-epoch totals agree tightly
    np.testing.assert_allclose(b["history"]["total"][0],
                               a["history"]["total"][0], rtol=1e-4)


def test_qho2d_fused_matches_xla_including_trainable_E():
    """QHO-2D PINN with jet_impl='pallas-fused': same first-epoch loss as
    the XLA path and a correct in-kernel dL/dE (extra-output lane)."""
    from nnpde_tpu.problems.qho2d import QHO2DConfig, train_qho_2d

    base = dict(nx=1, ny=0, epochs=40, grid_n=24, data_grid_n=8,
                n_boundary=16, layers=(2, 16, 16, 1), chunk=20,
                trainable_energy=True, energy_variant=True, seed=0)
    a = train_qho_2d(QHO2DConfig(jet_impl="xla", **base))
    b = train_qho_2d(QHO2DConfig(jet_impl="pallas-fused", **base))
    np.testing.assert_allclose(b["history"]["total"][0],
                               a["history"]["total"][0], rtol=1e-4)
    np.testing.assert_allclose(b["history"]["E"], a["history"]["E"],
                               rtol=1e-3)
    assert np.isfinite(b["L2_error"])


def test_qho2d_fused_rejects_bad_impl():
    from nnpde_tpu.problems.qho2d import QHO2DConfig, train_qho_2d

    with pytest.raises(ValueError, match="jet_impl"):
        train_qho_2d(QHO2DConfig(method="DRM", jet_impl="nope"))


def test_ipw2d_fused_matches_xla():
    """IPW-2D PINN (Helmholtz residual) with jet_impl='pallas-fused'."""
    from nnpde_tpu.problems.ipw2d import IPW2DConfig, train_ipw_2d

    base = dict(nx=1, ny=1, epochs=40, grid_n=24, data_grid_n=8,
                n_boundary=16, layers=(2, 16, 16, 1), chunk=20,
                weights={"data": 1e4}, seed=0)
    a = train_ipw_2d(IPW2DConfig(jet_impl="xla", **base))
    b = train_ipw_2d(IPW2DConfig(jet_impl="pallas-fused", **base))
    np.testing.assert_allclose(b["history"]["total"][0],
                               a["history"]["total"][0], rtol=1e-4)
    assert np.isfinite(b["rel_l2"])


@pytest.mark.parametrize("lane_pack,technique", [(1, "FBC"), (2, "FBC"),
                                                 (2, "RB")])
def test_fused_drm_energy_matches_oracle(lane_pack, technique):
    """DRM Poisson energy kernel vs autodiff of mean(1/2|grad u|^2 - f u)
    on the composed solution u = B*net (B = 1 for RB/raw)."""
    from nnpde_tpu.kernels import drm_coefficients, fused_drm_energy
    from nnpde_tpu.ops.fwdlap import constant_jet

    d, L = 2, 2.0
    key = jax.random.PRNGKey(11)
    factor = (factor_for_technique("FBC", dim=d, kind="box", L=L)
              if technique == "FBC" else None)
    model = SolutionModel(NetSpec((d, 16, 16, 16, 1), activation="sin"),
                          factor)
    params = model.init(key)
    N = 300
    X = jax.random.uniform(jax.random.fold_in(key, 1), (N, d), maxval=L)
    f = jnp.sin(2.0 * X[:, 0]) * jnp.cos(X[:, 1])
    fj = (model.factor.jet(X) if model.factor is not None
          else constant_jet(jnp.ones(N, X.dtype), d))
    coef = drm_coefficients(fj, f)

    loss, aux, grads = fused_drm_energy(
        params, X, coef, "sin", weight=5.0, bwd_tile=128,
        lane_pack=lane_pack, interpret=True)

    def oracle(p):
        u, g = model.value_and_grad(p, X)
        return 5.0 * jnp.mean(0.5 * jnp.sum(g * g, axis=1) - f * u)

    loss_o, grads_o = jax.value_and_grad(oracle)(params)
    assert abs(float(loss) - float(loss_o)) <= 1e-5 * max(
        abs(float(loss_o)), 1e-8)
    assert _tree_rel_err(grads, grads_o) <= 1e-5
    assert aux["n"] == N


def test_poisson_d10_trains_on_fused_path():
    """d=10 Poisson PINN end-to-end on the fused kernel — twice the
    reference's maximum dimension (Poisson_ND.py supports d<=5); the
    packed jet-forward kernel caps at d<=6, the fused kernel does not."""
    from nnpde_tpu.problems.poisson import PoissonConfig, train_poisson_nd

    out = train_poisson_nd(PoissonConfig(
        dim=10, method="PINN", epochs=60, n_interior=512, chunk=30,
        width=16, depth=3, resample=True, jet_impl="pallas-fused", seed=0))
    assert np.isfinite(out["rel_l2"])
    assert out["history"]["total"].shape == (60,)


def test_poisson_drm_trains_with_fused_energy():
    """method='DRM' + jet_impl='pallas-fused' rides the fused energy
    kernel (incl. per-epoch QMC resampling, the acceptance 5D config's
    machinery): same first-epoch total as the XLA path."""
    from nnpde_tpu.problems.poisson import PoissonConfig, train_poisson_nd

    base = dict(dim=2, method="DRM", epochs=100, n_interior=256, chunk=50,
                width=16, depth=3, resample=True, sampler="sobol",
                weights={"norm": 1.0}, seed=0)
    a = train_poisson_nd(PoissonConfig(jet_impl="xla", **base))
    b = train_poisson_nd(PoissonConfig(jet_impl="pallas-fused", **base))
    np.testing.assert_allclose(b["history"]["total"][0],
                               a["history"]["total"][0], rtol=1e-4)
    assert np.isfinite(b["rel_l2"])


def test_ipw1d_qho1d_fused_match_xla():
    """1D presets on the fused path: same first-epoch total as XLA."""
    from nnpde_tpu.problems.ipw import IPW1DConfig, train_ipw_1d
    from nnpde_tpu.problems.qho import QHO1DConfig, train_qho_1d

    ib = dict(n=2, method="PINN", technique="BC", epochs=30, grid_n=200,
              layers=(1, 16, 16, 1), chunk=15, seed=0)
    a = train_ipw_1d(IPW1DConfig(jet_impl="xla", **ib))
    b = train_ipw_1d(IPW1DConfig(jet_impl="pallas-fused", **ib))
    np.testing.assert_allclose(b["history"]["total"][0],
                               a["history"]["total"][0], rtol=1e-4)

    qb = dict(n=1, method="PINN", technique="FN", epochs=30, grid_n=200,
              layers=(1, 16, 16, 1), chunk=15, seed=0)
    a = train_qho_1d(QHO1DConfig(jet_impl="xla", **qb))
    b = train_qho_1d(QHO1DConfig(jet_impl="pallas-fused", **qb))
    np.testing.assert_allclose(b["history"]["total"][0],
                               a["history"]["total"][0], rtol=1e-4)


def test_kh_fused_matches_xla_with_trainable_E():
    """KH PINN with jet_impl='pallas-fused': fused loss + in-kernel dL/dE
    track the XLA autodiff path (E is a trainable leaf, KH_1D.py:217)."""
    from nnpde_tpu.pde import kh as khphys
    from nnpde_tpu.problems.kh import KHConfig, train_kh

    gt = khphys.KHGroundTruth(alpha=2.0, L=20.0, N=400, n_levels=2)
    base = dict(method="PINN", n=0, technique="FBC", epochs=40,
                layers=(1, 16, 16, 1), train_n=128, chunk=20, seed=0)
    a = train_kh(KHConfig(jet_impl="xla", **base), gt)
    b = train_kh(KHConfig(jet_impl="pallas-fused", **base), gt)
    np.testing.assert_allclose(b["history"]["total"][0],
                               a["history"]["total"][0], rtol=1e-4)
    np.testing.assert_allclose(b["E_track"], a["E_track"], rtol=1e-3)


def test_poisson_fused_rb_and_resample():
    """Fused path with a soft-BC (RB) aux term and per-epoch resampling:
    aux grads ride plain autodiff and add onto the fused pde grads."""
    from nnpde_tpu.problems.poisson import PoissonConfig, train_poisson_nd

    out = train_poisson_nd(PoissonConfig(
        dim=1, epochs=60, n_interior=128, chunk=30, width=16, depth=3,
        bc_mode="RB", resample=True, jet_impl="pallas-fused", seed=0,
    ))
    assert np.isfinite(out["rel_l2"])
    assert out["history"]["bc"].shape == (60,)


@pytest.mark.parametrize("d,lane_pack", [(1, 1), (2, 2), (5, 1)])
def test_fused_poisson_analytic_matches_streamed(d, lane_pack):
    """In-kernel analytic coefficients == the streamed coefficient tensor
    (box-FBC factor + prod-sin RHS), incl. padded tiles and lane packing."""
    from nnpde_tpu.kernels import fused_poisson_analytic
    from nnpde_tpu.pde import poisson as phys

    L, ks = 2.0, list(range(1, d + 1))
    model = SolutionModel(
        NetSpec((d, 16, 16, 1), activation="sin"),
        factor_for_technique("FBC", dim=d, kind="box", L=L))
    params = model.init(jax.random.PRNGKey(d))
    X = jax.random.uniform(jax.random.PRNGKey(d + 50), (300, d), maxval=L)
    f = phys.rhs_f_for_u_sin(X, L, ks)
    coef = residual_coefficients(model.factor.jet(X), a0=-1.0, rhs=-f)

    la, _, ga = fused_poisson_analytic(
        params, X, "sin", L=L, ks=ks, weight=3.0,
        bwd_tile=128, lane_pack=lane_pack, interpret=True)
    ls, _, gs = fused_linear_residual(
        params, X, coef, "sin", weight=3.0,
        bwd_tile=128, lane_pack=lane_pack, interpret=True)
    np.testing.assert_allclose(float(la), float(ls), rtol=1e-6)
    assert _tree_rel_err(ga, gs) <= 1e-5


def test_poisson_trains_with_analytic_coefficients():
    """coef_mode='analytic' trains identically to the streamed fused path
    (same loss definition; only the coefficient transport differs)."""
    from nnpde_tpu.problems.poisson import PoissonConfig, train_poisson_nd

    base = dict(dim=2, epochs=80, n_interior=256, chunk=40,
                width=16, depth=3, seed=0, jet_impl="pallas-fused")
    a = train_poisson_nd(PoissonConfig(coef_mode="stream", **base))
    b = train_poisson_nd(PoissonConfig(coef_mode="analytic", **base))
    np.testing.assert_allclose(b["history"]["total"][0],
                               a["history"]["total"][0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b["history"]["total"]),
                               np.asarray(a["history"]["total"]), rtol=1e-3)
    with pytest.raises(ValueError, match="analytic"):
        train_poisson_nd(PoissonConfig(coef_mode="analytic", method="DRM",
                                       dim=2))


def test_fused_residual_analytic_generic_builder():
    """The generic in-kernel coefficient entry accepts any traceable
    per-point builder — here a Helmholtz operator through the box factor
    (lap u + k^2 u, u = B*net), checked against the streamed path."""
    from nnpde_tpu.kernels import fused_residual_analytic

    d, L, k2 = 2, 2.0, 4.0
    model = SolutionModel(
        NetSpec((d, 16, 16, 1), activation="sin"),
        factor_for_technique("FBC", dim=d, kind="box", L=L))
    params = model.init(jax.random.PRNGKey(0))
    X = jax.random.uniform(jax.random.PRNGKey(1), (300, d), maxval=L)

    def coef_fn(Xh):
        cols = [Xh[:, i:i + 1] for i in range(d)]
        gi = [x * (L - x) for x in cols]
        B = gi[0] * gi[1]
        dB = [(L - 2.0 * cols[0]) * gi[1], (L - 2.0 * cols[1]) * gi[0]]
        lapB = -2.0 * gi[1] - 2.0 * gi[0]
        # a0 = 1, c0 = k^2: a = B, b_i = 2 dB_i, c = lapB + k^2 B
        return (lapB + k2 * B, [2.0 * dBi for dBi in dB], B,
                jnp.zeros_like(B))

    la, _, ga = fused_residual_analytic(
        params, X, "sin", coef_fn, weight=2.0, bwd_tile=128, interpret=True)
    coef = residual_coefficients(model.factor.jet(X), a0=1.0, c0=k2)
    ls, _, gs = fused_linear_residual(
        params, X, coef, "sin", weight=2.0, bwd_tile=128, interpret=True)
    np.testing.assert_allclose(float(la), float(ls), rtol=1e-6)
    assert _tree_rel_err(ga, gs) <= 1e-5
