"""Two-pass fused quotient kernels vs the XLA autodiff oracle.

Pass A (forward sums) + scalar glue + pass B (seeded reverse sweep) wrapped
in custom VJPs must reproduce ``jax.value_and_grad`` of the same losses
built from :func:`nnpde_tpu.ops.fwdlap.mlp_fwdlap` to 1e-5 relative error.
Interpreter mode off-TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpde_tpu.kernels.fused_quotient import (
    fused_linear_sums,
    fused_quad_sums,
    linear_functional_coefficients,
    make_fused_rayleigh,
    make_fused_wan_u,
    make_fused_wan_v,
    quotient_coefficients,
)
from nnpde_tpu.models import NetSpec, SolutionModel, factor_for_technique
from nnpde_tpu.ops.fwdlap import mlp_fwdlap

# Oracle tests pin dot_dtype='float32' so they check the kernel ALGEBRA
# exactly: the maker default is bf16x3 (a TPU accuracy fix — DEFAULT-dot
# noise in the global sums contaminates the quotient backward), which on
# CPU interpret adds ~2e-5 split-rounding noise relative to plain f32
# dots.  The bf16x3 default path gets its own test
# (test_fused_quotient_bf16x3_default_accuracy).
KW = dict(bwd_tile=128, interpret=True, dot_dtype="float32")


def _tree_rel_err(a, b):
    num = sum(float(jnp.sum((x - y) ** 2))
              for x, y in zip(jax.tree_util.tree_leaves(a),
                              jax.tree_util.tree_leaves(b)))
    den = sum(float(jnp.sum(y ** 2)) for y in jax.tree_util.tree_leaves(b))
    return (num / max(den, 1e-30)) ** 0.5


def _setup(d, width, act, seed=0, N=300, technique="FBC"):
    key = jax.random.PRNGKey(seed)
    L = 1.5
    model = SolutionModel(
        NetSpec((d, width, width, width, 1), activation=act),
        factor_for_technique(technique, dim=d, kind="box", L=L),
    )
    params = model.init(key)
    X = jax.random.uniform(jax.random.fold_in(key, 1), (N, d),
                           minval=0.05, maxval=L - 0.05)
    return model, params, X, L


def _full_jet(model, params, X, act):
    """Oracle jet of the FULL solution u = B * net (analytic product)."""
    net = mlp_fwdlap(params, X, act)
    B = model.factor.jet(X)
    u = B.value * net.value
    gu = B.value[:, None] * net.grad + B.grad * net.value[:, None]
    lap = (B.value * net.lap + 2.0 * jnp.sum(B.grad * net.grad, axis=1)
           + B.lap * net.value)
    return u, gu, lap


# ------------------------------------------------------------------ pass A
@pytest.mark.parametrize("d,lane_pack", [(1, 1), (2, 2), (3, 1)])
def test_linear_sums_lanes(d, lane_pack):
    act = "sin"
    model, params, X, L = _setup(d, 16, act)
    N = X.shape[0]
    key = jax.random.PRNGKey(7)
    c0 = jax.random.normal(key, (N,))
    b0 = jax.random.normal(jax.random.fold_in(key, 1), (N, d))
    rhs = jax.random.normal(jax.random.fold_in(key, 2), (N,))
    B = model.factor.jet(X)
    phi = jax.random.normal(jax.random.fold_in(key, 3), (N,))
    coef = linear_functional_coefficients(
        B, c0=c0, b0=b0, a0=0.3, rhs=rhs, e1=B.value, e2=B.value * phi)
    s = fused_linear_sums(params, X, coef, act, lane_pack=lane_pack, **KW)

    u, gu, lap = _full_jet(model, params, X, act)
    r = 0.3 * lap + jnp.sum(b0 * gu, axis=1) + c0 * u + rhs
    np.testing.assert_allclose(float(s["sum_r"]), float(jnp.sum(r)),
                               rtol=1e-5)
    np.testing.assert_allclose(float(s["sum_r2"]), float(jnp.sum(r ** 2)),
                               rtol=1e-5)
    np.testing.assert_allclose(float(s["sum_mass"]), float(jnp.sum(u ** 2)),
                               rtol=1e-5)
    np.testing.assert_allclose(float(s["sum_e2"]), float(jnp.sum(u * phi)),
                               rtol=1e-5)
    assert s["n"] == N


@pytest.mark.parametrize("d,lane_pack", [(1, 2), (2, 1)])
def test_quad_sums_lanes(d, lane_pack):
    act = "tanh"
    model, params, X, L = _setup(d, 16, act)
    N = X.shape[0]
    key = jax.random.PRNGKey(8)
    f = jax.random.normal(key, (N,))
    V = jax.random.normal(jax.random.fold_in(key, 1), (N,))
    coef = quotient_coefficients(model.factor.jet(X), f=f, V=V)
    s = fused_quad_sums(params, X, coef, act, lane_pack=lane_pack, **KW)

    u, gu, _ = _full_jet(model, params, X, act)
    e = 0.5 * jnp.sum(gu ** 2, axis=1) - f * u + V * u ** 2
    np.testing.assert_allclose(float(s["sum_e"]), float(jnp.sum(e)),
                               rtol=1e-5)
    np.testing.assert_allclose(float(s["sum_u2"]), float(jnp.sum(u ** 2)),
                               rtol=1e-5)


# ---------------------------------------------------------------- Rayleigh
@pytest.mark.parametrize("d,act,lane_pack", [
    (1, "tanh", 1), (2, "sin", 2), (3, "sin", 1),
])
def test_fused_rayleigh_matches_autodiff(d, act, lane_pack):
    """Eigen-DRM quotient: IPW (V=0) and Schrodinger (V!=0) forms."""
    model, params, X, L = _setup(d, 16, act, seed=d)
    N = X.shape[0]
    V = 0.5 * jnp.sum((X - L / 2) ** 2, axis=1)       # QHO-like potential
    coef = quotient_coefficients(model.factor.jet(X), V=V)
    w = 3.0
    loss = make_fused_rayleigh(act, weight=w, lane_pack=lane_pack, **KW)

    def wrapped(p):
        total, aux = loss(p, X, coef)
        return total, aux

    (val, aux), grads = jax.value_and_grad(wrapped, has_aux=True)(params)

    def oracle(p):
        u, gu, _ = _full_jet(model, p, X, act)
        num = jnp.mean(0.5 * jnp.sum(gu ** 2, axis=1) + V * u ** 2)
        return w * num / jnp.mean(u ** 2)

    val_o, grads_o = jax.value_and_grad(oracle)(params)
    assert abs(float(val) - float(val_o)) <= 1e-5 * abs(float(val_o))
    assert _tree_rel_err(grads, grads_o) <= 1e-5
    np.testing.assert_allclose(float(aux["rayleigh"]) * w, float(val_o),
                               rtol=1e-5)


# ------------------------------------------------------------------- WAN u
@pytest.mark.parametrize("convention,trainE,lane_pack", [
    ("wr2_over_norm", False, 2),
    ("wr2_over_norm", True, 1),
    ("ratio_sq", True, 2),
])
def test_fused_wan_u_matches_autodiff(convention, trainE, lane_pack):
    """Primal WAN objective: weak form + norm penalty, optional trainable
    E (IPW_1D_WAN.py:106-112, QHO_1D_WAN.py:131, KH_1D.py:264-268)."""
    d, act = 2, "sin"
    model, params, X, L = _setup(d, 16, act, seed=11)
    N = X.shape[0]
    key = jax.random.PRNGKey(21)
    phi = jax.random.normal(key, (N,))
    gphi = jax.random.normal(jax.random.fold_in(key, 1), (N, d))
    V = 0.3 * jnp.sum(X ** 2, axis=1)
    E0 = jnp.asarray(2.7)
    pref, vol, eps = 0.5, float(L ** d), 1e-8
    w_pde, w_norm = 10.0, 100.0
    phi_norm = jnp.mean(phi ** 2)

    B = model.factor.jet(X)
    base = linear_functional_coefficients(
        B, c0=V * phi, b0=pref * gphi, a0=0.0,
        e1=B.value, e2=B.value * phi)
    loss = make_fused_wan_u(act, convention=convention, eps=eps, vol=vol,
                            w_pde=w_pde, w_norm=w_norm,
                            lane_pack=lane_pack, **KW)

    def wrapped(p, E):
        total, aux = loss(p, E, X, base, phi_norm)
        return total, aux

    (val, aux), (grads, dE) = jax.value_and_grad(
        wrapped, argnums=(0, 1), has_aux=True)(params, E0)

    def oracle(p, E):
        u, gu, _ = _full_jet(model, p, X, act)
        wr = jnp.mean(pref * jnp.sum(gu * gphi, axis=1) + (V - E) * u * phi)
        if convention == "wr2_over_norm":
            pde = wr ** 2 / (phi_norm + eps)
        else:
            pde = (wr / (phi_norm + eps)) ** 2
        return w_pde * pde + w_norm * (vol * jnp.mean(u ** 2) - 1.0) ** 2

    val_o, (grads_o, dE_o) = jax.value_and_grad(
        oracle, argnums=(0, 1))(params, E0)
    assert abs(float(val) - float(val_o)) <= 1e-5 * abs(float(val_o))
    assert _tree_rel_err(grads, grads_o) <= 1e-5
    if trainE:
        np.testing.assert_allclose(float(dE), float(dE_o), rtol=1e-5,
                                   atol=1e-10)
    assert np.isfinite(float(aux["weak_residual"]))


def test_fused_wan_u_phi_norm_cotangent():
    """The phi_norm scalar cotangent is exact (not silently zero)."""
    d, act = 1, "sin"
    model, params, X, L = _setup(d, 16, act, seed=3)
    N = X.shape[0]
    phi = jax.random.normal(jax.random.PRNGKey(5), (N,))
    B = model.factor.jet(X)
    base = linear_functional_coefficients(
        B, c0=-1.0 * phi, b0=0.5 * jnp.ones((N, d)) * 0.0, a0=0.0,
        e1=B.value, e2=B.value * phi)
    loss = make_fused_wan_u(act, eps=1e-8, vol=float(L), w_pde=1.0, **KW)

    def f(pn):
        total, _ = loss(params, jnp.asarray(1.3), X, base, pn)
        return total

    pn0 = jnp.mean(phi ** 2)
    g = jax.grad(f)(pn0)
    h = 1e-3
    fd = (f(pn0 + h) - f(pn0 - h)) / (2 * h)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-3)


# ------------------------------------------------------------------- WAN v
@pytest.mark.parametrize("objective,convention,lane_pack", [
    ("neg_log", "wr2_over_norm", 2),
    ("neg", "ratio_sq", 1),
])
def test_fused_wan_v_matches_autodiff(objective, convention, lane_pack):
    """Critic objective: -log(pde_loss+eps) (IPW_1D_WAN.py:114) and the KH
    direct ascent -pde_loss (KH_1D.py:347-350), phi = w * v."""
    d, act = 2, "tanh"
    # the critic is a RAW net; use a bump-like smooth positive w as its
    # "factor" multiplier
    model, v_params, X, L = _setup(d, 16, act, seed=31, technique="FBC")
    N = X.shape[0]
    key = jax.random.PRNGKey(41)
    u = jax.random.normal(key, (N,))
    gu = jax.random.normal(jax.random.fold_in(key, 1), (N, d))
    V = 0.2 * jnp.sum(X ** 2, axis=1)
    E, pref, eps, leps = 1.9, 0.5, 1e-8, 1e-8

    Bw = model.factor.jet(X)   # stands in for the bump w jet
    coef = linear_functional_coefficients(
        Bw, c0=(V - E) * u, b0=pref * gu, a0=0.0, e1=Bw.value)
    loss_v = make_fused_wan_v(act, convention=convention, eps=eps,
                              objective=objective, log_eps=leps,
                              lane_pack=lane_pack, **KW)

    def wrapped(p):
        total, aux = loss_v(p, X, coef)
        return total, aux

    (val, aux), grads = jax.value_and_grad(wrapped, has_aux=True)(v_params)

    def oracle(p):
        net = mlp_fwdlap(p, X, act)
        phi = Bw.value * net.value
        gphi = Bw.value[:, None] * net.grad + Bw.grad * net.value[:, None]
        wr = jnp.mean(pref * jnp.sum(gu * gphi, axis=1) + (V - E) * u * phi)
        pn = jnp.mean(phi ** 2)
        if convention == "wr2_over_norm":
            pde = wr ** 2 / (pn + eps)
        else:
            pde = (wr / (pn + eps)) ** 2
        return -jnp.log(pde + leps) if objective == "neg_log" else -pde

    val_o, grads_o = jax.value_and_grad(oracle)(v_params)
    assert abs(float(val) - float(val_o)) <= 1e-5 * max(abs(float(val_o)),
                                                        1e-8)
    assert _tree_rel_err(grads, grads_o) <= 1e-5


def test_fused_wan_under_jit_and_scan():
    """The custom-vjp losses must compose with jit + scan (the trainer's
    compiled epoch loop)."""
    d, act = 1, "sin"
    model, params, X, L = _setup(d, 16, act, seed=9, N=128)
    N = X.shape[0]
    phi = jnp.sin(jnp.pi * X[:, 0] / L)
    gphi = (jnp.pi / L) * jnp.cos(jnp.pi * X[:, 0] / L)[:, None]
    B = model.factor.jet(X)
    base = linear_functional_coefficients(
        B, c0=jnp.zeros((N,)), b0=0.5 * gphi, a0=0.0,
        e1=B.value, e2=B.value * phi)
    phi_norm = jnp.mean(phi ** 2)
    loss = make_fused_wan_u(act, vol=float(L), w_pde=1.0, w_norm=10.0, **KW)

    import optax
    opt = optax.adam(1e-3)

    @jax.jit
    def run(params, E):
        state = opt.init((params, E))

        def step(carry, _):
            (params, E), state = carry
            def obj(pe):
                total, _ = loss(pe[0], pe[1], X, base, phi_norm)
                return total
            val, g = jax.value_and_grad(obj)((params, E))
            upd, state = opt.update(g, state, (params, E))
            return (optax.apply_updates((params, E), upd), state), val

        (pe, _), vals = jax.lax.scan(step, ((params, E), state), None,
                                     length=5)
        return vals

    vals = run(params, jnp.asarray(3.0))
    v = np.asarray(vals)
    assert np.all(np.isfinite(v))
    assert v[-1] <= v[0]      # 5 adam steps should not increase the loss


# --------------------------------------------------------- end-to-end wiring
def test_ipw2d_drm_fused_matches_xla():
    """IPW-2D DRM via the fused Rayleigh quotient: same first-epoch loss
    as the XLA path, trains to a finite rel-L2."""
    from nnpde_tpu.problems.ipw2d import IPW2DConfig, train_ipw_2d

    base = dict(nx=1, ny=1, method="DRM", epochs=40, grid_n=24,
                data_grid_n=8, n_boundary=16, layers=(2, 16, 16, 1),
                chunk=20, seed=0)
    a = train_ipw_2d(IPW2DConfig(jet_impl="xla", **base))
    b = train_ipw_2d(IPW2DConfig(jet_impl="pallas-fused", **base))
    np.testing.assert_allclose(b["history"]["total"][0],
                               a["history"]["total"][0], rtol=1e-4)
    np.testing.assert_allclose(b["history"]["total"][-1],
                               a["history"]["total"][-1], rtol=1e-2)
    assert np.isfinite(b["rel_l2"])


@pytest.mark.parametrize("minimax", ["alternating", "extragradient"])
def test_ipw2d_wan_fused_matches_xla(minimax):
    """IPW-2D WAN via the two-pass fused u/v objectives: the fused minimax
    trajectory tracks the XLA one (same loss definitions, same PRNG
    stream) — including through the extragradient update rule."""
    from nnpde_tpu.problems.ipw2d import IPW2DConfig, train_ipw_2d

    base = dict(nx=1, ny=1, method="WAN", epochs=20, grid_n=16,
                data_grid_n=8, n_boundary=16, layers=(2, 16, 16, 1),
                v_layers=(2, 12, 12, 1), v_steps=2, chunk=10,
                minimax=minimax, seed=0)
    a = train_ipw_2d(IPW2DConfig(jet_impl="xla", **base))
    b = train_ipw_2d(IPW2DConfig(jet_impl="pallas-fused", **base))
    np.testing.assert_allclose(b["history"]["total"][0],
                               a["history"]["total"][0], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(b["history"]["total"]),
                               np.asarray(a["history"]["total"]),
                               rtol=5e-2)
    assert np.isfinite(b["rel_l2"])


def test_ipw2d_wan_fused_grid_jitter():
    """Fused WAN composes with the Cranley–Patterson grid jitter (the
    north-star winner's quadrature)."""
    from nnpde_tpu.problems.ipw2d import IPW2DConfig, train_ipw_2d

    r = train_ipw_2d(IPW2DConfig(
        nx=1, ny=1, method="WAN", epochs=10, grid_n=16, data_grid_n=8,
        n_boundary=16, layers=(2, 16, 16, 1), v_layers=(2, 12, 12, 1),
        v_steps=2, chunk=10, grid_jitter=True, jet_impl="pallas-fused",
        seed=0))
    assert np.isfinite(r["rel_l2"])
    assert np.all(np.isfinite(np.asarray(r["history"]["total"])))


def test_fused_quotient_bf16x3_default_accuracy():
    """The maker DEFAULT (dot_dtype='bf16x3', the TPU accuracy fix) stays
    within 2e-4 of the f32 autodiff oracle on CPU interpret — looser than
    the exact-algebra bar because 3-pass splitting reorders roundoff."""
    d, act, lane_pack = 2, "sin", 1
    model, params, X, L = _setup(d, 16, act, seed=3)
    V = 0.5 * jnp.sum(X ** 2, axis=1)
    coef = quotient_coefficients(model.factor.jet(X), V=V)
    loss = make_fused_rayleigh(act, weight=1.0, lane_pack=lane_pack,
                               bwd_tile=128, interpret=True)

    def wrapped(p):
        total, aux = loss(p, X, coef)
        return total, aux

    (val, _), grads = jax.value_and_grad(wrapped, has_aux=True)(params)

    def oracle(p):
        net = mlp_fwdlap(p, X, act)
        B = model.factor.jet(X)
        u = B.value * net.value
        gu = B.value[:, None] * net.grad + B.grad * net.value[:, None]
        num = jnp.mean(0.5 * jnp.sum(gu ** 2, axis=1) + V * u ** 2)
        return num / jnp.mean(u ** 2)

    val_o, grads_o = jax.value_and_grad(oracle)(params)
    assert abs(float(val) - float(val_o)) <= 2e-4 * abs(float(val_o))
    assert _tree_rel_err(grads, grads_o) <= 2e-4


def test_ipw1d_drm_and_wan_fused_match_xla():
    """1D well: fused DRM Rayleigh + fused WAN u/v vs the XLA paths."""
    from nnpde_tpu.problems.ipw import (
        IPW1DConfig, IPW1DWanConfig, train_ipw_1d, train_ipw_1d_wan,
    )

    base = dict(n=1, method="DRM", technique="FBC", epochs=40, grid_n=128,
                layers=(1, 16, 16, 1), chunk=20, seed=0)
    a = train_ipw_1d(IPW1DConfig(jet_impl="xla", **base))
    b = train_ipw_1d(IPW1DConfig(jet_impl="pallas-fused", **base))
    np.testing.assert_allclose(b["history"]["total"][0],
                               a["history"]["total"][0], rtol=1e-4)
    assert np.isfinite(b["L2_error"])

    wbase = dict(n=1, technique="FN", fn_variant=True, epochs=15,
                 grid_n=128, layers=(1, 16, 16, 1),
                 v_layers=(1, 12, 12, 1), v_steps=2, chunk=5, seed=0)
    aw = train_ipw_1d_wan(IPW1DWanConfig(jet_impl="xla", **wbase))
    bw = train_ipw_1d_wan(IPW1DWanConfig(jet_impl="pallas-fused", **wbase))
    np.testing.assert_allclose(bw["history"]["total"][0],
                               aw["history"]["total"][0], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(bw["history"]["total"]),
                               np.asarray(aw["history"]["total"]),
                               rtol=5e-2)


def test_qho1d_wan_fused_trainable_E_matches_xla():
    """QHO-1D WAN: the trainable-E trajectory through the fused custom VJP
    tracks the XLA path (exact dE from the u*phi lane)."""
    from nnpde_tpu.problems.qho import QHO1DWanConfig, train_qho_1d_wan

    base = dict(n=0, epochs=15, grid_n=128, layers=(1, 16, 16, 1),
                v_layers=(1, 12, 12, 1), v_steps=2, chunk=5, seed=0)
    a = train_qho_1d_wan(QHO1DWanConfig(jet_impl="xla", **base))
    b = train_qho_1d_wan(QHO1DWanConfig(jet_impl="pallas-fused", **base))
    np.testing.assert_allclose(b["history"]["total"][0],
                               a["history"]["total"][0], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(b["history"]["E"]),
                               np.asarray(a["history"]["E"]), rtol=1e-4)


def test_qho1d_drm_fused_matches_xla():
    """QHO-1D DRM: fused Rayleigh WITH the potential term."""
    from nnpde_tpu.problems.qho import QHO1DConfig, train_qho_1d

    base = dict(n=0, method="DRM", technique="FN", epochs=40, grid_n=128,
                layers=(1, 16, 16, 1), chunk=20, seed=0)
    a = train_qho_1d(QHO1DConfig(jet_impl="xla", **base))
    b = train_qho_1d(QHO1DConfig(jet_impl="pallas-fused", **base))
    np.testing.assert_allclose(b["history"]["total"][0],
                               a["history"]["total"][0], rtol=1e-4)
    np.testing.assert_allclose(b["history"]["drm"][0],
                               a["history"]["drm"][0], rtol=1e-4)
    assert np.isfinite(b["L2_error"])


def test_qho2d_drm_and_wan_fused_match_xla():
    """QHO-2D: fused Rayleigh (with V) and fused WAN vs the XLA paths."""
    from nnpde_tpu.problems.qho2d import QHO2DConfig, train_qho_2d

    base = dict(nx=1, ny=0, method="DRM", technique="FN", epochs=30,
                grid_n=20, data_grid_n=8, n_boundary=16,
                layers=(2, 16, 16, 1), chunk=15, seed=0)
    a = train_qho_2d(QHO2DConfig(jet_impl="xla", **base))
    b = train_qho_2d(QHO2DConfig(jet_impl="pallas-fused", **base))
    np.testing.assert_allclose(b["history"]["total"][0],
                               a["history"]["total"][0], rtol=1e-4)
    assert np.isfinite(b["L2_error"])

    wbase = dict(nx=1, ny=0, method="WAN", technique="FN", epochs=12,
                 grid_n=20, data_grid_n=8, n_boundary=16,
                 layers=(2, 16, 16, 1), v_layers=(2, 12, 12, 1),
                 v_steps=2, chunk=4, seed=0)
    aw = train_qho_2d(QHO2DConfig(jet_impl="xla", **wbase))
    bw = train_qho_2d(QHO2DConfig(jet_impl="pallas-fused", **wbase))
    np.testing.assert_allclose(bw["history"]["total"][0],
                               aw["history"]["total"][0], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(bw["history"]["total"]),
                               np.asarray(aw["history"]["total"]),
                               rtol=5e-2)


def test_kh_drm_and_wan_fused_match_xla():
    """KH: fused Rayleigh with the cycle-averaged potential (integral-mean
    eps rescaled) and fused WAN with ratio_sq + direct-ascent critic and
    trainable E."""
    from nnpde_tpu.pde.kh import KHGroundTruth
    from nnpde_tpu.problems.kh import KHConfig, train_kh

    gt = KHGroundTruth(alpha=10.0, L=20.0, N=400, n_levels=2)
    base = dict(method="DRM", n=0, epochs=30, train_n=128,
                layers=(1, 16, 16, 1), chunk=15, seed=0)
    a = train_kh(KHConfig(jet_impl="xla", **base), gt)
    b = train_kh(KHConfig(jet_impl="pallas-fused", **base), gt)
    np.testing.assert_allclose(b["history"]["total"][0],
                               a["history"]["total"][0], rtol=1e-4)
    np.testing.assert_allclose(b["history"]["E"][0], a["history"]["E"][0],
                               rtol=1e-4)

    wbase = dict(method="WAN", n=0, epochs=12, train_n=128,
                 layers=(1, 16, 16, 1), v_layers=(1, 12, 12, 1),
                 v_steps=2, chunk=4, seed=0)
    aw = train_kh(KHConfig(jet_impl="xla", **wbase), gt)
    bw = train_kh(KHConfig(jet_impl="pallas-fused", **wbase), gt)
    np.testing.assert_allclose(bw["history"]["total"][0],
                               aw["history"]["total"][0], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(bw["history"]["E"]),
                               np.asarray(aw["history"]["E"]), rtol=1e-3)


def test_poisson_wan_fused_matches_xla():
    """ND Poisson WAN: fused weak form (rhs lane) + fused critic
    regulariser vs the XLA path, fresh resampling per step."""
    from nnpde_tpu.problems.poisson import PoissonConfig, train_poisson_nd

    base = dict(dim=2, method="WAN", epochs=12, n_interior=256,
                width=16, depth=3, critic_width=12, critic_depth=3,
                critic_steps=2, chunk=4, seed=0)
    a = train_poisson_nd(PoissonConfig(jet_impl="xla", **base))
    b = train_poisson_nd(PoissonConfig(jet_impl="pallas-fused", **base))
    np.testing.assert_allclose(b["history"]["total"][0],
                               a["history"]["total"][0], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(b["history"]["total"]),
                               np.asarray(a["history"]["total"]),
                               rtol=5e-2)
    assert np.isfinite(b["rel_l2"])


def test_ipw3d_drm_fused_matches_xla():
    """3D well DRM via the fused Rayleigh, incl. the QMC-resample path
    (regression: this combination previously hit the PINN fused hook with
    w_pde = 0 and silently trained on the data term alone)."""
    from nnpde_tpu.problems.ipw3d import IPW3DConfig, train_ipw_3d

    base = dict(nx=1, ny=1, nz=1, method="DRM", epochs=30, n_interior=256,
                data_grid_n=6, layers=(3, 16, 16, 1), chunk=15, seed=0,
                n_eval=512, resample=False)
    a = train_ipw_3d(IPW3DConfig(jet_impl="xla", **base))
    b = train_ipw_3d(IPW3DConfig(jet_impl="pallas-fused", **base))
    np.testing.assert_allclose(b["history"]["total"][0],
                               a["history"]["total"][0], rtol=1e-4)
    assert float(np.asarray(b["history"]["drm"])[0]) > 0.0
    base2 = dict(base, resample=True)
    r = train_ipw_3d(IPW3DConfig(jet_impl="pallas-fused", sampler="sobol",
                                 **base2))
    assert np.all(np.isfinite(np.asarray(r["history"]["total"])))


def test_no_lap_mode_equals_lap_mode_when_a_is_zero():
    """Raw-API A/B: with the a column zero, the lap-free recompute gives
    identical sums and seeded grads to the full-stream path."""
    d, act = 2, "sin"
    model, params, X, L = _setup(d, 16, act, seed=17, N=256)
    N = X.shape[0]
    key = jax.random.PRNGKey(3)
    B = model.factor.jet(X)
    coef = linear_functional_coefficients(
        B, c0=jax.random.normal(key, (N,)),
        b0=jax.random.normal(jax.random.fold_in(key, 1), (N, d)),
        a0=0.0, e1=B.value, e2=B.value)
    from nnpde_tpu.kernels.fused_quotient import fused_seeded_grads

    s_lap = fused_linear_sums(params, X, coef, act, no_lap=False, **KW)
    s_nolap = fused_linear_sums(params, X, coef, act, no_lap=True, **KW)
    for k in ("sum_r", "sum_r2", "sum_mass", "sum_e2"):
        np.testing.assert_allclose(float(s_nolap[k]), float(s_lap[k]),
                                   rtol=1e-6)
    g_lap = fused_seeded_grads(params, X, coef, (0.3, 0.1, 0.05), act,
                               no_lap=False, **KW)
    g_nolap = fused_seeded_grads(params, X, coef, (0.3, 0.1, 0.05), act,
                                 no_lap=True, **KW)
    for a, b in zip(jax.tree_util.tree_leaves(g_nolap),
                    jax.tree_util.tree_leaves(g_lap)):
        # dropping the lap stream changes the concat-dot shape, so the
        # summation association differs at the last-bit level
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)
