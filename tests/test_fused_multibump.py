"""Multibump fused WAN kernels vs the XLA autodiff oracle.

The K-lane two-pass kernels (kernels/fused_multibump.py) must reproduce
``jax.value_and_grad`` of the multi-test-function WAN objectives (one weak
residual per localised bump — problems/ipw2d.py's ``n_test_grid > 1``
extension) to 1e-5 relative error.  Interpreter mode off-TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpde_tpu.kernels.fused_multibump import (
    fused_multi_sums,
    make_fused_wan_multi_u,
    make_fused_wan_multi_v,
    pack_multibump_coefficients,
)
from nnpde_tpu.kernels.fused_quotient import linear_functional_coefficients
from nnpde_tpu.models import NetSpec, SolutionModel, factor_for_technique
from nnpde_tpu.ops import bump_grid, bump_w_multi
from nnpde_tpu.ops.fwdlap import mlp_fwdlap

# dot_dtype='float32': exact-algebra oracle checks (see the note in
# test_fused_quotient.py — the bf16x3 maker default is a TPU fix that
# costs ~2e-5 on CPU interpret).
KW = dict(bwd_tile=128, interpret=True, dot_dtype="float32")


def _tree_rel_err(a, b):
    num = sum(float(jnp.sum((x - y) ** 2))
              for x, y in zip(jax.tree_util.tree_leaves(a),
                              jax.tree_util.tree_leaves(b)))
    den = sum(float(jnp.sum(y ** 2)) for y in jax.tree_util.tree_leaves(b))
    return (num / max(den, 1e-30)) ** 0.5


def _setup(d, width, act, seed=0, N=300):
    key = jax.random.PRNGKey(seed)
    L = 1.5
    model = SolutionModel(
        NetSpec((d, width, width, width, 1), activation=act),
        factor_for_technique("FBC", dim=d, kind="box", L=L),
    )
    params = model.init(key)
    X = jax.random.uniform(jax.random.fold_in(key, 1), (N, d),
                           minval=0.05, maxval=L - 0.05)
    return model, params, X, L


def _full_vg(model, params, X, act):
    net = mlp_fwdlap(params, X, act)
    B = model.factor.jet(X)
    u = B.value * net.value
    gu = B.value[:, None] * net.grad + B.grad * net.value[:, None]
    return u, gu


def _u_cores(model, X, phi, gphi, pref=0.5, V=None):
    """Per-bump u-step streams (mirrors _fused_wan.make_fused_wan_multi_pair)."""
    Bu = model.factor.jet(X)
    zero = jnp.zeros_like(Bu.value)
    cores = []
    for k in range(phi.shape[0]):
        c0 = V * phi[k] if V is not None else None
        cores.append(linear_functional_coefficients(
            Bu, c0=c0, b0=pref * gphi[k],
            e1=Bu.value if k == 0 else zero, e2=Bu.value * phi[k]))
    return pack_multibump_coefficients(cores)


# ------------------------------------------------------------------ pass A
@pytest.mark.parametrize("d,Kb,lane_pack", [(1, 3, 1), (2, 4, 2)])
def test_multi_sums_lanes(d, Kb, lane_pack):
    act = "sin"
    model, params, X, L = _setup(d, 16, act)
    N = X.shape[0]
    key = jax.random.PRNGKey(7)
    phi = jax.random.normal(key, (Kb, N))
    gphi = jax.random.normal(jax.random.fold_in(key, 1), (Kb, N, d))
    V = 0.4 * jnp.sum(X ** 2, axis=1)
    coef = _u_cores(model, X, phi, gphi, V=V)
    s = fused_multi_sums(params, X, coef, act, Kb, lane_pack=lane_pack,
                         **KW)

    u, gu = _full_vg(model, params, X, act)
    for k in range(Kb):
        # random-sign integrands make sum r_k near-cancelling — bound the
        # error against the absolute-sum scale, not the tiny net sum
        r_k = 0.5 * jnp.sum(gu * gphi[k], axis=1) + V * u * phi[k]
        np.testing.assert_allclose(
            float(s["sum_r"][k]), float(jnp.sum(r_k)), rtol=1e-5,
            atol=1e-6 * float(jnp.sum(jnp.abs(r_k))))
        np.testing.assert_allclose(
            float(s["sum_e2"][k]), float(jnp.sum(u * phi[k])), rtol=1e-5,
            atol=1e-6 * float(jnp.sum(jnp.abs(u * phi[k]))))
    np.testing.assert_allclose(float(s["sum_mass"][0]),
                               float(jnp.sum(u ** 2)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s["sum_mass"][1:]),
                               np.zeros(Kb - 1), atol=1e-12)
    assert s["n"] == N


# ------------------------------------------------------------------- WAN u
@pytest.mark.parametrize("convention,lane_pack", [
    ("wr2_over_norm", 2), ("ratio_sq", 1),
])
def test_multi_wan_u_matches_autodiff(convention, lane_pack):
    d, act, Kb = 2, "sin", 4
    model, params, X, L = _setup(d, 16, act, seed=11)
    N = X.shape[0]
    key = jax.random.PRNGKey(21)
    phi = jax.random.normal(key, (Kb, N))
    gphi = jax.random.normal(jax.random.fold_in(key, 1), (Kb, N, d))
    V = 0.3 * jnp.sum(X ** 2, axis=1)
    E0 = jnp.asarray(2.7)
    pref, vol, eps = 0.5, float(L ** d), 1e-8
    w_pde, w_norm = 10.0, 100.0
    phi_norms = jnp.mean(phi ** 2, axis=1)

    base = _u_cores(model, X, phi, gphi, pref=pref, V=V)
    loss = make_fused_wan_multi_u(
        act, Kb, convention=convention, eps=eps, vol=vol,
        w_pde=w_pde, w_norm=w_norm, lane_pack=lane_pack, **KW)

    def wrapped(p, E, pn):
        total, aux = loss(p, E, X, base, pn)
        return total, aux

    (val, aux), (grads, dE, dpn) = jax.value_and_grad(
        wrapped, argnums=(0, 1, 2), has_aux=True)(params, E0, phi_norms)

    def oracle(p, E, pn):
        u, gu = _full_vg(model, p, X, act)
        wr = jnp.mean(
            pref * jnp.sum(gu[None] * gphi, axis=-1)
            + (V[None] - E) * u[None] * phi, axis=1)            # (K,)
        if convention == "wr2_over_norm":
            pde = jnp.mean(wr ** 2 / (pn + eps))
        else:
            pde = jnp.mean((wr / (pn + eps)) ** 2)
        return (w_pde * pde
                + w_norm * (vol * jnp.mean(u ** 2) - 1.0) ** 2)

    val_o, (grads_o, dE_o, dpn_o) = jax.value_and_grad(
        oracle, argnums=(0, 1, 2))(params, E0, phi_norms)
    assert abs(float(val) - float(val_o)) <= 1e-5 * abs(float(val_o))
    assert _tree_rel_err(grads, grads_o) <= 1e-5
    np.testing.assert_allclose(float(dE), float(dE_o), rtol=1e-5)
    # atol floor: dpn elements scale like wr_k^2/pn_k^2 and the smallest
    # can sit at ~1e-7 where f32 summation-order noise exceeds rtol=1e-5
    np.testing.assert_allclose(np.asarray(dpn), np.asarray(dpn_o),
                               rtol=1e-5, atol=1e-10)
    assert np.all(np.isfinite(np.asarray(aux["weak_residual"])))


# ------------------------------------------------------------------- WAN v
@pytest.mark.parametrize("objective,lane_pack", [
    ("neg_log", 2), ("neg", 1),
])
def test_multi_wan_v_matches_autodiff(objective, lane_pack):
    """Critic with per-bump effective factors W_k = w_k (bump windows from
    the real bump_w_multi grid) — per-bump masses in the objective."""
    d, act, Kb_grid = 2, "tanh", 2
    model, v_params, X, L = _setup(d, 16, act, seed=31)
    N = X.shape[0]
    centers, hw = bump_grid(0.0, L, d, Kb_grid)
    wv, dwv = bump_w_multi(X, centers, hw)          # (K, N), (K, N, d)
    Kb = int(centers.shape[0])
    key = jax.random.PRNGKey(41)
    u = jax.random.normal(key, (N,))
    gu = jax.random.normal(jax.random.fold_in(key, 1), (N, d))
    E, pref, eps, leps = 1.9, 0.5, 1e-8, 1e-8

    Bv = model.factor.jet(X)
    from nnpde_tpu.ops.fwdlap import Jet

    cores = []
    for k in range(Kb):
        Wm = wv[k] * Bv.value
        gWm = dwv[k] * Bv.value[:, None] + wv[k][:, None] * Bv.grad
        cores.append(linear_functional_coefficients(
            Jet(Wm, gWm, jnp.zeros_like(Wm)), c0=-E * u, b0=pref * gu,
            e1=Wm))
    coef = pack_multibump_coefficients(cores)
    loss_v = make_fused_wan_multi_v(
        act, Kb, eps=eps, objective=objective, log_eps=leps,
        lane_pack=lane_pack, **KW)

    def wrapped(p):
        total, aux = loss_v(p, X, coef)
        return total, aux

    (val, aux), grads = jax.value_and_grad(wrapped, has_aux=True)(v_params)

    def oracle(p):
        net = mlp_fwdlap(p, X, act)
        v = Bv.value * net.value
        gv = Bv.value[:, None] * net.grad + Bv.grad * net.value[:, None]
        phi = wv * v[None]
        gphi = dwv * v[None, :, None] + wv[:, :, None] * gv[None]
        wr = jnp.mean(pref * jnp.sum(gu[None] * gphi, axis=-1)
                      - E * u[None] * phi, axis=1)
        pn = jnp.mean(phi ** 2, axis=1)
        pde = jnp.mean(wr ** 2 / (pn + eps))
        return -jnp.log(pde + leps) if objective == "neg_log" else -pde

    val_o, grads_o = jax.value_and_grad(oracle)(v_params)
    assert abs(float(val) - float(val_o)) <= 1e-5 * max(abs(float(val_o)),
                                                        1e-8)
    assert _tree_rel_err(grads, grads_o) <= 1e-5


def test_multibump_k1_matches_single_bump():
    """K=1 multibump reduces exactly to the single-bump fused objectives."""
    from nnpde_tpu.kernels.fused_quotient import make_fused_wan_u

    d, act = 1, "sin"
    model, params, X, L = _setup(d, 16, act, seed=5, N=200)
    N = X.shape[0]
    key = jax.random.PRNGKey(3)
    phi = jax.random.normal(key, (1, N))
    gphi = jax.random.normal(jax.random.fold_in(key, 1), (1, N, d))
    E0 = jnp.asarray(1.2)
    pn = jnp.mean(phi[0] ** 2)

    base_m = _u_cores(model, X, phi, gphi)
    loss_m = make_fused_wan_multi_u(act, 1, vol=float(L), w_pde=2.0,
                                    w_norm=5.0, **KW)
    B = model.factor.jet(X)
    base_s = linear_functional_coefficients(
        B, b0=0.5 * gphi[0], a0=0.0, e1=B.value, e2=B.value * phi[0])
    loss_s = make_fused_wan_u(act, vol=float(L), w_pde=2.0, w_norm=5.0,
                              **KW)

    def fm(p, E):
        return loss_m(p, E, X, base_m, pn[None])[0]

    def fs(p, E):
        return loss_s(p, E, X, base_s, pn)[0]

    vm, gm = jax.value_and_grad(lambda p: fm(p, E0))(params)
    vs, gs = jax.value_and_grad(lambda p: fs(p, E0))(params)
    np.testing.assert_allclose(float(vm), float(vs), rtol=1e-6)
    assert _tree_rel_err(gm, gs) <= 1e-6


def test_n_bumps_cap():
    with pytest.raises(ValueError, match="n_bumps"):
        make_fused_wan_multi_u("sin", 43)


# --------------------------------------------------------- end-to-end wiring
def test_ipw2d_wan_multibump_fused_matches_xla():
    """IPW-2D multibump WAN (n_test_grid=2 -> K=4): the fused minimax
    trajectory tracks the XLA one."""
    from nnpde_tpu.problems.ipw2d import IPW2DConfig, train_ipw_2d

    base = dict(nx=1, ny=1, method="WAN", epochs=16, grid_n=16,
                data_grid_n=8, n_boundary=16, layers=(2, 16, 16, 1),
                v_layers=(2, 12, 12, 1), v_steps=2, chunk=8,
                n_test_grid=2, seed=0)
    a = train_ipw_2d(IPW2DConfig(jet_impl="xla", **base))
    b = train_ipw_2d(IPW2DConfig(jet_impl="pallas-fused", **base))
    np.testing.assert_allclose(b["history"]["total"][0],
                               a["history"]["total"][0], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(b["history"]["total"]),
                               np.asarray(a["history"]["total"]),
                               rtol=5e-2)
    assert np.isfinite(b["rel_l2"])


def test_ipw2d_wan_multibump_fused_jitter():
    """Multibump fused WAN composes with the Cranley–Patterson jitter
    (per-step bump windows rebuilt on the shifted lattice)."""
    from nnpde_tpu.problems.ipw2d import IPW2DConfig, train_ipw_2d

    r = train_ipw_2d(IPW2DConfig(
        nx=1, ny=1, method="WAN", epochs=8, grid_n=16, data_grid_n=8,
        n_boundary=16, layers=(2, 16, 16, 1), v_layers=(2, 12, 12, 1),
        v_steps=2, chunk=4, n_test_grid=2, grid_jitter=True,
        jet_impl="pallas-fused", seed=0))
    assert np.isfinite(r["rel_l2"])
    assert np.all(np.isfinite(np.asarray(r["history"]["total"])))
