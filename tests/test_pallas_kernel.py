"""Pallas fused forward-Laplacian kernel vs the XLA oracle (interpret mode
on the CPU CI backend; the same assertions run compiled on a real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnpde_tpu.kernels import mlp_fwdlap_pallas
from nnpde_tpu.models import NetSpec, SolutionModel, factor_for_technique, init_mlp
from nnpde_tpu.ops.fwdlap import mlp_fwdlap


@pytest.mark.parametrize("activation", ["sin", "tanh", "gelu"])
@pytest.mark.parametrize("d", [1, 2, 5])
def test_kernel_matches_xla_forward(activation, d):
    params = init_mlp(
        jax.random.PRNGKey(0), NetSpec((d, 32, 32, 32, 1), activation)
    )
    X = jax.random.uniform(jax.random.PRNGKey(1), (100, d), minval=-1.0, maxval=1.0)
    ref = mlp_fwdlap(params, X, activation)
    ker = mlp_fwdlap_pallas(params, X, activation, tile=64, bwd_tile=64)
    np.testing.assert_allclose(np.asarray(ker.value), np.asarray(ref.value), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ker.grad), np.asarray(ref.grad), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ker.lap), np.asarray(ref.lap), atol=1e-3)


@pytest.mark.parametrize("activation", ["sin", "tanh", "gelu"])
def test_kernel_custom_vjp_matches_autodiff(activation):
    d = 2
    params = init_mlp(
        jax.random.PRNGKey(2), NetSpec((d, 24, 24, 1), activation)
    )
    X = jax.random.uniform(jax.random.PRNGKey(3), (96, d), minval=-1.0, maxval=1.0)

    def loss_ref(p):
        jet = mlp_fwdlap(p, X, activation)
        return jnp.mean(jet.lap**2) + jnp.mean(jet.value * jet.grad.sum(-1))

    def loss_ker(p):
        jet = mlp_fwdlap_pallas(p, X, activation, tile=32, bwd_tile=32)
        return jnp.mean(jet.lap**2) + jnp.mean(jet.value * jet.grad.sum(-1))

    g_ref = jax.grad(loss_ref)(params)
    g_ker = jax.grad(loss_ker)(params)
    for (W1, b1), (W2, b2) in zip(g_ref, g_ker):
        np.testing.assert_allclose(np.asarray(W2), np.asarray(W1), rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(b2), np.asarray(b1), rtol=2e-3, atol=1e-4)


def test_kernel_handles_ragged_batch():
    """N not divisible by the tile: padded internally, exact result sizes."""
    d = 2
    params = init_mlp(jax.random.PRNGKey(4), NetSpec((d, 16, 16, 1), "sin"))
    X = jax.random.uniform(jax.random.PRNGKey(5), (77, d))
    jet = mlp_fwdlap_pallas(params, X, "sin", tile=32, bwd_tile=32)
    assert jet.value.shape == (77,)
    assert jet.grad.shape == (77, d)
    ref = mlp_fwdlap(params, X, "sin")
    np.testing.assert_allclose(np.asarray(jet.lap), np.asarray(ref.lap), atol=1e-3)


def test_solution_model_pallas_impl_with_factor():
    """fields(impl='pallas') composes the kernel jet with trial factors."""
    d = 2
    model = SolutionModel(
        NetSpec((d, 16, 16, 1), "sin"),
        factor_for_technique("FBC", dim=d, kind="box", L=2.0),
    )
    params = model.init(jax.random.PRNGKey(6))
    X = jax.random.uniform(jax.random.PRNGKey(7), (64, d), maxval=2.0)
    a = model.fields(params, X, impl="pallas")
    b = model.fields(params, X, impl="xla")
    np.testing.assert_allclose(np.asarray(a.lap), np.asarray(b.lap), atol=1e-3)
    np.testing.assert_allclose(np.asarray(a.value), np.asarray(b.value), atol=1e-5)


def test_lane_pack_matches_unpacked_vjp():
    """2-point lane packing (block-diag weights, two points per vreg) must
    reproduce the unpacked kernel's primal and cotangents exactly."""
    d = 3
    params = init_mlp(jax.random.PRNGKey(7), NetSpec((d, 64, 64, 64, 1), "sin"))
    X = jax.random.uniform(jax.random.PRNGKey(8), (160, d), minval=-1.0, maxval=1.0)

    def loss(p, pack):
        jet = mlp_fwdlap_pallas(p, X, "sin", tile=64, bwd_tile=64,
                                lane_pack=pack)
        return jnp.mean(jet.lap**2) + jnp.mean(jet.value**2)

    g1 = jax.grad(lambda p: loss(p, 1))(params)
    g2 = jax.grad(lambda p: loss(p, 2))(params)
    for (W1, b1), (W2, b2) in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(W2), np.asarray(W1),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(b2), np.asarray(b1),
                                   rtol=1e-5, atol=1e-6)


def test_auto_forward_falls_back_at_high_dim():
    """d >= 7 must not silently select the 16-lane packed forward (its
    layout holds only d+2 <= 8 jet lanes per point — ADVICE round 2): the
    'auto' path has to stay accurate, and an explicit pallas2+pack request
    must raise."""
    d = 7
    params = init_mlp(jax.random.PRNGKey(9), NetSpec((d, 64, 64, 1), "sin"))
    X = jax.random.uniform(jax.random.PRNGKey(10), (64, d), minval=-1.0,
                           maxval=1.0)
    ref = mlp_fwdlap(params, X, "sin")
    ker = mlp_fwdlap_pallas(params, X, "sin", tile=32, bwd_tile=32,
                            fwd_impl="auto")
    np.testing.assert_allclose(np.asarray(ker.lap), np.asarray(ref.lap),
                               atol=1e-3)
    with pytest.raises(ValueError, match="input dim"):
        mlp_fwdlap_pallas(params, X, "sin", tile=32, bwd_tile=32,
                          fwd_impl="pallas2", lane_pack=2)


def test_lane_pack_odd_tile_raises():
    d = 2
    params = init_mlp(jax.random.PRNGKey(11), NetSpec((d, 32, 32, 1), "sin"))
    X = jax.random.uniform(jax.random.PRNGKey(12), (62, d))
    with pytest.raises(ValueError, match="even tiles"):
        mlp_fwdlap_pallas(params, X, "sin", tile=31, bwd_tile=31, lane_pack=2)


def test_kernel_width128_matches_xla_vjp():
    """Width-128 nets on the (unpacked) kernel path: primal + cotangents
    must match the XLA oracle (the round-3 w128 perf lever rides this)."""
    d = 2
    params = init_mlp(jax.random.PRNGKey(13), NetSpec((d, 128, 128, 1), "sin"))
    X = jax.random.uniform(jax.random.PRNGKey(14), (96, d), minval=-1.0,
                           maxval=1.0)

    def loss(p, impl):
        if impl == "xla":
            jet = mlp_fwdlap(p, X, "sin")
        else:
            jet = mlp_fwdlap_pallas(p, X, "sin", tile=32, bwd_tile=32,
                                    fwd_impl=impl, lane_pack=1)
        return jnp.mean(jet.lap**2) + jnp.mean(jet.value**2)

    g_ref = jax.grad(lambda p: loss(p, "xla"))(params)
    for impl in ("xla+pallas-bwd", "pallas2"):
        fwd = "xla" if impl.startswith("xla") else impl
        g_ker = jax.grad(lambda p: loss(p, fwd))(params)
        for (W1, b1), (W2, b2) in zip(g_ref, g_ker):
            np.testing.assert_allclose(np.asarray(W2), np.asarray(W1),
                                       rtol=2e-3, atol=1e-4)
            np.testing.assert_allclose(np.asarray(b2), np.asarray(b1),
                                       rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize("width", [128, 256])
def test_auto_defaults_wide(width):
    """Round-3 defaults: ``bwd_tile=None`` auto-sizes by width and
    ``fwd_impl='auto'`` takes the unpacked VMEM jet forward at any width
    with d + 2 <= 8 — the 20.1M (w128) / w256 paths (BENCHMARKS.md width
    table) must match the XLA oracle through the *default* knob settings."""
    d = 2
    params = init_mlp(jax.random.PRNGKey(15),
                      NetSpec((d, width, width, 1), "sin"))
    X = jax.random.uniform(jax.random.PRNGKey(16), (80, d), minval=-1.0,
                           maxval=1.0)
    ref = mlp_fwdlap(params, X, "sin")
    ker = mlp_fwdlap_pallas(params, X, "sin", tile=64)  # bwd_tile/fwd auto
    np.testing.assert_allclose(np.asarray(ker.value), np.asarray(ref.value),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ker.lap), np.asarray(ref.lap),
                               atol=1e-3)
    g_ref = jax.grad(lambda p: jnp.mean(mlp_fwdlap(p, X, "sin").lap ** 2))(
        params)
    g_ker = jax.grad(lambda p: jnp.mean(
        mlp_fwdlap_pallas(p, X, "sin", tile=64).lap ** 2))(params)
    for (W1, b1), (W2, b2) in zip(g_ref, g_ker):
        np.testing.assert_allclose(np.asarray(W2), np.asarray(W1),
                                   rtol=2e-3, atol=1e-4)


def test_poisson_trains_with_pallas_jet_impl():
    """jet_impl='pallas' (lane-packed kernels, interpret mode on CPU) must
    train the 1D Poisson PINN to the same ballpark as the XLA path."""
    from nnpde_tpu.problems.poisson import PoissonConfig, train_poisson_nd

    base = dict(dim=1, epochs=150, n_interior=256, chunk=75,
                width=16, depth=3, seed=0)
    a = train_poisson_nd(PoissonConfig(jet_impl="xla", **base))
    b = train_poisson_nd(PoissonConfig(jet_impl="pallas", **base))
    assert np.isfinite(b["rel_l2"])
    assert b["rel_l2"] < 2.0 * a["rel_l2"] + 1e-3
