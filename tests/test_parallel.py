"""Distributed tests on the 8-device virtual CPU mesh (conftest forces it).

The fake-backend story replacing the reference's nonexistent distributed
tests: batch-sharded training must be numerically equivalent to single
device, both via GSPMD (jit + NamedSharding) and via explicit shard_map
collectives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nnpde_tpu.losses import pinn_poisson
from nnpde_tpu.models import NetSpec, SolutionModel, factor_for_technique
from nnpde_tpu.parallel import (
    data_sharding,
    make_mesh,
    psum_mean_step,
    replicate,
    shard_batch,
)
from nnpde_tpu.pde import poisson as phys


@pytest.fixture(scope="module")
def setup():
    L, d, N = 2.0, 2, 1024
    model = SolutionModel(
        NetSpec((d, 32, 32, 1), "sin"),
        factor_for_technique("FBC", dim=d, kind="box", L=L),
    )
    params = model.init(jax.random.PRNGKey(0))
    X = jax.random.uniform(jax.random.PRNGKey(1), (N, d), maxval=L)
    f = phys.rhs_f_for_u_sin(X, L, [1, 1])

    def loss_fn(params, X_in, f_in):
        jet = model.fields(params, X_in)
        return pinn_poisson(jet.lap, f_in)

    return model, params, X, f, loss_fn


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_gspmd_sharded_loss_matches_single_device(setup):
    model, params, X, f, loss_fn = setup
    mesh = make_mesh()
    loss_single = jax.jit(loss_fn)(params, X, f)

    Xs = shard_batch(X, mesh)
    fs = shard_batch(f, mesh)
    ps = replicate(params, mesh)
    loss_sharded = jax.jit(loss_fn)(ps, Xs, fs)
    np.testing.assert_allclose(float(loss_single), float(loss_sharded), rtol=1e-6)


def test_gspmd_sharded_grads_match(setup):
    model, params, X, f, loss_fn = setup
    mesh = make_mesh()
    g1 = jax.jit(jax.grad(loss_fn))(params, X, f)
    g2 = jax.jit(jax.grad(loss_fn))(
        replicate(params, mesh), shard_batch(X, mesh), shard_batch(f, mesh)
    )
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)


def test_shard_map_psum_step_matches(setup):
    model, params, X, f, loss_fn = setup
    mesh = make_mesh()

    def loss_x(params, X_in):
        jet = model.fields(params, X_in)
        fx = phys.rhs_f_for_u_sin(X_in, 2.0, [1, 1])
        return pinn_poisson(jet.lap, fx)

    step = jax.jit(psum_mean_step(loss_x, mesh))
    loss_dp, grads_dp = step(params, X)
    loss_ref, grads_ref = jax.jit(jax.value_and_grad(loss_x))(params, X)
    np.testing.assert_allclose(float(loss_dp), float(loss_ref), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(grads_dp), jax.tree_util.tree_leaves(grads_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)


def test_sharded_training_converges(setup):
    """A short sharded training run must behave like the single-device one."""
    model, params, X, f, loss_fn = setup
    mesh = make_mesh()
    opt = optax.adam(2e-3)

    def run(params, X, f):
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            loss, g = jax.value_and_grad(loss_fn)(params, X, f)
            up, state = opt.update(g, state, params)
            return optax.apply_updates(params, up), state, loss

        for _ in range(100):
            params, state, loss = step(params, state)
        return float(loss)

    loss_single = run(params, X, f)
    loss_sharded = run(
        replicate(params, mesh), shard_batch(X, mesh), shard_batch(f, mesh)
    )
    assert loss_sharded < 0.6 * 3.0  # converging
    np.testing.assert_allclose(loss_single, loss_sharded, rtol=1e-3)


def test_dp_tp_2d_mesh_training_matches_single_device(setup):
    """Combined batch (dp=4) x tensor (tp=2) parallelism on the 2D mesh must
    reproduce single-device results; GSPMD inserts the Megatron psums."""
    from nnpde_tpu.parallel import make_mesh_2d, tp_shard_mlp

    model, params, X, f, loss_fn = setup
    mesh = make_mesh_2d(4, 2)
    Xs = jax.device_put(X, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data")))
    fs = jax.device_put(f, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data")))
    ps = tp_shard_mlp(params, mesh)

    loss_ref = jax.jit(loss_fn)(params, X, f)
    loss_tp = jax.jit(loss_fn)(ps, Xs, fs)
    np.testing.assert_allclose(float(loss_tp), float(loss_ref), rtol=1e-5)

    g_ref = jax.jit(jax.grad(loss_fn))(params, X, f)
    g_tp = jax.jit(jax.grad(loss_fn))(ps, Xs, fs)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_tp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=1e-6)

    # one full optimizer step under dp x tp stays equivalent
    opt = optax.adam(1e-3)

    @jax.jit
    def step(p, s, X, f):
        loss, g = jax.value_and_grad(loss_fn)(p, X, f)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    p1, _, l1 = step(params, opt.init(params), X, f)
    p2, _, l2 = step(ps, opt.init(ps), Xs, fs)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=1e-6)


def test_dcn_mesh_shape_and_axes():
    from nnpde_tpu.parallel import make_mesh_dcn

    mesh = make_mesh_dcn(2, 4)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("dcn", "data")
    with pytest.raises(ValueError, match="devices"):
        make_mesh_dcn(4, 4)


def test_dcn_hierarchical_step_matches_single_device(setup):
    """dp-over-DCN x dp-over-ICI: the two-level pmean must be numerically
    the global mean (loss AND grads), same as one device."""
    from nnpde_tpu.parallel import dp_dcn_step, make_mesh_dcn

    model, params, X, f, loss_fn = setup
    mesh = make_mesh_dcn(2, 4)

    def loss_x(p, Xb):
        jet = model.fields(p, Xb)
        return pinn_poisson(jet.lap, phys.rhs_f_for_u_sin(Xb, 2.0, [1, 1]))

    loss_ref, grads_ref = jax.value_and_grad(
        lambda p: loss_x(p, X)
    )(params)

    from jax.sharding import NamedSharding, PartitionSpec as P

    Xs = jax.device_put(X, NamedSharding(mesh, P(("dcn", "data"))))
    ps = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), params
    )
    loss_d, grads_d = jax.jit(dp_dcn_step(loss_x, mesh))(ps, Xs)
    np.testing.assert_allclose(float(loss_ref), float(loss_d), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(grads_ref),
                    jax.tree_util.tree_leaves(grads_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-7)


def test_dcn_training_converges(setup):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nnpde_tpu.parallel import dp_dcn_step, make_mesh_dcn

    model, params, X, f, loss_fn = setup
    mesh = make_mesh_dcn(2, 4)

    def loss_x(p, Xb):
        jet = model.fields(p, Xb)
        return pinn_poisson(jet.lap, phys.rhs_f_for_u_sin(Xb, 2.0, [1, 1]))

    step = dp_dcn_step(loss_x, mesh)
    opt = optax.adam(1e-3)
    ps = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), params
    )
    Xs = jax.device_put(X, NamedSharding(mesh, P(("dcn", "data"))))
    opt_state = opt.init(ps)

    @jax.jit
    def train(ps, opt_state):
        loss, grads = step(ps, Xs)
        updates, opt_state = opt.update(grads, opt_state, ps)
        return optax.apply_updates(ps, updates), opt_state, loss

    losses = []
    for _ in range(60):
        ps, opt_state, loss = train(ps, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.all(np.isfinite(losses))


def test_fused_residual_step_matches_single_device(setup):
    """shard_map-wrapped fused kernel (pmean'd loss/grads) == unsharded
    fused call == the autodiff oracle, on the 8-device virtual mesh."""
    from nnpde_tpu.kernels import (
        fused_linear_residual, residual_coefficients,
    )
    from nnpde_tpu.parallel import fused_residual_step

    model, params, X, f, loss_fn = setup
    coef = residual_coefficients(model.factor.jet(X), a0=-1.0, rhs=-f)

    lo, _, go = fused_linear_residual(params, X, coef, "sin", bwd_tile=64)

    mesh = make_mesh()
    Xs = shard_batch(X, mesh)
    cs = shard_batch(coef, mesh)
    ps = replicate(params, mesh)
    step = jax.jit(fused_residual_step(mesh, "sin", bwd_tile=64))
    ls, sums, gs = step(ps, Xs, cs)

    np.testing.assert_allclose(float(ls), float(lo), rtol=1e-6)
    for (aw, ab), (bw, bb) in zip(gs, go):
        np.testing.assert_allclose(np.asarray(aw), np.asarray(bw),
                                   rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(np.asarray(ab), np.asarray(bb),
                                   rtol=1e-5, atol=1e-8)
    # psum'd raw sum: w=1, N points => sum_r2 == N * loss
    np.testing.assert_allclose(float(sums["sum_r2"]), float(lo) * X.shape[0],
                               rtol=1e-6)


def test_fused_drm_step_matches_single_device(setup):
    """kind='drm' shard_map step == unsharded fused DRM energy call."""
    from nnpde_tpu.kernels import drm_coefficients, fused_drm_energy
    from nnpde_tpu.parallel import fused_residual_step

    model, params, X, f, loss_fn = setup
    coef = drm_coefficients(model.factor.jet(X), f)
    lo, _, go = fused_drm_energy(params, X, coef, "sin", bwd_tile=64)

    mesh = make_mesh()
    step = jax.jit(fused_residual_step(mesh, "sin", kind="drm", bwd_tile=64))
    ls, sums, gs = step(replicate(params, mesh), shard_batch(X, mesh),
                        shard_batch(coef, mesh))
    np.testing.assert_allclose(float(ls), float(lo), rtol=1e-6)
    for (aw, ab), (bw, bb) in zip(gs, go):
        np.testing.assert_allclose(np.asarray(aw), np.asarray(bw),
                                   rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(float(sums["sum_e"]), float(lo) * X.shape[0],
                               rtol=1e-6)


def test_fused_step_on_dcn_mesh(setup):
    """Fused shard_map step over a 2-level (dcn, data) mesh: batch shards
    over the product axis, reductions over both levels."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nnpde_tpu.kernels import (
        fused_linear_residual, residual_coefficients,
    )
    from nnpde_tpu.parallel import fused_residual_step, make_mesh_dcn

    model, params, X, f, loss_fn = setup
    coef = residual_coefficients(model.factor.jet(X), a0=-1.0, rhs=-f)
    lo, _, go = fused_linear_residual(params, X, coef, "sin", bwd_tile=64)

    mesh = make_mesh_dcn(2, 4)
    spec = P(("dcn", "data"))
    Xs = jax.device_put(X, NamedSharding(mesh, spec))
    cs = jax.device_put(coef, NamedSharding(mesh, spec))
    ps = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), params)
    step = jax.jit(fused_residual_step(mesh, "sin", axis=("dcn", "data"),
                                       bwd_tile=64))
    ls, _, gs = step(ps, Xs, cs)
    np.testing.assert_allclose(float(ls), float(lo), rtol=1e-6)
    for (aw, _), (bw, _) in zip(gs, go):
        np.testing.assert_allclose(np.asarray(aw), np.asarray(bw),
                                   rtol=1e-5, atol=1e-8)


def test_fused_step_outputs_mesh_invariant_per_shard(setup):
    """Every shard's post-collective (loss, sums, grads) is BITWISE
    identical — the invariance the vma checker would prove statically if
    pallas-interpret supported it (fused_residual_step keeps
    check_vma=False; this test is its replacement guarantee).  Each
    shard's copy is surfaced by tiling the outputs along a leading axis
    with out_specs=P('data') instead of collapsing them with P()."""
    from jax.sharding import PartitionSpec as P

    from nnpde_tpu.kernels import (
        fused_linear_residual, residual_coefficients,
    )

    model, params, X, f, loss_fn = setup
    coef = residual_coefficients(model.factor.jet(X), a0=-1.0, rhs=-f)
    mesh = make_mesh()
    n_dev = mesh.devices.size

    def local(ps, Xl, cl):
        loss, aux, grads = fused_linear_residual(ps, Xl, cl, "sin",
                                                 bwd_tile=64)
        loss = jax.lax.pmean(loss, "data")
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, "data"), grads)
        sums = {k: jax.lax.psum(v, "data")
                for k, v in aux.items() if k != "n"}
        # expose each shard's copy of the reduced values
        tile = lambda x: jnp.asarray(x)[None]
        return (tile(loss), jax.tree_util.tree_map(tile, sums),
                jax.tree_util.tree_map(tile, grads))

    step = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P("data"), P("data"), P("data")),
        check_vma=False,
    )
    loss_t, sums_t, grads_t = jax.jit(step)(
        replicate(params, mesh), shard_batch(X, mesh),
        shard_batch(coef, mesh))

    for leaf in jax.tree_util.tree_leaves((loss_t, sums_t, grads_t)):
        arr = np.asarray(leaf)
        assert arr.shape[0] == n_dev
        for k in range(1, n_dev):
            np.testing.assert_array_equal(
                arr[k], arr[0],
                err_msg="fused-step output differs across shards — a "
                        "collective is missing in fused_residual_step")


def test_fused_rayleigh_step_matches_single_device(setup):
    """Sharded two-pass Rayleigh (pass-A psum between passes) == the
    unsharded custom VJP, loss and grads."""
    from nnpde_tpu.kernels import make_fused_rayleigh, quotient_coefficients
    from nnpde_tpu.parallel import fused_rayleigh_step

    model, params, X, f, loss_fn = setup
    V = 0.5 * jnp.sum(X ** 2, axis=1)
    coef = quotient_coefficients(model.factor.jet(X), V=V)

    # dot_dtype='float32': this test asserts SHARDING semantics (per-shard
    # psum == unsharded), so exclude the bf16x3 default's split-dot
    # reassociation noise, which the quotient seeds amplify by 1/den^2
    ray = make_fused_rayleigh("sin", weight=3.0, den_eps=1e-8, bwd_tile=64,
                              dot_dtype="float32")

    def obj(p):
        return ray(p, X, coef)

    (lo, auxo), go = jax.value_and_grad(obj, has_aux=True)(params)

    mesh = make_mesh()
    step = jax.jit(fused_rayleigh_step(mesh, "sin", weight=3.0,
                                       den_eps=1e-8, bwd_tile=64,
                                       dot_dtype="float32"))
    ls, auxs, gs = step(replicate(params, mesh), shard_batch(X, mesh),
                        shard_batch(coef, mesh))
    np.testing.assert_allclose(float(ls), float(lo), rtol=1e-6)
    np.testing.assert_allclose(float(auxs["rayleigh"]),
                               float(auxo["rayleigh"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gs),
                    jax.tree_util.tree_leaves(go)):
        # quotient seeds carry 1/den^2 amplification: per-shard summation
        # order shifts the last ~2 bits relative to the unsharded pass
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=2e-6)


def test_fused_wan_steps_match_single_device(setup):
    """Sharded fused WAN u/v steps == the unsharded custom VJPs (incl. the
    trainable-E gradient and the in-step global phi_norm)."""
    from nnpde_tpu.kernels import (
        linear_functional_coefficients,
        make_fused_wan_u,
        make_fused_wan_v,
    )
    from nnpde_tpu.parallel import fused_wan_u_step, fused_wan_v_step

    model, params, X, f, loss_fn = setup
    N, d = X.shape
    key = jax.random.PRNGKey(3)
    phi = jax.random.normal(key, (N,))
    gphi = jax.random.normal(jax.random.fold_in(key, 1), (N, d))
    V = 0.3 * jnp.sum(X ** 2, axis=1)
    E0 = jnp.asarray(2.1)
    B = model.factor.jet(X)
    base = linear_functional_coefficients(
        B, c0=V * phi, b0=0.5 * gphi, e1=B.value, e2=B.value * phi)
    pn = jnp.mean(phi ** 2)

    u_loss = make_fused_wan_u("sin", vol=4.0, w_pde=10.0, w_norm=100.0,
                              bwd_tile=64)

    def obj(p, E):
        return u_loss(p, E, X, base, pn)

    (lo, auxo), (go, dEo) = jax.value_and_grad(
        obj, argnums=(0, 1), has_aux=True)(params, E0)

    mesh = make_mesh()
    ustep = jax.jit(fused_wan_u_step(mesh, "sin", vol=4.0, w_pde=10.0,
                                     w_norm=100.0, bwd_tile=64))
    ls, auxs, gs, dEs = ustep(replicate(params, mesh), E0,
                              shard_batch(X, mesh),
                              shard_batch(base, mesh),
                              shard_batch(phi, mesh))
    np.testing.assert_allclose(float(ls), float(lo), rtol=1e-6)
    np.testing.assert_allclose(float(dEs), float(dEo), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gs),
                    jax.tree_util.tree_leaves(go)):
        # quotient seeds carry 1/den^2 amplification: per-shard summation
        # order shifts the last ~2 bits relative to the unsharded pass
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=2e-6)

    # critic step: bump-like multiplier, -log objective
    u_dat = jax.random.normal(jax.random.fold_in(key, 2), (N,))
    gu = jax.random.normal(jax.random.fold_in(key, 3), (N, d))
    coef_v = linear_functional_coefficients(
        B, c0=(V - 2.1) * u_dat, b0=0.5 * gu, e1=B.value)
    v_loss = make_fused_wan_v("sin", bwd_tile=64)

    def vobj(p):
        return v_loss(p, X, coef_v)

    (lvo, _), gvo = jax.value_and_grad(vobj, has_aux=True)(params)
    vstep = jax.jit(fused_wan_v_step(mesh, "sin", bwd_tile=64))
    lvs, _, gvs = vstep(replicate(params, mesh), shard_batch(X, mesh),
                        shard_batch(coef_v, mesh))
    np.testing.assert_allclose(float(lvs), float(lvo), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gvs),
                    jax.tree_util.tree_leaves(gvo)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=2e-6)
