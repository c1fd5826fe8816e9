"""3D infinite well preset (scale superset; sampled collocation)."""

import jax.numpy as jnp
import numpy as np

from nnpde_tpu.pde import ipw as phys
from nnpde_tpu.problems.ipw3d import IPW3DConfig, train_ipw_3d


def test_psi3d_solves_helmholtz():
    """-lap psi = 2E psi for the analytic 3D product state."""
    import jax

    L = 2.0
    f = lambda x: phys.psi_3d(2, 1, 1, x[0], x[1], x[2], L)
    X = jax.random.uniform(jax.random.PRNGKey(0), (64, 3), maxval=L)
    lap = jax.vmap(lambda x: jnp.trace(jax.hessian(f)(x)))(X)
    u = jax.vmap(f)(X)
    k2 = 2.0 * phys.energy_3d(2, 1, 1, L)
    np.testing.assert_allclose(np.asarray(-lap), np.asarray(k2 * u),
                               rtol=2e-4, atol=2e-4)


def test_ipw3d_trains_and_paths_match():
    base = dict(nx=1, ny=1, nz=1, epochs=80, n_interior=2048, chunk=20,
                layers=(3, 16, 16, 1), data_grid_n=8, n_eval=2048, seed=0)
    a = train_ipw_3d(IPW3DConfig(jet_impl="xla", **base))
    b = train_ipw_3d(IPW3DConfig(jet_impl="pallas-fused", **base))
    assert np.isfinite(a["rel_l2"]) and np.isfinite(b["rel_l2"])
    np.testing.assert_allclose(b["history"]["total"][0],
                               a["history"]["total"][0], rtol=1e-4)
    # the FN nodal-plane factor hard-enforces the boundary: zero at faces
    m = a["model"]
    Xb = jnp.array([[0.0, 1.0, 1.0], [2.0, 0.5, 0.3], [1.0, 2.0, 0.7]])
    u_b = m.apply_batch(a["result"].best_params, Xb)
    np.testing.assert_allclose(np.asarray(u_b), 0.0, atol=1e-6)


def test_ipw3d_converges_short():
    out = train_ipw_3d(IPW3DConfig(
        nx=1, ny=1, nz=1, epochs=600, n_interior=4096, chunk=100,
        layers=(3, 32, 32, 1), data_grid_n=10, n_eval=4096,
        jet_impl="pallas-fused", seed=0))
    assert out["rel_l2"] < 0.2, out["rel_l2"]
