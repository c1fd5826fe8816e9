"""L-BFGS polish unit test + driver entry-point smoke (on the test mesh)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def test_lbfgs_polish_quadratic():
    """Strong-Wolfe L-BFGS must solve a convex quadratic to high precision."""
    from nnpde_tpu.train import lbfgs_polish

    A = jnp.array([[3.0, 1.0], [1.0, 2.0]])
    b = jnp.array([1.0, -2.0])

    def loss(p):
        x = p["x"]
        return 0.5 * x @ A @ x - b @ x

    params, value = lbfgs_polish(loss, {"x": jnp.zeros(2)}, max_iter=100)
    x_star = jnp.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(params["x"]), np.asarray(x_star),
                               rtol=1e-5, atol=1e-6)


def test_lbfgs_polish_improves_short_ipw_run():
    from nnpde_tpu.problems.ipw import IPW1DConfig, train_ipw_1d

    base = train_ipw_1d(IPW1DConfig(
        n=1, method="PINN", technique="FBC", epochs=100, chunk=100,
        layers=(1, 16, 16, 1),
    ))
    polished = train_ipw_1d(IPW1DConfig(
        n=1, method="PINN", technique="FBC", epochs=100, chunk=100,
        layers=(1, 16, 16, 1), LBFGS=True,
    ))
    # the polish step must not degrade the recorded best
    assert polished["L2_error"] <= base["L2_error"] * 1.001


def test_graft_entry_dryrun_on_test_mesh():
    """conftest gives this process 8 CPU devices — the dryrun should take
    the direct (no-subprocess) path and succeed."""
    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    loss, u = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    assert u.shape == (4096,)


def test_lbfgs_fit_quadratic_with_best_tracking():
    """From-scratch L-BFGS (QHO_1D_PINN_DRM.py:437-439 mode): solves a
    quadratic, tracks the best iterate, and early-stops via the done flag."""
    from nnpde_tpu.train import lbfgs_fit

    A = jnp.array([[3.0, 1.0], [1.0, 2.0]])
    b = jnp.array([1.0, -2.0])
    x_star = jnp.linalg.solve(A, b)

    def loss(p):
        x = p["x"]
        return 0.5 * x @ A @ x - b @ x

    def ev(p):
        return jnp.sum((p["x"] - x_star) ** 2)

    res = lbfgs_fit(loss, ev, {"x": jnp.zeros(2)}, max_iter=60, chunk=30)
    assert res.best_metric < 1e-10
    assert res.history["l2"].shape == (60,)
    # converged long before 60 iters; the tail is a no-op, best stays put
    np.testing.assert_allclose(
        np.asarray(res.best_params["x"]), np.asarray(x_star), atol=1e-5
    )


def test_qho1d_lbfgs_replace_mode_runs():
    from nnpde_tpu.problems.qho import QHO1DConfig, train_qho_1d

    out = train_qho_1d(QHO1DConfig(
        n=0, method="PINN", technique="FN", epochs=0, LBFGS=True,
        lbfgs_mode="replace", lbfgs_iters=40, grid_n=128,
        layers=(1, 16, 16, 1),
    ))
    assert np.isfinite(out["L2_error"])
    assert len(out["history"]["l2"]) == 40
