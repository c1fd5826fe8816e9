"""Randomised QMC: per-epoch Cranley-Patterson rotation of a Sobol base.

Round-1 gap (VERDICT.md item 5): sobol was fixed-set only, so QMC could not
combine with per-epoch resampling; this is the device-side fix.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nnpde_tpu.pde.domain import Box
from nnpde_tpu.sampling import shifted_qmc, sobol_box, sobol_unit, uniform_box


def test_sobol_unit_in_cube():
    u = sobol_unit(0, 256, 3)
    assert u.shape == (256, 3)
    assert float(u.min()) >= 0.0 and float(u.max()) < 1.0


def test_sobol_box_matches_unit_scaling():
    box = Box.cube(2, -1.0, 3.0)
    x = sobol_box(7, 128, box)
    u = sobol_unit(7, 128, 2)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(-1.0 + u * 4.0), rtol=1e-6
    )


def test_shifted_qmc_unbiased_and_in_box():
    box = Box.cube(2, 0.0, 2.0)
    u = sobol_unit(0, 512, 2)
    xs = []
    for i in range(64):
        x = shifted_qmc(u, jax.random.PRNGKey(i), box)
        assert float(x.min()) >= 0.0 and float(x.max()) < 2.0
        xs.append(np.asarray(x))
    # mean over many random shifts approaches the box centre (unbiasedness)
    m = np.mean(np.concatenate(xs, 0), axis=0)
    np.testing.assert_allclose(m, [1.0, 1.0], atol=0.02)


def test_shifted_qmc_keeps_low_discrepancy():
    """The shifted set must fill space far more evenly than iid uniform:
    compare max bin deviation on a 16-bin histogram per axis."""
    box = Box.cube(1, 0.0, 1.0)
    n = 4096
    u = sobol_unit(3, n, 1)
    x_qmc = np.asarray(shifted_qmc(u, jax.random.PRNGKey(5), box))[:, 0]
    x_iid = np.asarray(uniform_box(jax.random.PRNGKey(5), n, box))[:, 0]
    h_qmc, _ = np.histogram(x_qmc, bins=16, range=(0, 1))
    h_iid, _ = np.histogram(x_iid, bins=16, range=(0, 1))
    dev_qmc = np.abs(h_qmc - n / 16).max()
    dev_iid = np.abs(h_iid - n / 16).max()
    assert dev_qmc < dev_iid, (dev_qmc, dev_iid)
    assert dev_qmc <= 2  # Sobol+shift: near-perfect stratification


def test_poisson_sobol_resample_composes():
    from nnpde_tpu.problems.poisson import PoissonConfig, train_poisson_nd

    out = train_poisson_nd(PoissonConfig(
        dim=2, method="DRM", bc_mode="FBC", epochs=200, chunk=100,
        n_interior=1024, n_eval=512, width=32, depth=4,
        sampler="sobol", resample=True, lr=2e-3,
    ))
    assert np.all(np.isfinite(out["history"]["l2"]))
