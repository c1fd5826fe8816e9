"""Loss-zoo and sampler unit tests against hand-computed oracles and the
reference's exact indexing rules."""

import jax
import jax.numpy as jnp
import numpy as np

from nnpde_tpu.losses.zoo import (
    drm_poisson_energy,
    drm_rayleigh,
    drm_rayleigh_unscaled,
    norm_integral,
    norm_nontrivial,
    norm_pointwise,
    norm_trapezoid,
    orthogonal_projection,
    pinn_helmholtz,
    pinn_poisson,
    pinn_schrodinger,
    reflection_mse,
    wan_pde_loss,
    wan_weak_residual,
)
from nnpde_tpu.pde.domain import Box
from nnpde_tpu.sampling import (
    face_points,
    first_fraction_every_kth,
    first_fraction_indices,
    mid_fraction_every_kth,
    uniform_box,
)

rng = np.random.default_rng(0)
N, d = 64, 3
u = jnp.asarray(rng.normal(size=N), jnp.float32)
g = jnp.asarray(rng.normal(size=(N, d)), jnp.float32)
lap = jnp.asarray(rng.normal(size=N), jnp.float32)
f = jnp.asarray(rng.normal(size=N), jnp.float32)
V = jnp.asarray(rng.normal(size=N) ** 2, jnp.float32)


def test_strong_residuals():
    np.testing.assert_allclose(
        float(pinn_poisson(lap, f)), float(jnp.mean((-lap - f) ** 2)), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(pinn_helmholtz(u, lap, 4.0)),
        float(jnp.mean((lap + 4.0 * u) ** 2)), rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(pinn_schrodinger(u, lap, V, 1.5)),
        float(jnp.mean((-0.5 * lap + V * u - 1.5 * u) ** 2)), rtol=1e-6,
    )


def test_ritz_energies():
    np.testing.assert_allclose(
        float(drm_poisson_energy(u, g, f)),
        float(jnp.mean(0.5 * jnp.sum(g * g, 1) - f * u)), rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(drm_rayleigh(u, g, V)),
        float(jnp.mean(0.5 * jnp.sum(g * g, 1) + V * u * u) / jnp.mean(u * u)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(drm_rayleigh_unscaled(u, g)),
        float(jnp.mean(jnp.sum(g * g, 1)) / jnp.mean(u * u)), rtol=1e-5,
    )


def test_norm_variants():
    np.testing.assert_allclose(
        float(norm_pointwise(u)), float(jnp.mean((u * u - 1) ** 2)), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(norm_integral(u, 2.0)), float((2 * jnp.mean(u * u) - 1) ** 2),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(norm_trapezoid(u, 0.1)),
        float((jnp.sqrt(jnp.sum(u * u) * 0.1) - 1) ** 2), rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(norm_nontrivial(u)), float(1.0 / (jnp.mean(u * u) + 1e-8)),
        rtol=1e-6,
    )


def test_orthogonal_projection_against_loop():
    lower = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    vol = 2.0
    got = float(orthogonal_projection(u, lower, vol))
    want = 0.0
    for k in range(3):
        inner = vol * float(jnp.mean(u * lower[:, k]))
        nsq = vol * float(jnp.mean(lower[:, k] ** 2))
        want += inner**2 / (nsq + 1e-8)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert float(orthogonal_projection(u, lower[:, :0], vol)) == 0.0


def test_wan_conventions():
    phi = jnp.asarray(rng.normal(size=N), jnp.float32)
    gphi = jnp.asarray(rng.normal(size=(N, d)), jnp.float32)
    wr = wan_weak_residual(g, phi, gphi, u=u, V=V, E=1.5, prefactor=0.5)
    want = float(jnp.mean(
        0.5 * jnp.sum(g * gphi, 1) + V * u * phi - 1.5 * u * phi
    ))
    np.testing.assert_allclose(float(wr), want, rtol=1e-5)
    # both normalisation conventions
    np.testing.assert_allclose(
        float(wan_pde_loss(jnp.asarray(2.0), jnp.asarray(4.0))),
        4.0 / (4.0 + 1e-8), rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(wan_pde_loss(jnp.asarray(2.0), jnp.asarray(4.0),
                           convention="ratio_sq")),
        (2.0 / (4.0 + 1e-8)) ** 2, rtol=1e-6,
    )


def test_reflection_mse_signs():
    a = jnp.asarray([1.0, 2.0])
    b = jnp.asarray([1.0, -2.0])
    assert float(reflection_mse(a, a)) == 0.0
    np.testing.assert_allclose(float(reflection_mse(a, b, -1.0)), 2.0)


# ------------------------------------------------------------------ samplers
def test_data_subset_rules_match_reference_indexing():
    # IPW_1D_PINN_DRM.py:114-117 — x_full[0:250:10]
    np.testing.assert_array_equal(
        np.asarray(first_fraction_every_kth(1000, 0.25, 10)),
        np.arange(0, 250, 10),
    )
    # QHO_1D_PINN_DRM.py:421-424 — x_full[250:500:10]
    np.testing.assert_array_equal(
        np.asarray(mid_fraction_every_kth(1000, 0.25, 10)),
        np.arange(250, 500, 10),
    )
    # KH_1D.py:283-287 — first max(1, m*fraction) capped
    np.testing.assert_array_equal(
        np.asarray(first_fraction_indices(1024, 0.25, max_points=128)),
        np.arange(128),
    )
    np.testing.assert_array_equal(
        np.asarray(first_fraction_indices(4, 0.1)), np.arange(1)
    )


def test_face_points_pin_each_coordinate():
    box = Box.cube(3, 0.0, 2.0)
    pts = face_points(jax.random.PRNGKey(0), 5, box)
    assert pts.shape == (2 * 3 * 5, 3)
    pts = np.asarray(pts)
    for i in range(3):
        lo_face = pts[2 * i * 5:(2 * i + 1) * 5]
        hi_face = pts[(2 * i + 1) * 5:(2 * i + 2) * 5]
        assert np.all(lo_face[:, i] == 0.0)
        assert np.all(hi_face[:, i] == 2.0)
        # all points stay in the box
    assert pts.min() >= 0.0 and pts.max() <= 2.0


def test_uniform_box_bounds():
    box = Box(lo=(-1.0, 0.0), hi=(1.0, 3.0))
    pts = np.asarray(uniform_box(jax.random.PRNGKey(1), 512, box))
    assert pts[:, 0].min() >= -1.0 and pts[:, 0].max() <= 1.0
    assert pts[:, 1].min() >= 0.0 and pts[:, 1].max() <= 3.0
    assert box.volume == 6.0


def test_sobol_box_bounds_and_determinism():
    from nnpde_tpu.sampling import sobol_box

    box = Box(lo=(0.0, -1.0), hi=(2.0, 1.0))
    a = np.asarray(sobol_box(0, 256, box))
    b = np.asarray(sobol_box(0, 256, box))
    np.testing.assert_array_equal(a, b)  # seeded => deterministic
    assert a.shape == (256, 2)
    assert a[:, 0].min() >= 0.0 and a[:, 0].max() <= 2.0
    assert a[:, 1].min() >= -1.0 and a[:, 1].max() <= 1.0
    # QMC stratification: mean much closer to the centre than MC at this N
    assert abs(a[:, 0].mean() - 1.0) < 0.02
