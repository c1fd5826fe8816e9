"""Runner plot generation: 2D quad plots and KH overlays are emitted."""

import os

from nnpde_tpu.exp.run import run_ipw_2d
from nnpde_tpu.pde import kh as khphys
from nnpde_tpu.problems.ipw2d import IPW2DConfig
from nnpde_tpu.problems.kh import KHCompareConfig, run_compare


def test_run_ipw_2d_emits_quad_plot(tmp_path):
    out = run_ipw_2d(
        IPW2DConfig(nx=1, ny=1, method="DRM", epochs=20, chunk=20,
                    grid_n=16, data_grid_n=8, n_boundary=8,
                    layers=(2, 8, 8, 1)),
        save_dir=str(tmp_path), plot=True,
    )
    assert os.path.exists(out["plot_path"])
    assert os.path.getsize(out["plot_path"]) > 20_000


def test_run_compare_emits_kh_overlay(tmp_path):
    rows = run_compare(KHCompareConfig(
        alpha=0.0, L=15.0, n_ref=400, n_max=1, epochs=20,
        layers=(1, 8, 8, 1), train_n=128, methods=("PINN",),
        save_dir=str(tmp_path), chunk=20,
    ))
    assert os.path.exists(rows[0]["plot_path"])


def test_run_ipw_1d_emits_overlay_and_curves(tmp_path):
    from nnpde_tpu.exp.run import run_ipw_1d
    from nnpde_tpu.problems.ipw import IPW1DConfig

    out = run_ipw_1d(
        IPW1DConfig(n=2, method="PINN", technique="FN", epochs=30, chunk=30,
                    layers=(1, 8, 8, 1)),
        save_dir=str(tmp_path), plot=True,
    )
    assert len(out["plot_paths"]) == 3  # overlay + losses + L2 curves
    for p in out["plot_paths"]:
        assert os.path.exists(p), p


def test_profiler_trace_smoke(tmp_path):
    import jax
    import jax.numpy as jnp

    from nnpde_tpu.runtime import profile_trace

    with profile_trace(str(tmp_path)):
        jax.block_until_ready(jax.jit(lambda x: (x @ x).sum())(jnp.ones((64, 64))))
    # a trace directory with at least one event file was produced
    files = [p for p in (tmp_path).rglob("*") if p.is_file()]
    assert files, "no profiler output written"


def test_floquet_harmonics_plot(tmp_path):
    import numpy as np

    from nnpde_tpu.exp.plotting import plot_floquet_harmonics

    x = np.linspace(-5, 5, 200)
    C = 5
    re = np.exp(-x[:, None] ** 2) * np.linspace(1.0, 0.01, C)[None, :]
    im = 0.1 * re
    png = plot_floquet_harmonics(
        x, re, im, re * 1.01, im * 0.99, M=2, eps_est=-0.0123,
        out_png=str(tmp_path / "floq.png"),
    )
    import os

    assert os.path.exists(png)
    assert os.path.getsize(png) > 20_000


def test_ipw3d_slice_plot(tmp_path):
    from nnpde_tpu.exp.run import plot_ipw_3d_slice, run_ipw_3d
    from nnpde_tpu.problems.ipw3d import IPW3DConfig

    out = run_ipw_3d(
        IPW3DConfig(epochs=10, n_interior=512, chunk=10,
                    layers=(3, 8, 8, 1), data_grid_n=4, n_eval=512),
        save_dir=str(tmp_path),
    )
    p = plot_ipw_3d_slice(out, str(tmp_path), "t", n=16)
    import os

    assert os.path.exists(p)


def test_run_subspace_emits_states_plot(tmp_path):
    from nnpde_tpu.exp.run import run_subspace
    from nnpde_tpu.problems.subspace import SubspaceConfig

    out = run_subspace(
        SubspaceConfig(problem="ipw", k=2, x_max=1.0, epochs=60, width=16,
                       depth=2, grid_n=64, eval_grid_n=128, chunk=30),
        save_dir=str(tmp_path),
    )
    assert os.path.exists(out["row"]["states_plot"])
    assert os.path.getsize(out["row"]["states_plot"]) > 20_000
