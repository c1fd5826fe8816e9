"""Minimax update rules in fit_wan (extragradient / optimistic / EMA).

The reference only ever runs alternating GDA (IPW_1D_WAN.py:184-208); these
modes are framework extensions attacking the 2D WAN accuracy floor
(TODO.md §4).  The bilinear saddle min_x max_y xy is the canonical
correctness oracle: simultaneous/alternating GDA spirals away from the
saddle (0, 0) while extragradient and OGDA contract onto it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nnpde_tpu.train import fit_wan


def _bilinear_run(minimax, lr=0.2, epochs=800):
    # min_u max_v  u*v  — saddle at (0, 0)
    def u_loss(u, v, key):
        return u["x"] * v["y"], {}

    def v_loss(v, u, key):
        return -u["x"] * v["y"]  # critic minimises the negation (ascent)

    def eval_fn(u, key):
        return jnp.abs(u["x"])

    res = fit_wan(
        u_loss, v_loss, eval_fn,
        {"x": jnp.asarray(1.0)}, {"y": jnp.asarray(1.0)},
        epochs=epochs, v_steps=1,
        u_optimizer=optax.sgd(lr), v_optimizer=optax.sgd(lr),
        key=jax.random.PRNGKey(0), chunk=epochs, minimax=minimax,
    )
    return float(jnp.hypot(res.params["x"], res.v_params["y"]))


def test_bilinear_gda_diverges_eg_ogda_converge():
    r_gda = _bilinear_run("alternating")
    r_eg = _bilinear_run("extragradient")
    r_ogda = _bilinear_run("optimistic")
    # GDA on the bilinear saddle does not contract; EG/OGDA do
    assert r_eg < 1e-2
    assert r_ogda < 1e-2
    assert r_gda > 10 * max(r_eg, r_ogda)


def test_unknown_minimax_mode_rejected():
    with pytest.raises(ValueError):
        _bilinear_run("adamax-pair")


def test_ema_tracked_and_can_win():
    # A pure rotation makes the last iterate orbit at constant radius while
    # the running average contracts to the saddle — the EMA must be the one
    # the best-snapshot logic picks up.
    def u_loss(u, v, key):
        return u["x"] * v["y"], {}

    def v_loss(v, u, key):
        return -u["x"] * v["y"]

    def eval_fn(u, key):
        return jnp.abs(u["x"])

    res = fit_wan(
        u_loss, v_loss, eval_fn,
        {"x": jnp.asarray(1.0)}, {"y": jnp.asarray(1.0)},
        epochs=400, v_steps=1,
        u_optimizer=optax.sgd(0.05), v_optimizer=optax.sgd(0.05),
        key=jax.random.PRNGKey(0), chunk=200, u_ema=0.99,
    )
    assert "l2_ema" in res.history
    assert np.isfinite(res.history["l2_ema"]).all()
    # the averaged iterate beats every raw iterate's orbit radius
    assert res.best_metric < np.min(res.history["l2"]) + 1e-9


def test_wan_modes_on_ipw2d_smoke():
    from nnpde_tpu.problems.ipw2d import IPW2DConfig, train_ipw_2d

    for minimax in ("extragradient", "optimistic"):
        out = train_ipw_2d(IPW2DConfig(
            nx=1, ny=1, method="WAN", technique="FN", epochs=60, chunk=30,
            grid_n=24, data_grid_n=10, n_boundary=20,
            layers=(2, 16, 16, 1), v_layers=(2, 8, 8, 1), v_steps=2,
            minimax=minimax, v_lr=2e-3, u_ema=0.995,
        ))
        assert np.all(np.isfinite(out["history"]["l2"]))
        assert "l2_ema" in out["history"]


def test_make_wan_optimizers_schedule_horizons():
    """The critic schedule must span epochs*v_steps updates (the round-1
    'fixedcritic' regression): after its full horizon, a cosine critic lr
    has decayed to final_scale; the primal reaches the same point after
    only `epochs` updates."""
    from nnpde_tpu.train import make_wan_optimizers

    epochs, v_steps, lr = 100, 5, 1e-2
    u_opt, v_opt = make_wan_optimizers(
        lr, schedule="cosine", epochs=epochs, v_steps=v_steps)

    def last_update_scale(opt, n_steps):
        p = {"x": jnp.zeros(())}
        g = {"x": jnp.ones(())}
        s = opt.init(p)
        for _ in range(n_steps):
            upd, s = opt.update(g, s, p)
        return abs(float(upd["x"]))

    # stepping the critic only `epochs` times must leave it mid-schedule
    # (lr well above the floor), not fully decayed
    v_mid = last_update_scale(v_opt, epochs)
    v_end = last_update_scale(v_opt, epochs * v_steps)
    u_end = last_update_scale(u_opt, epochs)
    assert v_mid > 3 * v_end
    assert abs(v_end - u_end) / u_end < 0.2  # same floor at their horizons


def test_cosine_decay_then_hold():
    """decay_steps < total_steps: the lr decays over decay_steps then HOLDS
    at the schedule floor for the rest of the run (the WAN 'decay fast,
    then hold' protocol; train/optim.py)."""
    from nnpde_tpu.train import make_optimizer

    opt = make_optimizer(1e-2, schedule="cosine", total_steps=1000,
                         decay_steps=200)
    p = {"x": jnp.zeros(())}
    s = opt.init(p)
    g = {"x": jnp.ones(())}

    def scale_at(n):
        st = s
        for _ in range(n):
            upd, st = opt.update(g, st, p)
        return abs(float(upd["x"]))

    early, floor_a, floor_b = scale_at(10), scale_at(300), scale_at(900)
    assert early > 3 * floor_a           # decayed well before total_steps
    assert abs(floor_a - floor_b) / floor_a < 0.05   # flat hold after decay


def test_wan_grid_jitter_single_forward_path():
    """grid_jitter: every integral term rides the jittered lattice — the
    run is finite and deterministic per seed, and differs from the fixed-
    grid run (the jitter actually reaches the loss).  Round-3 refactor:
    the jitter path no longer does a second full-grid forward (the grid400
    HBM-crash suspect, TODO Open #3)."""
    from nnpde_tpu.problems.ipw2d import IPW2DConfig, train_ipw_2d

    base = dict(
        nx=1, ny=1, method="WAN", technique="FN", epochs=40, chunk=20,
        grid_n=24, data_grid_n=10, n_boundary=20,
        layers=(2, 16, 16, 1), v_layers=(2, 8, 8, 1), v_steps=2,
        minimax="extragradient", v_lr=2e-3,
    )
    out_j = train_ipw_2d(IPW2DConfig(grid_jitter=True, **base))
    out_j2 = train_ipw_2d(IPW2DConfig(grid_jitter=True, **base))
    out_f = train_ipw_2d(IPW2DConfig(**base))
    assert np.all(np.isfinite(out_j["history"]["l2"]))
    assert out_j["L2_error"] == out_j2["L2_error"]          # seed-determinism
    assert out_j["history"]["total"][-1] != out_f["history"]["total"][-1]


def test_wan_grid_jitter_fixed_anchors():
    """jitter_anchors_fixed: the weak form rides the jittered lattice but
    the norm/parity/symmetry anchors return to the FIXED grid (round-Q
    floor attack, docs/WAN_FLOOR.md: jitter's composition loss is
    amplitude wander from a moving norm target).  The run is finite,
    seed-deterministic, and differs from both the pure-jitter and the
    fixed-grid runs (both halves of the split actually reach the loss)."""
    from nnpde_tpu.problems.ipw2d import IPW2DConfig, train_ipw_2d

    base = dict(
        nx=1, ny=1, method="WAN", technique="FN", epochs=40, chunk=20,
        grid_n=24, data_grid_n=10, n_boundary=20,
        layers=(2, 16, 16, 1), v_layers=(2, 8, 8, 1), v_steps=2,
        minimax="extragradient", v_lr=2e-3,
        weights={"norm": 100.0},
    )
    out_fa = train_ipw_2d(IPW2DConfig(
        grid_jitter=True, jitter_anchors_fixed=True, **base))
    out_fa2 = train_ipw_2d(IPW2DConfig(
        grid_jitter=True, jitter_anchors_fixed=True, **base))
    out_j = train_ipw_2d(IPW2DConfig(grid_jitter=True, **base))
    out_f = train_ipw_2d(IPW2DConfig(**base))
    assert np.all(np.isfinite(out_fa["history"]["l2"]))
    assert out_fa["L2_error"] == out_fa2["L2_error"]        # seed-determinism
    assert out_fa["history"]["total"][-1] != out_j["history"]["total"][-1]
    assert out_fa["history"]["total"][-1] != out_f["history"]["total"][-1]


def test_wan_grid_jitter_with_symmetry_orth_terms():
    """Degenerate pair (nx == ny) with an orthogonality override: the
    jittered path must rebuild lower states on the jittered lattice (the
    fixed-grid `lower` table no longer matches u's quadrature set)."""
    from nnpde_tpu.problems.ipw2d import IPW2DConfig, train_ipw_2d

    out = train_ipw_2d(IPW2DConfig(
        nx=2, ny=2, method="WAN", technique="FN", epochs=20, chunk=10,
        grid_n=16, data_grid_n=8, n_boundary=12,
        layers=(2, 12, 12, 1), v_layers=(2, 8, 8, 1), v_steps=1,
        grid_jitter=True, weights={"orth": 100.0},
    ))
    assert np.all(np.isfinite(out["history"]["l2"]))


def test_fit_compile_only_memory_probe():
    """compile_only returns XLA memory-analysis numbers, not a FitResult
    (the HBM-pressure probe of TODO Open #3; scripts/wan_mem_probe.py)."""
    from nnpde_tpu.problems.ipw2d import IPW2DConfig, train_ipw_2d

    stats = train_ipw_2d(IPW2DConfig(
        nx=1, ny=1, method="WAN", technique="FN", epochs=10, chunk=5,
        grid_n=12, data_grid_n=8, n_boundary=8,
        layers=(2, 8, 8, 1), v_layers=(2, 8, 1), v_steps=1,
    ), compile_only=True)
    assert isinstance(stats, dict)
    for k in ("argument_size_in_bytes", "temp_size_in_bytes",
              "total_nonalias_bytes"):
        assert k in stats
    # PINN branch probes fit() the same way
    stats_p = train_ipw_2d(IPW2DConfig(
        nx=1, ny=1, method="PINN", technique="FBC", epochs=10, chunk=5,
        grid_n=12, data_grid_n=8, n_boundary=8, layers=(2, 8, 8, 1),
    ), compile_only=True)
    assert "argument_size_in_bytes" in stats_p
