"""Checkpoint/resume: a split run must bit-match a continuous run.

The reference can only checkpoint (best-state .pth), never resume training
(SURVEY.md §5); this is a capability superset: the full carry (params +
optimizer state + best tracking) round-trips through msgpack.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nnpde_tpu.exp import load_train_state, save_train_state
from nnpde_tpu.losses import pinn_poisson
from nnpde_tpu.models import NetSpec, SolutionModel, factor_for_technique
from nnpde_tpu.pde import poisson as phys
from nnpde_tpu.train import fit


@pytest.fixture(scope="module")
def problem():
    L, d = 2.0, 1
    model = SolutionModel(
        NetSpec((d, 16, 16, 1), "sin"),
        factor_for_technique("FBC", dim=d, kind="box", L=L),
    )
    params = model.init(jax.random.PRNGKey(0))
    X = jax.random.uniform(jax.random.PRNGKey(1), (256, d), maxval=L)
    f = phys.rhs_f_for_u_sin(X, L, [1])

    def loss_fn(p, key):
        jet = model.fields(p, X)
        return pinn_poisson(jet.lap, f), {}

    def eval_fn(p, key):
        u = model.apply_batch(p, X)
        return jnp.mean((u - phys.exact_u_prod_sin(X, L, [1])) ** 2)

    return model, params, loss_fn, eval_fn


def test_split_run_matches_continuous(problem, tmp_path):
    model, params, loss_fn, eval_fn = problem
    key = jax.random.PRNGKey(7)
    opt = optax.adam(1e-3)

    full = fit(loss_fn, eval_fn, params, epochs=200, optimizer=opt, key=key,
               chunk=100)

    first = fit(loss_fn, eval_fn, params, epochs=100, optimizer=opt, key=key,
                chunk=100)
    # round-trip the full state through disk
    path = str(tmp_path / "state.msgpack")
    save_train_state(path, first.carry)
    template = fit(loss_fn, eval_fn, params, epochs=1, optimizer=opt, key=key,
                   chunk=1).carry
    restored = load_train_state(path, template)
    second = fit(
        loss_fn, eval_fn, params, epochs=100, optimizer=opt, key=key,
        chunk=100, init_carry=restored, start_epoch=100,
    )

    # same per-epoch keys => identical trajectory
    np.testing.assert_allclose(
        np.concatenate([first.history["l2"], second.history["l2"]]),
        full.history["l2"], rtol=1e-6, atol=1e-8,
    )
    assert second.best_epoch == full.best_epoch
    for a, b in zip(jax.tree_util.tree_leaves(second.params),
                    jax.tree_util.tree_leaves(full.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_timing_counters(problem):
    model, params, loss_fn, eval_fn = problem
    r = fit(loss_fn, eval_fn, params, epochs=50, optimizer=optax.adam(1e-3),
            key=jax.random.PRNGKey(0), chunk=25)
    assert r.timing["elapsed_s"] > 0
    assert np.isfinite(r.timing["steps_per_s"])


def test_ipw2d_wan_segmented(tmp_path):
    """Segmented train_ipw_2d (the wan_floor --segmented protocol) must
    bit-match one continuous run: full minimax carry through disk, cosine
    schedule + jitter keys indexed by absolute epoch."""
    from nnpde_tpu.problems.ipw2d import IPW2DConfig, train_ipw_2d

    kw = dict(nx=1, ny=1, method="WAN", technique="FN", epochs=40,
              lr_schedule="cosine", minimax="extragradient",
              grid_jitter=True, eval_selfnorm=True, grid_n=16,
              data_grid_n=8, n_boundary=8, chunk=10,
              layers=(2, 12, 12, 1), v_layers=(2, 8, 8, 1))
    full = train_ipw_2d(IPW2DConfig(**kw))

    cfg = IPW2DConfig(**kw)
    seg1 = train_ipw_2d(cfg, run_epochs=25)
    path = str(tmp_path / "seg.msgpack")
    save_train_state(path, seg1["result"].carry)
    template = train_ipw_2d(cfg, run_epochs=0)["result"].carry
    restored = load_train_state(path, template)
    seg2 = train_ipw_2d(cfg, init_carry=restored, start_epoch=25)

    assert seg2["min_epoch"] == full["min_epoch"]
    np.testing.assert_allclose(seg2["rel_l2"], full["rel_l2"],
                               rtol=1e-7, atol=0)
    for a, b in zip(jax.tree_util.tree_leaves(seg2["result"].params),
                    jax.tree_util.tree_leaves(full["result"].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the BIT-IDENTICAL claim (docs/WAN_FLOOR.md, PARITY.md) covers best
    # tracking too: best_params/best_metric ride the checkpointed carry
    np.testing.assert_array_equal(
        np.asarray(seg2["result"].best_metric),
        np.asarray(full["result"].best_metric))
    for a, b in zip(jax.tree_util.tree_leaves(seg2["result"].best_params),
                    jax.tree_util.tree_leaves(full["result"].best_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
