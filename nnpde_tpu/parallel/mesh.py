"""Device-mesh data parallelism over the collocation batch.

The reference is single-device (``torch.device('cuda'|'cpu')`` everywhere,
Poisson_ND.py:164; no torch.distributed anywhere — SURVEY.md §2/§5).  The
TPU-native scaling strategy for this workload is pure data parallelism over
collocation points: models are <= ~120k params (replicated over ICI), and
every loss in :mod:`nnpde_tpu.losses` is a ``jnp.mean`` over the batch, so

* under ``jit`` with a batch-sharded input, GSPMD lowers each mean to a
  partial reduction + ``psum`` over the mesh — **bit-equivalent math** to the
  unsharded run (the minimax/weak-form means included);
* gradients of those means are automatically ``psum``-reduced as well; no
  hand-written NCCL/MPI-style code exists or is needed.

:func:`psum_mean_step` additionally provides the explicit ``shard_map``
formulation (per-shard local means + ``lax.pmean``) used by the multi-chip
dry-run and the distributed tests to pin down the collective semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1D mesh over (the first n) local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2d(dp: int, tp: int, axes=("data", "model")) -> Mesh:
    """2D (data, model) mesh for combined batch + tensor parallelism."""
    devs = np.array(jax.devices()[: dp * tp]).reshape(dp, tp)
    return Mesh(devs, axes)


def make_mesh_dcn(n_slices: int, per_slice: Optional[int] = None,
                  axes=("dcn", "data")) -> Mesh:
    """Multi-slice 2D mesh: outer axis over DCN (slice-to-slice network),
    inner axis over ICI within each slice.

    On real multi-slice TPU deployments devices carry a ``slice_index``
    attribute — we group by it so rows of the mesh are whole slices and the
    outer collectives ride DCN while the inner ones ride ICI.  On
    single-slice / virtual-CPU backends the devices are reshaped
    ``(n_slices, per_slice)``; the collective structure (hierarchical
    reduction, see :func:`dp_dcn_step`) is identical, which is what the
    8-device CPU-mesh tests and the driver dry-run validate.

    The reference is single-device (KH_1D.py:17); this is the last box of
    SURVEY.md §5's distributed row ("ICI single-slice; optional DCN").
    """
    devs = jax.devices()
    by_slice: dict = {}
    for d in devs:
        by_slice.setdefault(getattr(d, "slice_index", 0), []).append(d)
    if len(by_slice) >= n_slices:
        # real multi-slice: one mesh row per hardware slice
        rows = [by_slice[k] for k in sorted(by_slice)[:n_slices]]
        width = per_slice or min(len(r) for r in rows)
        grid = np.array([r[:width] for r in rows])
    else:
        width = per_slice or len(devs) // n_slices
        if n_slices * width > len(devs):
            raise ValueError(
                f"need {n_slices}x{width} devices, have {len(devs)}"
            )
        grid = np.array(devs[: n_slices * width]).reshape(n_slices, width)
    return Mesh(grid, axes)


def dp_dcn_step(loss_fn, mesh: Mesh, dcn_axis: str = "dcn",
                ici_axis: str = "data"):
    """Hierarchical data-parallel value+grad over a (dcn, ici) mesh.

    The batch is sharded over BOTH axes; the reduction is explicitly
    two-level — ``pmean`` over the ICI axis first (fast intra-slice
    all-reduce), then ``pmean`` over the DCN axis (one slow inter-slice
    all-reduce of already-reduced values) — so the DCN link carries one
    scalar/grad-tree per step, never per-chip partials.
    """
    def local(params, X):
        def objective(p):
            local_loss = loss_fn(p, X)
            return jax.lax.pmean(
                jax.lax.pmean(local_loss, ici_axis), dcn_axis
            )

        return jax.value_and_grad(objective)(params)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P((dcn_axis, ici_axis))),
        out_specs=(P(), P()),
    )


def tp_shard_mlp(params, mesh: Mesh, axis: str = "model"):
    """Megatron-style tensor parallelism for the MLP parameter list.

    Hidden layers alternate column- and row-sharding so activations stay
    sharded through pairs of layers and GSPMD inserts one psum per pair:
      layer 0 (and even): W (in, out) sharded on OUT columns, b sharded;
      odd layers:         W sharded on IN rows, b replicated.
    The tiny nets here (<= ~120k params) never *need* TP — this exists to
    exercise and validate the sharding path (SURVEY.md §5 notes pure DP is
    the right production strategy).
    """
    out = []
    for i, (W, b) in enumerate(params):
        if i % 2 == 0 and W.shape[1] > 1:
            Ws = jax.device_put(W, NamedSharding(mesh, P(None, axis)))
            bs = jax.device_put(b, NamedSharding(mesh, P(axis)))
        elif W.shape[0] > 1:
            Ws = jax.device_put(W, NamedSharding(mesh, P(axis, None)))
            bs = jax.device_put(b, NamedSharding(mesh, P()))
        else:
            Ws = jax.device_put(W, NamedSharding(mesh, P()))
            bs = jax.device_put(b, NamedSharding(mesh, P()))
        out.append((Ws, bs))
    return out


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Place a batch array with its leading dim sharded over the mesh.

    Pads nothing: callers should keep batch sizes divisible by the mesh size
    (collocation batches are free to round).
    """
    return jax.device_put(x, data_sharding(mesh, axis))


def replicate(tree, mesh: Mesh):
    """Replicate a parameter pytree over every device of the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def psum_mean_step(loss_fn, mesh: Mesh, axis: str = "data"):
    """Explicit-collective data-parallel value+grad via ``shard_map``.

    ``loss_fn(params, X) -> scalar`` must reduce over the batch with plain
    means.  Returns ``step(params, X) -> (loss, grads)`` where each shard
    computes local (loss, grads) and the results are ``lax.pmean``-ed over
    the mesh — numerically identical to the global mean because every shard
    holds batch/n points.
    """
    def local(params, X):
        # The pmean must sit INSIDE the differentiated objective: shard_map's
        # transpose rule already psums the cotangent of a replicated (P())
        # input, so reducing the gradient again would overcount by the mesh
        # size.  Differentiating through pmean(local_mean) yields exactly the
        # gradient of the global mean, replicated on every shard.
        def objective(p):
            return jax.lax.pmean(loss_fn(p, X), axis)

        return jax.value_and_grad(objective)(params)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
    )


def fused_residual_step(mesh: Mesh, activation: str, axis="data",
                        kind: str = "pinn", check_vma: bool = False,
                        **kernel_kw):
    """Data-parallel one-pass fused loss+grad kernel via ``shard_map``.

    The fused kernels (:func:`nnpde_tpu.kernels.fused_linear_residual` /
    ``fused_drm_energy``, selected by ``kind`` 'pinn' | 'drm') produce
    loss AND gradients themselves, so (unlike :func:`psum_mean_step`)
    there is no autodiff transpose to ride — each shard runs the kernel on
    its batch/coefficient shard and the results are reduced explicitly:
    ``pmean`` for loss/grads (exact for equal shards, same argument as
    psum_mean_step), ``psum`` for the raw accumulator sums (e.g.
    ``sum_r_ufull``, the trainable-E seed, scales by total N outside).

    Returns ``step(params, X, coef) -> (loss, aux, grads)`` to be called
    under ``jit`` on a mesh-sharded (X, coef) with replicated params.
    ``axis`` may be a tuple of mesh axis names (e.g. ``("dcn", "data")``
    on a multi-slice mesh) — the batch shards over their product and the
    reductions run over both (XLA routes the per-slice partials over ICI
    first; see dp_dcn_step for the fully hierarchical formulation).
    """
    from ..kernels import fused_drm_energy, fused_linear_residual

    if kind not in ("pinn", "drm"):
        raise ValueError("kind must be 'pinn' or 'drm'")
    fused = fused_linear_residual if kind == "pinn" else fused_drm_energy

    def local(params, X, coef):
        loss, aux, grads = fused(params, X, coef, activation, **kernel_kw)
        loss = jax.lax.pmean(loss, axis)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, axis), grads
        )
        sums = {k: jax.lax.psum(v, axis)
                for k, v in aux.items() if k != "n"}
        return loss, sums, grads

    # check_vma default OFF: the fused kernel's pallas_call annotates its
    # out_shapes with the inputs' varying mesh axes and pvary's the
    # replicated weights (kernels/fused_step.py), which is what the vma
    # checker needs — but this jax version's pallas *interpret* path then
    # fails inside the interpreter itself (its internal dynamic_slice mixes
    # invariant grid indices with varying operands; the error message says
    # to use check_vma=False).  Until that is fixed upstream, the
    # mesh-invariance the checker would prove is asserted by an explicit
    # per-shard bitwise-equality test (tests/test_parallel.py
    # test_fused_step_outputs_mesh_invariant_per_shard).  Pass
    # check_vma=True to re-enable the static check (works where the
    # non-interpret Mosaic path is used).
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=check_vma,
    )


def fused_rayleigh_step(mesh: Mesh, activation: str, axis="data", *,
                        weight: float = 1.0, den_eps: float = 0.0,
                        **kernel_kw):
    """Data-parallel two-pass fused Rayleigh quotient via ``shard_map``.

    The quotient needs GLOBAL numerator/denominator sums between pass A
    and pass B, so the ``axis``-aware custom VJP
    (:func:`nnpde_tpu.kernels.make_fused_rayleigh` with ``axis=...``)
    psums the pass-A sums and the pass-B per-shard gradient sums — the
    returned (loss, aux, grads) are mesh-invariant.  check_vma follows the
    same rule as :func:`fused_residual_step` (explicit invariance test in
    tests/test_parallel.py).

    Returns ``step(params, X, coef) -> (loss, aux, grads)`` for a
    batch-sharded (X, coef) and replicated params.
    """
    from ..kernels import make_fused_rayleigh

    loss = make_fused_rayleigh(activation, weight=weight, den_eps=den_eps,
                               axis=axis, **kernel_kw)

    def local(params, X, coef):
        def obj(p):
            return loss(p, X, coef)

        (val, aux), grads = jax.value_and_grad(obj, has_aux=True)(params)
        return val, aux, grads

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )


def fused_wan_u_step(mesh: Mesh, activation: str, axis="data", *,
                     convention: str = "wr2_over_norm", eps: float = 1e-8,
                     vol: float = 1.0, w_pde: float = 1.0,
                     w_norm: float = 0.0, **kernel_kw):
    """Data-parallel fused WAN primal step: ``step(params, E, X, base,
    phi) -> (loss, aux, grads, dE)`` with (X, base, phi) batch-sharded.

    ``phi`` (the critic test-function values on the shard) is reduced to
    the global ``mean(phi^2)`` in-step; the weak-residual / mass sums psum
    inside the axis-aware custom VJP.
    """
    from ..kernels import make_fused_wan_u

    loss = make_fused_wan_u(activation, convention=convention, eps=eps,
                            vol=vol, w_pde=w_pde, w_norm=w_norm, axis=axis,
                            **kernel_kw)

    def local(params, E, X, base, phi):
        pn = jax.lax.pmean(jnp.mean(phi ** 2), axis)

        def obj(p, E_):
            return loss(p, E_, X, base, pn)

        (val, aux), (grads, dE) = jax.value_and_grad(
            obj, argnums=(0, 1), has_aux=True)(params, E)
        return val, aux, grads, dE

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )


def fused_wan_v_step(mesh: Mesh, activation: str, axis="data", *,
                     convention: str = "wr2_over_norm", eps: float = 1e-8,
                     objective: str = "neg_log", log_eps: float = 1e-8,
                     **kernel_kw):
    """Data-parallel fused WAN critic step: ``step(v_params, X, coef) ->
    (loss_v, aux, grads)`` with (X, coef) batch-sharded."""
    from ..kernels import make_fused_wan_v

    loss = make_fused_wan_v(activation, convention=convention, eps=eps,
                            objective=objective, log_eps=log_eps,
                            axis=axis, **kernel_kw)

    def local(v_params, X, coef):
        def obj(p):
            return loss(p, X, coef)

        (val, aux), grads = jax.value_and_grad(obj, has_aux=True)(v_params)
        return val, aux, grads

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
