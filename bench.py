"""Benchmark: collocation-point residual-eval throughput per chip.

Measures the steady-state full PINN training step (fused forward-Laplacian
residual + loss + grad + Adam update) on the reference's headline workload
shape — 2D Poisson, MLP width 64 x depth 5 (Poisson_ND.py:378-384) — at a
TPU-saturating collocation batch, as a jitted 100-step scan (one dispatch).

Prints ONE JSON line:
  {"metric": ..., "value": pts/s/chip, "unit": ..., "vs_baseline": ...}

Anchors (both emitted; the reference publishes no numbers, BASELINE.md):
  * ``vs_baseline`` / ``vs_baseline_estimated_a100`` — against an assumed
    1e7 pts/s for the reference loop on one A100 (deliberately generous:
    the loop is dispatch-bound — d+1 autograd graphs per step).
  * ``vs_baseline_measured_cpu`` — against the same-host CPU-PyTorch
    measurement committed at artifacts/anchor_cpu_torch.json
    (reproduce: python scripts/bench_anchor_torch.py).

``--all-devices``: shard the batch over every visible device with a 1D
jax.sharding mesh (psum-mean loss => identical math to single-chip) and
report aggregate and per-chip throughput.  On the single-chip CI/TPU
environment this is a no-op mesh of 1; on a pod slice it produces the
multi-chip row TODO.md §3 calls for.  Validate without hardware via
  python bench.py --all-devices --cpu-mesh 8 --batch 4096 --steps 20
(the env pins the TPU platform before __main__, so JAX_PLATFORMS=cpu is
ignored — --cpu-mesh forces it in-process).
"""

from __future__ import annotations

import argparse
import json
import os
import time

A100_PYTORCH_BASELINE_PTS_PER_SEC = 1.0e7
# TPU v5e (v5 lite) peak: 197 TFLOP/s bf16 per chip.  The fused kernel's
# default dots are single-pass bf16 in-kernel (BENCHMARKS.md §Mosaic:
# DEFAULT f32 dots lower to one bf16 pass), so bf16 peak is the honest
# denominator for the headline mode; the bf16x3 ("exact") modes run 3
# MXU passes per dot, i.e. their effective peak is a third of this.
V5E_BF16_PEAK_FLOPS = 197e12
_ANCHOR_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "artifacts", "anchor_cpu_torch.json")


def flops_per_point(widths, d) -> float:
    """Algorithmic (useful) FLOPs per collocation point for one fused
    PINN training step, matmul terms only.

    Model (documented in BENCHMARKS.md §Roofline): the forward-Laplacian
    jet carries d+2 streams (value, d gradient components, Laplacian)
    through every linear layer — per layer each stream costs
    ``n_in*n_out`` MACs; the in-kernel reverse sweep costs 2x the forward
    (cotangent propagation W^T@ct plus per-stream weight-gradient outer
    products), so the step total is ``3 * (d+2) * sum(n_in*n_out)`` MACs
    = 2x that in FLOPs.  Elementwise jet algebra (activation product
    rules, ~2% of the matmul MACs at width 64) and the Adam update
    (O(params), amortised over the batch) are excluded — this is the
    *useful* count MFU conventions use, so padding/packing waste and
    bf16x3 multi-pass dots count against utilisation, not as work."""
    macs_per_stream = sum(a * b for a, b in zip(widths[:-1], widths[1:]))
    return 3.0 * (d + 2) * macs_per_stream * 2.0


def measured_cpu_anchor():
    try:
        return float(json.load(open(_ANCHOR_FILE))["pts_per_sec"])
    except Exception:
        return None


def _fail_row(reason: str) -> dict:
    """Structured, parseable failure line — a backend outage must never
    surface as an rc=1 traceback (BENCH_r03 was lost to exactly that)."""
    return {
        "metric": "collocation pts/sec/chip (residual eval)",
        "value": None,
        "unit": "pts/s/chip",
        "vs_baseline": None,
        "ok": False,
        "reason": reason,
    }


def _probe_backend(timeout_s: float = 150.0):
    """Probe backend init + one tiny dispatch in a subprocess.

    A dead TPU tunnel makes ``jax.devices()`` hang for minutes; probing in a
    watchdogged subprocess means this process can always emit structured
    JSON instead of hanging or crashing.  Returns (ok, detail).
    """
    import subprocess
    import sys

    code = (
        "import jax, jax.numpy as jnp;"
        "d = jax.devices();"
        "(jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready();"
        "print(d[0].platform, len(d))"
    )
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False, f"tpu_unavailable: backend init exceeded {timeout_s:.0f}s"
    if out.returncode != 0:
        tail = (out.stderr or "").strip().splitlines()
        return False, "tpu_unavailable: " + (tail[-1] if tail else "init failed")
    return True, out.stdout.strip()


def main(all_devices: bool = False, batch: int | None = None,
         steps: int | None = None, cpu_mesh: int = 0,
         kernel_mode: str = "exact"):
    if not cpu_mesh:
        ok, detail = _probe_backend()
        if not ok:
            print(json.dumps(_fail_row(detail)))
            return
    try:
        _run(all_devices=all_devices, batch=batch, steps=steps,
             cpu_mesh=cpu_mesh, kernel_mode=kernel_mode)
    except Exception as e:  # noqa: BLE001 — classify, re-raise real bugs
        msg = f"{type(e).__name__}: {e}"
        env_markers = ("UNAVAILABLE", "Unavailable", "DEADLINE_EXCEEDED",
                       "failed to connect", "socket closed",
                       "Unable to initialize backend")
        if any(m in msg for m in env_markers):
            # environment fault (chip gone mid-run), not a code fault
            print(json.dumps(_fail_row("tpu_unavailable: " + msg[:500])))
            return
        raise


def _run(all_devices: bool = False, batch: int | None = None,
         steps: int | None = None, cpu_mesh: int = 0,
         kernel_mode: str = "exact"):
    from nnpde_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    import jax

    if cpu_mesh:
        # the environment pins the TPU platform before __main__ runs, so a
        # JAX_PLATFORMS=cpu env var is ignored — force CPU in-process (the
        # same mechanism as tests/conftest.py) for hardware-free validation
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={cpu_mesh}"
        )
        jax.config.update("jax_platforms", "cpu")
    import optax

    from nnpde_tpu.losses import pinn_poisson
    from nnpde_tpu.models import NetSpec, SolutionModel, factor_for_technique
    from nnpde_tpu.pde import poisson as phys

    n_dev = len(jax.devices()) if all_devices else 1
    L, d = 2.0, 2
    N = (batch or 262144) * n_dev
    STEPS = steps or 100
    model = SolutionModel(
        NetSpec((d, 64, 64, 64, 64, 1), activation="sin"),
        factor_for_technique("FBC", dim=d, kind="box", L=L),
    )
    params = model.init(jax.random.PRNGKey(0))
    X = jax.random.uniform(jax.random.PRNGKey(1), (N, d), maxval=L)
    f = phys.rhs_f_for_u_sin(X, L, [1, 1])
    opt = optax.adam(1e-3)

    # lane-packed Pallas jet kernel on TPU (2.4x the XLA path at width 64,
    # BENCHMARKS.md); XLA stream path off-TPU
    from nnpde_tpu.kernels import pallas_available

    impl = "pallas" if pallas_available() else "xla"
    # --kernel-mode bf16: the 1-pass-bf16 jet kernel (fwd lap rel-err
    # ~2e-3 vs the exact bf16x3 default at 4.8e-6) — the bulk phase of
    # compute_dtype='hybrid-kernel' training (BENCHMARKS.md); reported
    # as a second bench line, never the headline
    kernel_opts = (
        {"fwd_impl": "pallas2:default", "dot_dtype": "bfloat16"}
        if kernel_mode == "bf16" and impl == "pallas" else {}
    )
    # --kernel-mode fused: one-pass fused loss+grad kernel — the separate
    # jet-forward kernel disappears entirely (kernels/fused_step.py);
    # identical loss definition (r = -lap u - f), grads from the in-kernel
    # reverse sweep.  Interpreter mode off-TPU (validation only).
    use_fused = kernel_mode in ("fused", "fused-bf16")
    # --kernel-mode fused-bf16: the fused kernel with bf16 dot inputs —
    # the composition VERDICT r3 #3 asks about.  On the fused path the
    # inter-kernel HBM streams the hybrid schedule saved on the XLA path
    # (1.8x there) no longer exist, so any remaining reduced-precision win
    # must come from in-kernel dot throughput; this mode measures exactly
    # that (a second bench line, never the headline — lap rel-err ~2e-3).
    fused_opts = ({"dot_dtype": "bfloat16"}
                  if kernel_mode == "fused-bf16" else {})

    if all_devices:
        from nnpde_tpu.parallel.mesh import (
            data_sharding, make_mesh, replicate, shard_batch,
        )

        mesh = make_mesh()
        X = shard_batch(X, mesh)
        f = shard_batch(f, mesh)
        params = replicate(params, mesh)
        shard = data_sharding(mesh)
        n_dev = mesh.devices.size
    else:
        mesh = shard = None

    use_analytic = kernel_mode == "fused-analytic"
    if use_analytic:
        # in-kernel analytic coefficients: only X itself crosses HBM
        # (kernels/fused_step.py fused_poisson_analytic) — the coefficient
        # stream (d+4 floats/pt, the dominant remaining HBM traffic of the
        # fused step at this shape) disappears
        from nnpde_tpu.kernels import fused_poisson_analytic

    if use_fused:
        from nnpde_tpu.kernels import (
            fused_linear_residual, residual_coefficients,
        )

        coef = residual_coefficients(model.factor.jet(X), a0=-1.0, rhs=-f)
        if all_devices:
            # pallas_call does not auto-partition under GSPMD — run the
            # kernel per-shard via the explicit shard_map step (pmean'd
            # loss/grads; exact for equal shards)
            from nnpde_tpu.parallel.mesh import fused_residual_step

            coef = shard_batch(coef, mesh)
            fused_sharded = fused_residual_step(mesh, "sin")
        else:
            fused_sharded = None

    def step(carry, _):
        params, opt_state = carry
        with jax.default_matmul_precision("highest"):
            if use_analytic:
                loss, _, grads = fused_poisson_analytic(
                    params, X, "sin", L=L, ks=[1, 1]
                )
            elif use_fused:
                if fused_sharded is not None:
                    loss, _, grads = fused_sharded(params, X, coef)
                else:
                    loss, _, grads = fused_linear_residual(
                        params, X, coef, "sin", **fused_opts
                    )
            else:

                def loss_fn(p):
                    jet = model.fields(p, X, impl=impl, **kernel_opts)
                    # with X batch-sharded, XLA partitions the residual
                    # eval per device and all-reduces the mean — same math
                    # as one chip
                    return pinn_poisson(jet.lap, f)

                loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    scan = jax.jit(
        lambda c, n_steps: jax.lax.scan(step, c, None, length=n_steps),
        static_argnums=1,
    )
    carry = (params, opt.init(params))
    # compile + warmup (same static length as the timed call)
    carry, _ = jax.block_until_ready(scan(carry, STEPS))
    t0 = time.time()
    carry, losses = jax.block_until_ready(scan(carry, STEPS))
    dt = time.time() - t0

    agg = N * STEPS / dt
    pts_per_sec = agg / n_dev
    cpu_anchor = measured_cpu_anchor()
    # MFU / roofline accounting (VERDICT r4 #2): useful FLOPs per point
    # from the documented matmul model; MFU vs v5e bf16 peak (the fused
    # default's in-kernel dot precision).  Omitted on the CPU validation
    # mesh where the peak constant is meaningless.
    fpp = flops_per_point((d, 64, 64, 64, 64, 1), d)
    tflops = fpp * pts_per_sec / 1e12
    row = {
        "metric": "collocation pts/sec/chip (residual eval)",
        "value": round(pts_per_sec, 1),
        "unit": "pts/s/chip",
        "vs_baseline": round(pts_per_sec / A100_PYTORCH_BASELINE_PTS_PER_SEC, 2),
        "vs_baseline_estimated_a100": round(
            pts_per_sec / A100_PYTORCH_BASELINE_PTS_PER_SEC, 2
        ),
        "flops_per_point": fpp,
    }
    if not cpu_mesh:
        row["tflops_sustained"] = round(tflops, 2)
        row["mfu_pct_bf16_peak"] = round(100.0 * tflops * 1e12
                                         / V5E_BF16_PEAK_FLOPS, 2)
        # the bf16x3 exact modes execute 3 MXU passes per useful dot
        if kernel_mode == "exact":
            row["mfu_pct_f32_effective_peak"] = round(
                100.0 * tflops * 1e12 / (V5E_BF16_PEAK_FLOPS / 3.0), 2)
    if cpu_anchor:
        row["vs_baseline_measured_cpu"] = round(pts_per_sec / cpu_anchor, 1)
    if all_devices:
        row["n_devices"] = n_dev
        row["aggregate_pts_per_sec"] = round(agg, 1)
    if kernel_mode != "exact":
        row["kernel_mode"] = kernel_mode
    print(json.dumps(row))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--all-devices", action="store_true",
                    help="shard the batch over every visible device")
    ap.add_argument("--batch", type=int, default=None,
                    help="per-device batch (default 262144; shrink for "
                         "CPU-mesh validation runs)")
    ap.add_argument("--steps", type=int, default=None,
                    help="steps per timed scan (default 100)")
    ap.add_argument("--cpu-mesh", type=int, default=0, metavar="N",
                    help="validation mode: force an N-device virtual CPU "
                         "mesh instead of the real backend")
    ap.add_argument("--kernel-mode",
                    choices=["exact", "bf16", "fused", "fused-bf16",
                             "fused-analytic"],
                    default="fused",
                    help="bf16 = the 1-pass-bf16 jet kernel (the "
                         "'hybrid-kernel' bulk phase) as a second bench "
                         "line; exact = the two-kernel bf16x3 path; "
                         "default fused = one-pass fused loss+grad kernel "
                         "(kernels/fused_step.py) — measured 52.3M vs "
                         "38.3M exact on v5e (2026-08-18), grads "
                         "oracle-equal, so the faster path is the "
                         "headline")
    a = ap.parse_args()
    main(all_devices=a.all_devices, batch=a.batch, steps=a.steps,
         cpu_mesh=a.cpu_mesh, kernel_mode=a.kernel_mode)
