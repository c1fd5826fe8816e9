"""Benchmark: collocation-point residual-eval throughput per chip.

Measures the steady-state full PINN training step (fused forward-Laplacian
residual + loss + grad + Adam update) on the reference's headline workload
shape — 2D Poisson, MLP width 64 x depth 5 (Poisson_ND.py:378-384) — at a
TPU-saturating collocation batch, as a jitted 100-step scan (one dispatch).

Prints ONE JSON line:
  {"metric": ..., "value": pts/s/chip, "unit": ..., "vs_baseline": ...}

vs_baseline is relative to an estimated 1e7 residual-point evals/s for the
reference PyTorch loop on one A100 (unfused d+1 autograd passes over a tiny
MLP are dispatch-bound; the reference publishes no numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import time

A100_PYTORCH_BASELINE_PTS_PER_SEC = 1.0e7


def main():
    from nnpde_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import optax

    from nnpde_tpu.losses import pinn_poisson
    from nnpde_tpu.models import NetSpec, SolutionModel, factor_for_technique
    from nnpde_tpu.pde import poisson as phys

    L, d, N, STEPS = 2.0, 2, 262144, 100
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

    def step(carry, _):
        params, opt_state = carry
        with jax.default_matmul_precision("highest"):

            def loss_fn(p):
                jet = model.fields(p, X, impl=impl)
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

    pts_per_sec = N * STEPS / dt
    print(
        json.dumps(
            {
                "metric": "collocation pts/sec/chip (residual eval)",
                "value": round(pts_per_sec, 1),
                "unit": "pts/s/chip",
                "vs_baseline": round(
                    pts_per_sec / A100_PYTORCH_BASELINE_PTS_PER_SEC, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
