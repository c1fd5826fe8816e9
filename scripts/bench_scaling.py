"""Width/batch scaling of the PINN training-step throughput (pts/s/chip).

bench.py's headline is the reference workload (2D Poisson, width 64 —
Poisson_ND.py:378-384), which is HBM-bound on TPU (BENCHMARKS.md).  This
script measures how the step throughput scales with MLP width and batch,
where wider layers feed the 128x128 MXU properly.

Usage: python scripts/bench_scaling.py [width ...]   (default 64 128 256)
Appends rows to artifacts/bench_scaling.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nnpde_tpu.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "bench_scaling.json")


def measure(width: int, n: int = 262144, steps: int = 100, depth: int = 5,
            impl: str | None = None, kernel_opts: dict | None = None,
            tag: str | None = None):
    import jax
    import optax

    from nnpde_tpu.kernels import pallas_available
    from nnpde_tpu.losses import pinn_poisson
    from nnpde_tpu.models import NetSpec, SolutionModel, factor_for_technique
    from nnpde_tpu.pde import poisson as phys

    L, d = 2.0, 2
    model = SolutionModel(
        NetSpec((d,) + (width,) * (depth - 1) + (1,), activation="sin"),
        factor_for_technique("FBC", dim=d, kind="box", L=L),
    )
    params = model.init(jax.random.PRNGKey(0))
    X = jax.random.uniform(jax.random.PRNGKey(1), (n, d), maxval=L)
    f = phys.rhs_f_for_u_sin(X, L, [1, 1])
    opt = optax.adam(1e-3)
    if impl is None:
        # round-2 default: the kernel path at any width (the round-3 w128
        # measurement showed the unpacked kernel also wins — see
        # BENCHMARKS.md width table); 'xla' only off-TPU
        impl = "pallas" if pallas_available() else "xla"
    kernel_opts = kernel_opts or {}
    if impl == "fused":
        from nnpde_tpu.kernels import (
            fused_linear_residual, residual_coefficients,
        )

        coef = residual_coefficients(model.factor.jet(X), a0=-1.0, rhs=-f)

    def step(carry, _):
        params, opt_state = carry
        with jax.default_matmul_precision("highest"):
            if impl == "fused":
                loss, _, grads = fused_linear_residual(
                    params, X, coef, "sin", **kernel_opts
                )
            else:
                def loss_fn(p):
                    jet = model.fields(p, X, impl=impl, **kernel_opts)
                    return pinn_poisson(jet.lap, f)

                loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    scan = jax.jit(lambda c: jax.lax.scan(step, c, None, length=steps))
    carry = (params, opt.init(params))
    carry, _ = jax.block_until_ready(scan(carry))
    t0 = time.time()
    carry, _ = jax.block_until_ready(scan(carry))
    dt = time.time() - t0
    return {"width": width, "depth": depth, "batch": n,
            "impl": tag or impl, "kernel_opts": kernel_opts,
            "pts_per_sec": round(n * steps / dt, 1),
            "ms_per_step": round(1e3 * dt / steps, 3)}


# named variants: WIDTH:VARIANT on the CLI (e.g. 128:bwd256)
VARIANTS = {
    "xla": dict(impl="xla"),
    "pallas": dict(impl="pallas"),
    "bwd256": dict(impl="pallas", kernel_opts={"bwd_tile": 256}),
    "bwd128": dict(impl="pallas", kernel_opts={"bwd_tile": 128}),
    "bwd1024": dict(impl="pallas", kernel_opts={"bwd_tile": 1024}),
    "fwdpallas": dict(impl="pallas", kernel_opts={"fwd_impl": "pallas2"}),
    "fwdpallas_bwd256": dict(impl="pallas",
                             kernel_opts={"fwd_impl": "pallas2",
                                          "bwd_tile": 256}),
    "fb256_t512": dict(impl="pallas",
                       kernel_opts={"fwd_impl": "pallas2", "bwd_tile": 256,
                                    "tile": 512}),
    "fb256_t2048": dict(impl="pallas",
                        kernel_opts={"fwd_impl": "pallas2", "bwd_tile": 256,
                                     "tile": 2048}),
    "fb256_bf16dots": dict(impl="pallas",
                           kernel_opts={"fwd_impl": "pallas2",
                                        "bwd_tile": 256,
                                        "dot_dtype": "bfloat16"}),
    # 1-pass bf16 dots in the forward kernel (lap rel-err ~2e-3) — the
    # bulk phase of the hybrid protocol (VERDICT r2 #3)
    "bf16fwd": dict(impl="pallas",
                    kernel_opts={"fwd_impl": "pallas2:default"}),
    "bf16full": dict(impl="pallas",
                     kernel_opts={"fwd_impl": "pallas2:default",
                                  "dot_dtype": "bfloat16"}),
    # one-pass fused loss+grad kernel (kernels/fused_step.py)
    "fused": dict(impl="fused"),
    "fused_bf16dots": dict(impl="fused",
                           kernel_opts={"dot_dtype": "bfloat16"}),
    "fused_bwd256": dict(impl="fused", kernel_opts={"bwd_tile": 256}),
    "fused_bwd1024": dict(impl="fused", kernel_opts={"bwd_tile": 1024}),
    # three-pass dot splitting: grad rel-err 1.7e-3 -> 9.0e-4 at w64
    # (kernel_accuracy.json) — this measures what the tighter grads cost
    "fused_bf16x3": dict(impl="fused", kernel_opts={"dot_dtype": "bf16x3"}),
}


if __name__ == "__main__":
    args = sys.argv[1:] or ["64", "128", "256"]
    rows = json.load(open(OUT)) if os.path.exists(OUT) else []
    for a in args:
        if ":" in a:
            w_s, v = a.split(":", 1)
            row = measure(int(w_s), tag=v, **VARIANTS[v])
            key = f"{w_s}:{v}"
        else:
            row = measure(int(a))
            key = a
        rows = [r for r in rows
                if f"{r.get('width')}:{r.get('impl')}" != f"{row['width']}:{row['impl']}"
                and not (str(r.get('width')) == key and ":" not in key)]
        rows.append(row)
        print(json.dumps(row), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    json.dump(rows, open(OUT, "w"), indent=2)
