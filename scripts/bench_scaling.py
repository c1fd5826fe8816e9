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


def measure(width: int, n: int = 262144, steps: int = 100, depth: int = 5):
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
    # the lane-packed kernel only covers widths <= 64 (pack=2); wider
    # layers go through the XLA jet path, which tiles onto the MXU
    impl = "pallas" if (pallas_available() and width <= 64) else "xla"

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

    scan = jax.jit(lambda c: jax.lax.scan(step, c, None, length=steps))
    carry = (params, opt.init(params))
    carry, _ = jax.block_until_ready(scan(carry))
    t0 = time.time()
    carry, _ = jax.block_until_ready(scan(carry))
    dt = time.time() - t0
    return {"width": width, "depth": depth, "batch": n, "impl": impl,
            "pts_per_sec": round(n * steps / dt, 1),
            "ms_per_step": round(1e3 * dt / steps, 3)}


if __name__ == "__main__":
    widths = [int(a) for a in sys.argv[1:]] or [64, 128, 256]
    rows = json.load(open(OUT)) if os.path.exists(OUT) else []
    for w in widths:
        row = measure(w)
        rows = [r for r in rows if r.get("width") != w]
        rows.append(row)
        print(json.dumps(row), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    json.dump(rows, open(OUT, "w"), indent=2)
