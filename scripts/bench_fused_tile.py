"""Point-tile sweep for the fused one-pass kernel (round 4).

BENCHMARKS.md's round-4 model puts the fused step in a mixed MXU/VPU
in-kernel arithmetic regime (~30 TFLOP/s sustained at the 512-point
auto tile).  The tile size is the one scheduling knob the auto rule
(`_fused_call`: 512 for w<=64, else 256) never swept on hardware: larger
tiles amortise pallas grid overhead and deepen the MXU pipeline, smaller
tiles fit more of the working set in VMEM regs.  This sweeps bwd_tile at
the bench shape (2D Poisson PINN, w64 x d5, 262144 points) and prints a
row per tile; appends to artifacts/bench_fused_tile.json.

Usage: python scripts/bench_fused_tile.py [--tiles 256,512,1024,2048]
       [--batch 262144] [--steps 100] [--width 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "bench_fused_tile.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", default="256,512,1024,2048")
    ap.add_argument("--batch", type=int, default=262144)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--depth", type=int, default=5)
    a = ap.parse_args()

    from nnpde_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from nnpde_tpu.kernels import (
        fused_linear_residual, residual_coefficients,
    )
    from nnpde_tpu.models import NetSpec, SolutionModel, factor_for_technique
    from nnpde_tpu.pde import poisson as phys

    L, d = 2.0, 2
    layers = (d,) + (a.width,) * (a.depth - 1) + (1,)
    model = SolutionModel(NetSpec(layers, activation="sin"),
                          factor_for_technique("FBC", dim=d, kind="box", L=L))
    params = model.init(jax.random.PRNGKey(0))
    X = jax.random.uniform(jax.random.PRNGKey(1), (a.batch, d), maxval=L)
    f = phys.rhs_f_for_u_sin(X, L, [1, 1])
    coef = residual_coefficients(model.factor.jet(X), a0=-1.0, rhs=-f)
    opt = optax.adam(1e-3)

    rows = []
    for tile in [int(t) for t in a.tiles.split(",")]:
        def step(carry, _, tile=tile):
            p, s = carry
            with jax.default_matmul_precision("highest"):
                loss, _, grads = fused_linear_residual(
                    p, X, coef, "sin", bwd_tile=tile)
                up, s = opt.update(grads, s, p)
                p = optax.apply_updates(p, up)
            return (p, s), loss

        scan = jax.jit(lambda c, n, tile=tile: jax.lax.scan(
            step, c, None, length=n), static_argnums=1)
        carry = (params, opt.init(params))
        try:
            carry, _ = jax.block_until_ready(scan(carry, a.steps))
            t0 = time.time()
            carry, losses = jax.block_until_ready(scan(carry, a.steps))
            dt = time.time() - t0
        except Exception as e:  # a tile that Mosaic rejects is a result too
            rows.append({"tile": tile, "error": str(e)[:200]})
            print(json.dumps(rows[-1]), flush=True)
            continue
        rows.append({
            "tile": tile, "width": a.width, "depth": a.depth,
            "batch": a.batch,
            "pts_per_sec": round(a.batch * a.steps / dt, 1),
            "ms_per_step": round(1e3 * dt / a.steps, 3),
            "loss_final": float(losses[-1]),
        })
        print(json.dumps(rows[-1]), flush=True)

    old = json.load(open(OUT)) if os.path.exists(OUT) else []
    json.dump(old + rows, open(OUT, "w"), indent=1)


if __name__ == "__main__":
    main()
