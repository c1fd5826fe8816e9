"""Microbenchmark: forward-Laplacian training-gradient variants on the TPU.

Times jax.grad of the PINN residual loss (the bench.py hot path: 2D Poisson,
width-64 depth-5 sin MLP, Poisson_ND.py:378-384 shape) over the backend
variants: XLA stream propagation, Pallas recompute backward (unpacked),
2-point lane-packed, and packed with bf16 dot inputs.

Usage: python scripts/kernel_bench.py [N] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nnpde_tpu.kernels import mlp_fwdlap_pallas
from nnpde_tpu.models import NetSpec, init_mlp
from nnpde_tpu.ops.fwdlap import mlp_fwdlap

N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 30
d, width, depth = 2, 64, 5

spec = NetSpec((d,) + (width,) * (depth - 1) + (1,), activation="sin")
params = init_mlp(jax.random.PRNGKey(0), spec)
X = jax.random.uniform(jax.random.PRNGKey(1), (N, d), maxval=2.0)
f = jnp.sin(X[:, 0]) * jnp.sin(X[:, 1])


def timeit(name, fn, *args):
    fn_c = jax.jit(fn)
    out = fn_c(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn_c(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:34s} {dt*1e3:8.2f} ms   {N/dt/1e6:8.1f} M pts/s")
    return dt


def loss_with(jet_fn):
    def loss(p):
        with jax.default_matmul_precision("highest"):
            jet = jet_fn(p)
            return jnp.mean((-jet.lap - f) ** 2) + jnp.mean(jet.value**2)
    return loss


variants = {
    "xla": lambda p: mlp_fwdlap(p, X, "sin"),
    "pallas lane_pack=1": lambda p: mlp_fwdlap_pallas(
        p, X, "sin", lane_pack=1),
    "pallas lane_pack=2": lambda p: mlp_fwdlap_pallas(
        p, X, "sin", lane_pack=2),
    "pallas pack=2 bf16 dots": lambda p: mlp_fwdlap_pallas(
        p, X, "sin", lane_pack=2, dot_dtype="bfloat16"),
    "pallas pack=2 bwd_tile=1024": lambda p: mlp_fwdlap_pallas(
        p, X, "sin", lane_pack=2, bwd_tile=1024),
    "pallas pack=2 bwd_tile=2048": lambda p: mlp_fwdlap_pallas(
        p, X, "sin", lane_pack=2, bwd_tile=2048),
}

print(f"N={N} width={width} depth={depth} reps={REPS} "
      f"dev={jax.devices()[0].platform}")
for name, jet_fn in variants.items():
    try:
        timeit(f"grad {name}", jax.grad(loss_with(jet_fn)), params)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
