"""Jet accuracy A/B: Pallas kernel variants vs the f32 XLA oracle, on TPU.

Reports max/mean relative error of (value, grad, lap) for each kernel
configuration at a given width — the acceptance gate for new kernel paths
(w64 packed gate was lap rel-err <= 1e-5; same bar for w128, VERDICT r2
item #2).  Writes artifacts/kernel_accuracy.json.

Usage: python scripts/kernel_accuracy.py [width ...]   (default 64 128)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nnpde_tpu.kernels import mlp_fwdlap_pallas
from nnpde_tpu.models import NetSpec, init_mlp
from nnpde_tpu.ops.fwdlap import mlp_fwdlap

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "kernel_accuracy.json")

VARIANTS = {
    "pallas_auto": {"fwd_impl": "auto"},
    "pallas2": {"fwd_impl": "pallas2"},
    "pallas2_default": {"fwd_impl": "pallas2:default"},
    "xla_fwd": {"fwd_impl": "xla"},
}


def rel(a, b):
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30))


def run(width: int, d: int = 2, depth: int = 5, n: int = 8192):
    spec = NetSpec((d,) + (width,) * (depth - 1) + (1,), activation="sin")
    params = init_mlp(jax.random.PRNGKey(0), spec)
    X = jax.random.uniform(jax.random.PRNGKey(1), (n, d), maxval=2.0)
    with jax.default_matmul_precision("highest"):
        ref = jax.jit(lambda p: mlp_fwdlap(p, X, "sin"))(params)
    rows = []
    for name, opts in VARIANTS.items():
        try:
            # pin highest matmul precision like the trainer does — the
            # XLA-forward variants otherwise run at the TPU's default
            # bf16-ish precision and the A/B reads ~5e-3 spuriously
            with jax.default_matmul_precision("highest"):
                ker = jax.jit(lambda p: mlp_fwdlap_pallas(
                    p, X, "sin", **opts))(params)
            row = {"width": width, "variant": name,
                   "value_rel": rel(ker.value, ref.value),
                   "grad_rel": rel(ker.grad, ref.grad),
                   "lap_rel": rel(ker.lap, ref.lap)}
        except Exception as e:  # record compile/VMEM failures, don't die
            row = {"width": width, "variant": name, "error": str(e)[:200]}
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def run_fused(width: int, d: int = 2, depth: int = 5, n: int = 8192):
    """Fused loss+grad kernel vs the XLA autodiff oracle (grad-space A/B:
    the kernel's outputs are loss and parameter gradients, not jets)."""
    from nnpde_tpu.kernels import (
        fused_linear_residual, residual_coefficients,
    )
    from nnpde_tpu.models import SolutionModel, factor_for_technique

    L = 2.0
    model = SolutionModel(
        NetSpec((d,) + (width,) * (depth - 1) + (1,), activation="sin"),
        factor_for_technique("FBC", dim=d, kind="box", L=L),
    )
    params = model.init(jax.random.PRNGKey(0))
    X = jax.random.uniform(jax.random.PRNGKey(1), (n, d), maxval=L)
    f = jnp.sin(X[:, 0])
    coef = residual_coefficients(model.factor.jet(X), a0=-1.0, rhs=-f)

    def oracle(p):
        jet = model.fields(p, X, impl="xla")
        return jnp.mean((-jet.lap - f) ** 2)

    with jax.default_matmul_precision("highest"):
        lo, go = jax.jit(jax.value_and_grad(oracle))(params)
    rows = []
    for name, opts in [("fused", {}),
                       ("fused_bf16dots", {"dot_dtype": "bfloat16"})]:
        try:
            with jax.default_matmul_precision("highest"):
                lf, _, gf = jax.jit(lambda p: fused_linear_residual(
                    p, X, coef, "sin", **opts))(params)
            num = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(
                jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(go)))
            den = sum(float(jnp.sum(b ** 2))
                      for b in jax.tree_util.tree_leaves(go))
            row = {"width": width, "variant": name,
                   "loss_rel": abs(float(lf) - float(lo))
                   / max(abs(float(lo)), 1e-30),
                   "grad_rel": (num / max(den, 1e-30)) ** 0.5}
        except Exception as e:
            row = {"width": width, "variant": name, "error": str(e)[:200]}
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


if __name__ == "__main__":
    widths = [int(a) for a in sys.argv[1:]] or [64, 128]
    all_rows = json.load(open(OUT)) if os.path.exists(OUT) else []
    for w in widths:
        new = run(w) + run_fused(w)
        keys = {(r["width"], r["variant"]) for r in new}
        all_rows = [r for r in all_rows
                    if (r.get("width"), r.get("variant")) not in keys]
        all_rows += new
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    json.dump(all_rows, open(OUT, "w"), indent=2)
