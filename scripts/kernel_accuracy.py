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

    # the incumbent baseline: parameter grads through the TWO-KERNEL
    # pallas path (jet fwd bf16x3 + recompute backward at DEFAULT dots) —
    # the bar the fused kernels must match, NOT the f32 oracle itself
    # (the recompute backward has always run single-pass DEFAULT dots;
    # training accuracy is f32-class end-to-end, BENCHMARKS.md round 2)
    def two_kernel(p):
        jet = model.fields(p, X, impl="pallas")
        return jnp.mean((-jet.lap - f) ** 2)

    try:
        with jax.default_matmul_precision("highest"):
            lt, gt = jax.jit(jax.value_and_grad(two_kernel))(params)
        num = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(
            jax.tree_util.tree_leaves(gt), jax.tree_util.tree_leaves(go)))
        den = sum(float(jnp.sum(b ** 2))
                  for b in jax.tree_util.tree_leaves(go))
        row = {"width": width, "variant": "two_kernel_backward",
               "loss_rel": abs(float(lt) - float(lo))
               / max(abs(float(lo)), 1e-30),
               "grad_rel": (num / max(den, 1e-30)) ** 0.5}
    except Exception as e:
        row = {"width": width, "variant": "two_kernel_backward",
               "error": str(e)[:200]}
    rows.append(row)
    print(json.dumps(row), flush=True)

    for name, opts in [("fused", {}),
                       ("fused_bf16x3", {"dot_dtype": "bf16x3"}),
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


def run_quotient(width: int, d: int = 2, depth: int = 5, n: int = 8192):
    """Round-4 kernels vs XLA autodiff oracles on TPU: the two-pass
    Rayleigh and WAN u/v custom VJPs, and the analytic-coefficient
    one-pass kernel (grad-space A/B, same 1e-5-class bar)."""
    from nnpde_tpu.kernels import (
        fused_poisson_analytic,
        linear_functional_coefficients,
        make_fused_rayleigh,
        make_fused_wan_u,
        make_fused_wan_v,
        quotient_coefficients,
    )
    from nnpde_tpu.models import SolutionModel, factor_for_technique

    L = 2.0
    model = SolutionModel(
        NetSpec((d,) + (width,) * (depth - 1) + (1,), activation="sin"),
        factor_for_technique("FBC", dim=d, kind="box", L=L),
    )
    params = model.init(jax.random.PRNGKey(0))
    X = jax.random.uniform(jax.random.PRNGKey(1), (n, d), maxval=L)
    V = 0.3 * jnp.sum(X ** 2, axis=1)
    phi = jnp.sin(jnp.pi * X[:, 0] / L) * jnp.sin(jnp.pi * X[:, 1] / L)
    gphi = jax.vmap(jax.grad(lambda x: jnp.sin(jnp.pi * x[0] / L)
                             * jnp.sin(jnp.pi * x[1] / L)))(X)
    pn = jnp.mean(phi ** 2)
    Bj = model.factor.jet(X)

    def full_jet(p):
        jet = model.fields(p, X, impl="xla")
        return jet.value, jet.grad

    def grad_rel(gf, go):
        num = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(
            jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(go)))
        den = sum(float(jnp.sum(b ** 2))
                  for b in jax.tree_util.tree_leaves(go))
        return (num / max(den, 1e-30)) ** 0.5

    rows = []

    def row_of(name, fn, oracle):
        try:
            with jax.default_matmul_precision("highest"):
                lf, gf = jax.jit(fn)(params)
                lo, go = jax.jit(jax.value_and_grad(oracle))(params)
            r = {"width": width, "variant": name,
                 "loss_rel": abs(float(lf) - float(lo))
                 / max(abs(float(lo)), 1e-30),
                 "grad_rel": grad_rel(gf, go)}
        except Exception as e:
            r = {"width": width, "variant": name, "error": str(e)[:200]}
        rows.append(r)
        print(json.dumps(r), flush=True)

    # Rayleigh quotient (with potential).  The quotient kernels default
    # to bf16x3 recompute dots: the quotient backward multiplies every
    # gradient by the GLOBAL sums (wr, masses), so single-pass
    # DEFAULT-dot noise in those sums contaminates the whole gradient
    # (measured: w128 wan_u grad rel-err 0.10 at float32/DEFAULT).  The
    # _f32dots variants keep that failure mode on the gate's radar.
    for tag, kw in [("", {}), ("_f32dots", {"dot_dtype": "float32"})]:
        ray = make_fused_rayleigh("sin", weight=3.0, den_eps=1e-8, **kw)
        coef_q = quotient_coefficients(Bj, V=V)

        def ray_fn(p, ray=ray, coef_q=coef_q):
            def obj(p):
                total, _ = ray(p, X, coef_q)
                return total
            return jax.value_and_grad(obj)(p)

        def ray_oracle(p):
            u, gu = full_jet(p)
            num = jnp.mean(0.5 * jnp.sum(gu ** 2, axis=1) + V * u ** 2)
            return 3.0 * num / (jnp.mean(u ** 2) + 1e-8)

        row_of("rayleigh_2pass" + tag, ray_fn, ray_oracle)

        # WAN u objective (fixed E; the dE lane is oracle-tested on CPU)
        wu = make_fused_wan_u("sin", eps=1e-8, vol=L * L, w_pde=10.0,
                              w_norm=1000.0, **kw)
        base = linear_functional_coefficients(
            Bj, c0=V * phi, b0=0.5 * gphi, e1=Bj.value, e2=Bj.value * phi)
        E0 = jnp.asarray(1.7)

        def wu_fn(p, wu=wu, base=base, E0=E0):
            def obj(p):
                total, _ = wu(p, E0, X, base, pn)
                return total
            return jax.value_and_grad(obj)(p)

        def wu_oracle(p):
            u, gu = full_jet(p)
            wr = jnp.mean(0.5 * jnp.sum(gu * gphi, axis=1)
                          + (V - E0) * u * phi)
            return (10.0 * wr ** 2 / (pn + 1e-8)
                    + 1000.0 * (L * L * jnp.mean(u ** 2) - 1.0) ** 2)

        row_of("wan_u_2pass" + tag, wu_fn, wu_oracle)

        # WAN v objective (-log)
        wv = make_fused_wan_v("sin", eps=1e-8, log_eps=1e-8, **kw)
        u_dat = jnp.cos(X[:, 0])
        gu_dat = jnp.stack([-jnp.sin(X[:, 0]), jnp.zeros_like(X[:, 0])], -1)
        coef_v = linear_functional_coefficients(
            Bj, c0=(V - 1.7) * u_dat, b0=0.5 * gu_dat, e1=Bj.value)

        def wv_fn(p, wv=wv, coef_v=coef_v):
            def obj(p):
                total, _ = wv(p, X, coef_v)
                return total
            return jax.value_and_grad(obj)(p)

        def wv_oracle(p, u_dat=u_dat, gu_dat=gu_dat):
            v, gv = full_jet(p)
            wr = jnp.mean(0.5 * jnp.sum(gu_dat * gv, axis=1)
                          + (V - 1.7) * u_dat * v)
            return -jnp.log(wr ** 2 / (jnp.mean(v ** 2) + 1e-8) + 1e-8)

        row_of("wan_v_2pass" + tag, wv_fn, wv_oracle)

    # analytic-coefficient one-pass kernel
    def ana_fn(p):
        loss, _, g = fused_poisson_analytic(p, X, "sin", L=L, ks=[1, 1])
        return loss, g

    from nnpde_tpu.pde import poisson as phys

    f_sin = phys.rhs_f_for_u_sin(X, L, [1, 1])

    def ana_oracle(p):
        jet = model.fields(p, X, impl="xla")
        return jnp.mean((-jet.lap - f_sin) ** 2)

    row_of("fused_analytic", ana_fn, ana_oracle)
    return rows


if __name__ == "__main__":
    widths = [int(a) for a in sys.argv[1:]] or [64, 128]
    all_rows = json.load(open(OUT)) if os.path.exists(OUT) else []
    for w in widths:
        new = run(w) + run_fused(w) + run_quotient(w)
        keys = {(r["width"], r["variant"]) for r in new}
        all_rows = [r for r in all_rows
                    if (r.get("width"), r.get("variant")) not in keys]
        all_rows += new
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    json.dump(all_rows, open(OUT, "w"), indent=2)
