"""Characterize the Mosaic compile-time cliff vs scan chunk length.

Round 2 capped the epoch-scan length at 500 on the Pallas jet path because
chunk=1000 took >9 min to compile on the remote TPU compile service while
chunk<=500 compiled in seconds (problems/poisson.py, problems/ipw2d.py).
The cap was enforced but the cost boundary never measured (VERDICT r2
'weak' #3 / next-round #6).  This script measures wall-clock compile time
of the exact training-step scan (Pallas lane-packed jet kernel, Adam,
eval) as a function of chunk length and records the curve, so the cap
constant is justified by a committed measurement.

Each chunk length uses a distinct batch size (N = base + chunk) so the
persistent compilation cache cannot serve a previous length's executable.

Usage: python scripts/bench_compile_cliff.py [chunk ...]   (default ladder)
Appends rows to artifacts/compile_cliff.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "compile_cliff.json")


def measure(chunk: int, impl: str = "pallas"):
    import jax
    import optax

    from nnpde_tpu.losses import pinn_poisson
    from nnpde_tpu.models import NetSpec, SolutionModel, factor_for_technique
    from nnpde_tpu.pde import poisson as phys

    L, d = 2.0, 2
    # unique batch per (chunk, impl) so the compile cache can't alias runs
    n = 16384 + 8 * chunk + (0 if impl == "pallas" else 4)
    model = SolutionModel(
        NetSpec((d, 64, 64, 64, 64, 1), activation="sin"),
        factor_for_technique("FBC", dim=d, kind="box", L=L),
    )
    params = model.init(jax.random.PRNGKey(0))
    X = jax.random.uniform(jax.random.PRNGKey(1), (n, d), maxval=L)
    f = phys.rhs_f_for_u_sin(X, L, [1, 1])
    opt = optax.adam(1e-3)

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

    scan = jax.jit(lambda c: jax.lax.scan(step, c, None, length=chunk))
    carry = (params, opt.init(params))
    t0 = time.time()
    lowered = scan.lower(carry)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(compiled(carry))
    t_run = time.time() - t0
    return {"chunk": chunk, "impl": impl, "batch": n,
            "lower_s": round(t_lower, 2),
            "compile_s": round(t_compile, 2),
            "first_run_s": round(t_run, 2)}


def measure_wan(chunk: int):
    """WAN-shaped probe: the ipw2d extragradient minimax step (critic
    fori_loop + EG double evaluation — the biggest scan body in the repo)
    at the requested chunk length.  Wall time on a tiny grid is compile-
    dominated, so total elapsed bounds the compile cost; a cliff would show
    as minutes, flat behavior as tens of seconds."""
    os.environ["NNPDE_PALLAS_CHUNK_CAP"] = str(chunk)
    from nnpde_tpu.problems.ipw2d import IPW2DConfig, train_ipw_2d

    # unique grid_n per chunk so the compile cache can't serve another row
    cfg = IPW2DConfig(
        nx=3, ny=3, method="WAN", technique="FN", epochs=chunk, chunk=chunk,
        grid_n=40 + (chunk // 125) % 16, jet_impl="pallas",
        minimax="extragradient", v_lr=4e-3,
        v_layers=(2, 100, 100, 100, 1),
        weights={"parity": 1e3, "symmetry": 1e3, "norm": 1e4},
    )
    t0 = time.time()
    res = train_ipw_2d(cfg)
    wall = time.time() - t0
    return {"chunk": chunk, "impl": "wan-eg-pallas", "batch": cfg.grid_n**2,
            "wall_s": round(wall, 2), "rel_l2": res["rel_l2"]}


if __name__ == "__main__":
    args = sys.argv[1:]
    impl = "pallas"
    if args and args[0] == "--xla":
        impl, args = "xla", args[1:]
    elif args and args[0] == "--wan":
        args = args[1:]
        chunks = [int(a) for a in args] or [500, 1000]
        rows = json.load(open(OUT)) if os.path.exists(OUT) else []
        for c in chunks:
            row = measure_wan(c)
            rows = [r for r in rows
                    if (r.get("chunk"), r.get("impl")) != (c, row["impl"])]
            rows.append(row)
            print(json.dumps(row), flush=True)
            os.makedirs(os.path.dirname(OUT), exist_ok=True)
            json.dump(rows, open(OUT, "w"), indent=2)
        sys.exit(0)
    chunks = [int(a) for a in args] or [125, 250, 500, 750, 1000]
    rows = json.load(open(OUT)) if os.path.exists(OUT) else []
    for c in chunks:
        row = measure(c, impl)
        rows = [r for r in rows
                if (r.get("chunk"), r.get("impl")) != (c, impl)]
        rows.append(row)
        print(json.dumps(row), flush=True)
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        json.dump(rows, open(OUT, "w"), indent=2)
