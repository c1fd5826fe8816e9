"""WAN minimax step-rate A/B: XLA autodiff vs the two-pass fused kernels.

Measures steady-state epochs/sec of the full compiled WAN epoch (v_steps
critic updates + extragradient primal pair + in-step eval) at the
north-star winner shape — IPW-2D n=(3,3), FN, grid 400^2, wide critic,
EG + two-timescale (scripts/wan_floor.py ``winner_grid400_cos45k``) — for
``jet_impl`` 'xla' vs 'pallas-fused' (kernels/fused_quotient.py).

Compile time cancels by differencing two horizons of the same compiled
chunk shape (the scan chunk is identical; only the chunk count differs,
and the compilation cache carries across the two runs).

Usage:
  python scripts/bench_wan_step.py [--grid 400] [--impls xla,pallas-fused]
      [--e1 200] [--e2 600] [--out artifacts/bench_wan_step.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(impl: str, grid: int, e1: int, e2: int, chunk: int,
        v_width: int = 100):
    from nnpde_tpu.problems.ipw2d import IPW2DConfig, train_ipw_2d

    def cfg(epochs):
        return IPW2DConfig(
            nx=3, ny=3, method="WAN", technique="FN", epochs=epochs,
            lr_schedule="cosine", minimax="extragradient", v_lr=4e-3,
            v_layers=(2, v_width, v_width, v_width, 1), grid_n=grid,
            weights={"parity": 1000.0, "symmetry": 1000.0, "norm": 1e4},
            jet_impl=impl, chunk=chunk, seed=0,
        )

    # Warmup at one full chunk: populates the (in-memory + persistent)
    # compilation caches so BOTH timed windows below are compile-free.
    # Without this the first window pays compile and the second hits the
    # cache, making t2 < t1 ("non-separable") — observed on the XLA rows.
    train_ipw_2d(cfg(chunk))
    t0 = time.time()
    r1 = train_ipw_2d(cfg(e1))
    t1 = time.time() - t0
    t0 = time.time()
    r2 = train_ipw_2d(cfg(e2))
    t2 = time.time() - t0
    eps = (e2 - e1) / max(t2 - t1, 1e-9)
    if t2 - t1 < 0.5:
        # horizons too short to difference away compile noise — lengthen
        return {"impl": impl, "grid": grid,
                "warning": f"non-separable timing (t1={t1:.2f}, t2={t2:.2f})"
                           " — raise --e1/--e2"}
    return {
        "impl": impl, "grid": grid, "v_width": v_width,
        "e1": e1, "e2": e2,
        "t1_s": round(t1, 2), "t2_s": round(t2, 2),
        "epochs_per_sec": round(eps, 3),
        "pts_per_sec": round(eps * grid * grid, 1),
        "l2_e2": float(r2["rel_l2"]) if "rel_l2" in r2 else None,
    }


# Committed fast-mode reference rates at the winner shape (grid 400^2,
# v5e, quiet chip): the round-Q finding is that a bitwise-identical
# program measures EITHER ~23.7 e/s (fast worker mode) OR ~3.7 e/s (slow
# mode) in a fresh process, with XLA swinging 14.7-24.0 (docs/WAN_FLOOR.md
# round Q).  A fork whose measured rate is below MODE_THRESHOLD x the
# scaled reference is classified as a slow-mode worker and DISCARDED —
# re-forked until --forks fast-mode measurements land (VERDICT r4 #6).
FAST_EPS_REF_GRID400 = {"pallas-fused": 23.7, "xla": 24.0}
MODE_THRESHOLD = 0.5


def fast_floor(impl: str, grid: int) -> float | None:
    ref = FAST_EPS_REF_GRID400.get(impl)
    if ref is None:
        return None
    # step cost is dominated by the grid^2 collocation batch
    return MODE_THRESHOLD * ref * (400.0 / grid) ** 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=400)
    ap.add_argument("--impls", default="xla,pallas-fused")
    ap.add_argument("--e1", type=int, default=200)
    ap.add_argument("--e2", type=int, default=600)
    ap.add_argument("--chunk", type=int, default=200)
    ap.add_argument("--v-width", type=int, default=100,
                    help="critic hidden width (100 = winner shape; 64 = "
                         "the lane-packable ablation shape, VERDICT r4 #5)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--forks", type=int, default=3,
                    help="fast-mode measurements required per impl")
    ap.add_argument("--max-forks", type=int, default=8,
                    help="total fork budget per impl (slow-mode forks "
                         "are discarded and retried up to this cap)")
    ap.add_argument("--no-modecheck", action="store_true",
                    help="accept every fork's rate (e.g. off-TPU where "
                         "the committed fast-mode reference is meaningless)")
    ap.add_argument("--no-isolate", action="store_true",
                    help="measure all impls in THIS process (the round-4 "
                         "sessions showed the second-measured impl reads "
                         "0.16-0.94x its fresh-process rate — in-process "
                         "state contaminates the later rows; isolation is "
                         "the default)")
    a = ap.parse_args()

    impls = [s.strip() for s in a.impls.split(",")]
    rows = []
    if not a.no_isolate:
        # one fresh python per (impl, fork): device memory, compilation
        # caches and tunnel/worker state reset between rows, so neither
        # ordering nor a slow-mode worker contaminates the ranking
        import subprocess
        import tempfile

        summary = {}
        for impl in impls:
            floor = None if a.no_modecheck else fast_floor(impl, a.grid)
            ok_rates, discarded = [], 0
            for fork in range(a.max_forks):
                if len(ok_rates) >= a.forks:
                    break
                with tempfile.NamedTemporaryFile(suffix=".json") as tf:
                    argv = [sys.executable, os.path.abspath(__file__),
                            "--grid", str(a.grid), "--impls", impl,
                            "--e1", str(a.e1), "--e2", str(a.e2),
                            "--chunk", str(a.chunk),
                            "--v-width", str(a.v_width), "--no-isolate",
                            "--out", tf.name]
                    # capture the leaf's stdout (its row re-prints below
                    # with the fork index; letting it through doubles rows)
                    res = subprocess.run(argv, capture_output=True,
                                         text=True)
                    rc = res.returncode
                    got = json.load(open(tf.name))["rows"] if rc == 0 else [
                        {"impl": impl,
                         "warning": f"subprocess rc={rc}: "
                                    f"{(res.stderr or '')[-200:]}"}]
                for r in got:
                    r["fork"] = fork
                    eps = r.get("epochs_per_sec", 0)
                    if eps and floor is not None and eps < floor:
                        r["discarded"] = (f"slow worker mode ({eps:.2f} < "
                                          f"{floor:.2f} e/s fast floor)")
                        discarded += 1
                    elif eps:
                        ok_rates.append(eps)
                    print(json.dumps(r))
                rows.extend(got)
            if ok_rates:
                ok_rates.sort()
                summary[impl] = {
                    "median_eps": ok_rates[len(ok_rates) // 2],
                    "min_eps": ok_rates[0], "max_eps": ok_rates[-1],
                    "n_fast": len(ok_rates), "n_slow_discarded": discarded,
                }
            else:
                summary[impl] = {"n_fast": 0, "n_slow_discarded": discarded,
                                 "warning": "no fast-mode fork within budget"}
        if all(s.get("median_eps") for s in summary.values()) and \
                {"xla", "pallas-fused"} <= set(summary):
            summary["speedup_fused_over_xla"] = round(
                summary["pallas-fused"]["median_eps"]
                / summary["xla"]["median_eps"], 3)
        print(json.dumps({"summary": summary}))
        if a.out:
            json.dump({"rows": rows, "summary": summary,
                       "shape": "ipw2d n33 WAN FN EG winner",
                       "grid": a.grid}, open(a.out, "w"), indent=1)
        return
    for impl in impls:
        row = run(impl, a.grid, a.e1, a.e2, a.chunk, v_width=a.v_width)
        print(json.dumps(row))
        rows.append(row)
    if a.out:
        out = {"rows": rows, "shape": "ipw2d n33 WAN FN EG winner",
               "grid": a.grid}
        json.dump(out, open(a.out, "w"), indent=1)


if __name__ == "__main__":
    main()
