"""HBM-pressure probe for the 2D-well WAN step (TODO Open #3).

grid400 + grid_jitter reproducibly killed the TPU worker (4/4, incl. a
1.5k-epoch run) while grid400-no-jitter and grid300+jitter ran fine; the
suspected cause is peak-HBM pressure from the jitter path's extra
fixed-grid forward at 160k points.  This probe turns "suspected" into
"measured" WITHOUT executing anything on the worker: it lowers+compiles
the exact training step (extragradient WAN at the winner config) for
each (grid_n, jitter) cell and records XLA's memory analysis
(argument/output/temp bytes vs the device HBM limit).

Usage:  python scripts/wan_mem_probe.py [--out artifacts/wan_mem_probe.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nnpde_tpu.problems.ipw2d import IPW2DConfig, train_ipw_2d  # noqa: E402


def winner_cfg(grid_n, jitter, epochs=45000, chunk=1000):
    """The acceptance winner config (scripts/acceptance.py
    run_ipw2d_n33_wan_best) parameterised by quadrature grid and jitter."""
    return IPW2DConfig(
        nx=3, ny=3, method="WAN", technique="FN", epochs=epochs,
        chunk=chunk, lr_schedule="cosine", minimax="extragradient",
        v_lr=4e-3, v_layers=(2, 100, 100, 100, 1), grid_n=grid_n,
        grid_jitter=jitter,
        weights={"parity": 1000.0, "symmetry": 1000.0, "norm": 1e4},
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/wan_mem_probe.json")
    ap.add_argument("--cells", default="300:0,300:1,400:0,400:1",
                    help="comma list of grid:jitter cells")
    args = ap.parse_args()

    rows = []
    for cell in args.cells.split(","):
        g, j = cell.split(":")
        grid_n, jitter = int(g), bool(int(j))
        stats = train_ipw_2d(winner_cfg(grid_n, jitter), compile_only=True)
        row = {"grid_n": grid_n, "grid_jitter": jitter, **stats}
        gib = 1024.0**3
        row["temp_gib"] = round(stats["temp_size_in_bytes"] / gib, 3)
        row["total_gib"] = round(stats["total_nonalias_bytes"] / gib, 3)
        if stats["device_bytes_limit"] > 0:
            row["fraction_of_hbm"] = round(
                stats["total_nonalias_bytes"] / stats["device_bytes_limit"], 3
            )
        rows.append(row)
        print(json.dumps(row))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
