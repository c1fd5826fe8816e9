"""Produce the committed Floquet evidence artifact: train the slow-drive
demo config on the TPU, save the harmonic-overlay plot + a JSON row.

Run:  python scripts/floquet_artifact.py [epochs]
Writes artifacts/KH_Floquet/{floquet_n0.png, results_floquet.json}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nnpde_tpu.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

OUTDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "KH_Floquet")


def main(epochs: int = 20000, *, cfg_kw: dict | None = None,
         tag: str = "", results_name: str = "results_floquet.json"):
    """Train n=0,1 at the given operating point (``cfg_kw`` overrides the
    KHFloquetConfig defaults), save harmonic plots + a JSON row ledger.
    Parameterised so other operating points (scripts/floquet_point2.py)
    reuse this loop instead of copying it."""
    import numpy as np

    from nnpde_tpu.exp.plotting import plot_floquet_harmonics
    from nnpde_tpu.problems.kh_floquet import (
        KHFloquetConfig, train_kh_floquet,
    )

    cfg_kw = dict(cfg_kw or {})
    os.makedirs(OUTDIR, exist_ok=True)
    rows = []
    for n in (0, 1):
        cfg = KHFloquetConfig(n=n, epochs=epochs, chunk=1000, **cfg_kw)
        t0 = time.time()
        out = train_kh_floquet(cfg)
        gt_re, gt_im = out["gt"].resample(out["x"])
        png = plot_floquet_harmonics(
            out["x"], out["phi_re"], out["phi_im"],
            np.asarray(gt_re[:, :, n]), np.asarray(gt_im[:, :, n]),
            M=cfg.M, eps_est=out["eps_est"],
            out_png=os.path.join(OUTDIR, f"floquet_{tag}n{n}.png"),
        )
        row = {
            "alpha": cfg.alpha, "omega": cfg.omega, "M": cfg.M,
            "n": n, "rel_l2": out["rel_l2"], "eps_est": out["eps_est"],
            "eps_ref": out["eps_ref"], "eps_avg": out["eps_avg"],
            "harmonic_weights": out["harmonic_weights"],
            "best_epoch": out["best_epoch"], "epochs": epochs,
            "elapsed_s": round(time.time() - t0, 1), "plot": png,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    json.dump(rows, open(os.path.join(OUTDIR, results_name), "w"),
              indent=1)
    return rows


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20000)
