"""Second Floquet operating point: (alpha=4, omega=0.3) — the cell of the
validity map where the KH cycle-average degrades most (eps_shift_rel 2.6%,
artifacts/floquet_validity.json) and the Floquet solver earns its keep.

Two parts:

* ``--ladder`` (CPU, float64): FD quasi-energy M-ladder M=1..4 at the
  operating point — truncation convergence |eps(M) - eps(M-1)|, sideband
  weights, and the shift off the cycle-averaged energy.  Writes
  ``artifacts/KH_Floquet/m_ladder_a4_w03.json``.
* ``--train`` (TPU): trains the multi-channel Floquet PINN at the M the
  ladder converged at, for n = 0 and 1; writes
  ``artifacts/KH_Floquet/results_floquet_a4.json`` + harmonic plots.
  Acceptance rows land via ``scripts/acceptance.py kh-floquet-p2``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALPHA, OMEGA, L = 4.0, 0.3, 30.0
OUTDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "KH_Floquet")


def ladder(m_values=(1, 2, 3, 4), N=2000):
    import numpy as np

    from nnpde_tpu.pde.kh import floquet_eigensystem, reference_eigensystem

    x_avg, E_avg, _ = reference_eigensystem(
        L=L, N=N, alpha=ALPHA, use_avg=True, k_max=2)
    rows = []
    prev = None
    for M in m_values:
        t0 = time.time()
        x, eps, Phi = floquet_eigensystem(
            L=L, N=N, alpha=ALPHA, omega=OMEGA, M=M, k_max=2)
        dx = x[1] - x[0]
        w_m = (np.abs(Phi[:, :, 0]) ** 2).sum(0) * dx      # per-harmonic mass
        sideband = float(1.0 - w_m[M])                     # m=0 is index M
        row = {
            "alpha": ALPHA, "omega": OMEGA, "M": M,
            "eps0": float(eps[0]),
            "eps1": float(eps[1]) if len(eps) > 1 else None,
            "E_avg0": float(E_avg[0]),
            "eps_shift0": float(eps[0] - E_avg[0]),
            "sideband_weight0": sideband,
            "d_eps_vs_prev": (None if prev is None
                              else float(abs(eps[0] - prev))),
            "elapsed_s": round(time.time() - t0, 1),
        }
        prev = float(eps[0])
        rows.append(row)
        print(json.dumps(row), flush=True)
    os.makedirs(OUTDIR, exist_ok=True)
    json.dump(rows, open(os.path.join(OUTDIR, "m_ladder_a4_w03.json"), "w"),
              indent=1)
    return rows


def train(M=3, epochs=20000):
    """Delegates to scripts/floquet_artifact.py's parameterised loop (one
    artifact-producing trainer to maintain; compilation cache included)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "floquet_artifact",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "floquet_artifact.py"))
    fa = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fa)
    return fa.main(epochs,
                   cfg_kw=dict(alpha=ALPHA, omega=OMEGA, M=M),
                   tag="a4_", results_name="results_floquet_a4.json")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ladder", action="store_true")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--M", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=20000)
    a = ap.parse_args()
    if a.ladder:
        ladder()
    if a.train:
        train(M=a.M, epochs=a.epochs)
