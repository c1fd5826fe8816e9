"""KH-approximation validity map: quantify the cycle-average error.

The reference *assumes* the infinite-frequency (cycle-averaged) KH
approximation everywhere (KH_1D.py:32-39).  With the Floquet eigensolver
(pde/kh.py:floquet_eigensystem) that assumption becomes measurable: for a
grid of (alpha, omega) drives, record

  * eps_shift = |eps_floquet - E_avg|  (quasi-energy error of the averaged
    solver, absolute and relative to the binding energy), and
  * sideband  = 1 - ||phi_0||^2        (ground-state weight off the m = 0
    harmonic — the part of the state the averaged solver cannot represent).

FD-only (no training).  Appends to artifacts/floquet_validity.json.
Run:  python scripts/floquet_validity.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from nnpde_tpu.pde import kh as phys  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "floquet_validity.json")

ALPHAS = (1.0, 2.0, 4.0, 10.0)
OMEGAS = (0.3, 0.5, 1.0, 2.0, 5.0)
M = 3
L, N = 40.0, 1500


def main():
    rows = []
    for alpha in ALPHAS:
        _, E_avg, _ = phys.reference_eigensystem(
            L=L, N=N, alpha=alpha, k_max=1, use_avg=True, n_theta=512)
        for omega in OMEGAS:
            t0 = time.time()
            x, eps, Phi = phys.floquet_eigensystem(
                L=L, N=N, alpha=alpha, omega=omega, M=M, k_max=1,
                n_theta=512)
            dx = x[1] - x[0]
            w = np.ones(len(x))
            w[0] = w[-1] = 0.5
            wts = dx * np.einsum("x,xm->m", w, np.abs(Phi[:, :, 0]) ** 2)
            row = {
                "alpha": alpha,
                "omega": omega,
                "M": M,
                "E_avg": float(E_avg[0]),
                "eps_floquet": float(eps[0]),
                "eps_shift": float(abs(eps[0] - E_avg[0])),
                "eps_shift_rel": float(abs(eps[0] - E_avg[0])
                                       / abs(E_avg[0])),
                "sideband_weight": float(1.0 - wts[M]),
                "elapsed_s": round(time.time() - t0, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    json.dump(rows, open(OUT, "w"), indent=1)
    print(f"wrote {OUT} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
