"""Results ledger: append-only JSON array + per-metric .npy curves.

Same artifact contract as the reference (results_*.json ledgers,
``{tag}_{metric}.npy`` curves — Poisson_ND.py:330-363,
IPW_1D_PINN_DRM.py:204-247, KH_1D.py:556-619) so the post-processing tools
(:mod:`nnpde_tpu.exp.results_process`, :mod:`nnpde_tpu.exp.plotting`) work on
either framework's outputs.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np


def load_results(results_file: str) -> List[dict]:
    if not os.path.exists(results_file):
        return []
    with open(results_file, "r") as f:
        blob = json.load(f)
    return blob if isinstance(blob, list) else [blob]


def append_result(results_file: str, row: dict) -> None:
    """Append one run row; tolerates concurrent corruption the same way the
    reference does (try/except around the update, Poisson_ND.py:352-363)."""
    os.makedirs(os.path.dirname(results_file) or ".", exist_ok=True)
    try:
        rows = load_results(results_file)
    except Exception:
        rows = []
    rows.append(row)
    tmp = results_file + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rows, f, indent=2, default=_json_default)
    os.replace(tmp, results_file)


def save_curves(save_dir: str, tag: str, history: Dict[str, np.ndarray]) -> Dict[str, str]:
    """Save each metric curve as ``{tag}_{metric}.npy``; returns paths."""
    os.makedirs(save_dir, exist_ok=True)
    paths = {}
    for k, v in history.items():
        p = os.path.join(save_dir, f"{tag}_{k}.npy")
        np.save(p, np.asarray(v))
        paths[k] = p
    return paths


def _json_default(o):
    if isinstance(o, (np.floating, np.integer)):
        return o.item()
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not JSON serialisable: {type(o)}")
