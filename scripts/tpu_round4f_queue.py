"""Round-4 TPU queue, wave 5: SEGMENTED floor runs (session-proof).

Supersedes tpu_round4e_queue.py.  Waves 1-4 lost work to two facts the
round-3 verdict flagged: each driver session is a fresh VM (~55 min) and a
full-horizon floor run is ~4000 s — an unfinished run left NOTHING.  Every
full-scale variant now runs via ``wan_floor.py --segmented``: the full
minimax carry is checkpointed to ``artifacts/wan_floor_ckpt/`` every 5k
epochs (bit-identical resume, tests/test_resume.py::test_ipw2d_wan_segmented),
so relaunching this queue in a later session continues mid-run instead of
restarting.  Checkpoints live under artifacts/ so the end-of-session commit
carries them across VMs.

Run (first thing in a session, after checking nothing else holds the chip):

    NNPDE_SCAN_CHUNK_CAP=100 nohup python scripts/tpu_round4f_queue.py \
        > /tmp/q4f.log 2>&1 &

Queue (highest value first; the acceptance gate re-runs after each):
  1. selfnorm seeds 0-2  — the round-R north-star attack family
     (jittered weak form + scale-free eval); 3 seeds feed the
     median gate (scripts/acceptance.py seed-replication).
  2. winner_grid400_cos60k — the stretched decay window.
  3. selfnorm seed3, fixanchor seed1 — stragglers.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCREEN = os.path.join(REPO, "artifacts", "wan_floor_screen.json")
ENV = dict(os.environ, NNPDE_SCAN_CHUNK_CAP="100")

QUEUE = [
    "winner_grid400_jitter_cos45k_selfnorm",
    "winner_grid400_jitter_cos45k_selfnorm_seed1",
    "winner_grid400_jitter_cos45k_selfnorm_seed2",
    "winner_grid400_cos60k",
    "winner_grid400_jitter_cos45k_selfnorm_seed3",
    "winner_grid400_jitter_fixanchor_cos45k_seed1",
]


def log(msg: str) -> None:
    print(f"[q4f {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def in_ledger(name: str):
    try:
        rows = json.load(open(SCREEN))
    except Exception:
        return None
    for r in rows:
        if r.get("name") == name and "rel_l2" in r:
            return float(r["rel_l2"])
    return None


def run_gate() -> None:
    try:
        r = subprocess.run(
            [sys.executable, "scripts/acceptance.py", "seed-replication"],
            cwd=REPO, env=ENV, timeout=600, capture_output=True, text=True)
        log(f"gate rc={r.returncode}: {(r.stdout or r.stderr)[-300:]}")
    except subprocess.TimeoutExpired:
        log("gate TIMEOUT")


def run_subspace_2d_once() -> None:
    """Close the subspace_qho2d_k6 acceptance row (short TPU job) the
    first time the chip frees up between floor runs."""
    try:
        rows = json.load(open(os.path.join(REPO, "ACCEPTANCE.json")))
        if any(r.get("name") == "subspace_qho2d_k6" for r in rows):
            return
    except Exception:
        pass
    log("running subspace-2d acceptance row")
    try:
        r = subprocess.run(
            [sys.executable, "scripts/acceptance.py", "subspace-2d"],
            cwd=REPO, env=ENV, timeout=3600, capture_output=True, text=True)
        log(f"subspace-2d rc={r.returncode}: {(r.stdout or r.stderr)[-300:]}")
    except subprocess.TimeoutExpired:
        log("subspace-2d TIMEOUT")


def main() -> None:
    run_gate()
    first_done = False
    for name in QUEUE:
        done = in_ledger(name)
        if done is not None:
            log(f"{name}: already in ledger ({done:.4g}) — skip")
            continue
        log(f"start {name} (segmented; resumes any checkpoint)")
        # No timeout: progress is checkpointed every segment, and a dead
        # VM kills the process anyway.  A worker fault surfaces as rc!=0;
        # one retry picks up from the last completed segment.
        for attempt in (1, 2):
            r = subprocess.run(
                [sys.executable, "scripts/wan_floor.py", "--segmented", name],
                cwd=REPO, env=ENV, capture_output=True, text=True)
            log(f"{name} attempt {attempt} rc={r.returncode} "
                f"tail: {(r.stdout or r.stderr)[-300:]}")
            if r.returncode == 0:
                break
        run_gate()
        if not first_done:
            first_done = True
            run_subspace_2d_once()
    log("queue drained")


if __name__ == "__main__":
    main()
