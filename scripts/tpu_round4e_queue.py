"""Round-4 adaptive TPU queue (wave 4): the selfnorm-jitter family.

Round-R finding (docs/WAN_FLOOR.md): the fixanchor full-scale run killed
the amplitude wander (raw == scaled at 1.275e-3) but its SHAPE is worse
than the plain-jitter run's 8.48e-4 rescaled shape — the jittered weak
form has the best shape in the ledger, hidden under amplitude noise.
This wave runs the principled fix at full scale: all-jittered loss +
scale-free eval (``eval_selfnorm`` — the iterate is explicitly
unit-normalised before scoring, GT-free), seeds 0-2, feeding the
family-median acceptance gate.  Then the 60k decay window, then the
fixanchor seeds as low-priority stragglers.

Run:  python scripts/tpu_round4e_queue.py [wait_pid] >> /tmp/q4e.log 2>&1
If wait_pid is given, waits for that process (the previous queue's
in-flight lane) to exit before touching the chip.
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


def log(msg: str) -> None:
    print(f"[q4e {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def screen_result(name: str):
    try:
        rows = json.load(open(SCREEN))
    except Exception:
        return None
    for r in rows:
        if r.get("name") == name and "rel_l2" in r:
            return float(r["rel_l2"])
    return None


def run_variant(name: str, timeout_s: int):
    done = screen_result(name)
    if done is not None:
        log(f"{name}: already in ledger ({done:.4g}) — skip")
        return done
    log(f"start {name} (timeout {timeout_s}s)")
    try:
        r = subprocess.run(
            [sys.executable, "scripts/wan_floor.py", name], cwd=REPO,
            env=ENV, timeout=timeout_s, capture_output=True, text=True)
        log(f"{name} rc={r.returncode} tail: {(r.stdout or r.stderr)[-300:]}")
    except subprocess.TimeoutExpired:
        log(f"{name} TIMEOUT")
    return screen_result(name)


def run_gate() -> None:
    try:
        r = subprocess.run(
            [sys.executable, "scripts/acceptance.py", "seed-replication"],
            cwd=REPO, env=ENV, timeout=600, capture_output=True, text=True)
        log(f"gate rc={r.returncode}: {(r.stdout or r.stderr)[-300:]}")
    except subprocess.TimeoutExpired:
        log("gate TIMEOUT")


def main() -> None:
    if len(sys.argv) > 1:
        pid = int(sys.argv[1])
        log(f"waiting for in-flight lane pid {pid}")
        while os.path.exists(f"/proc/{pid}"):
            time.sleep(60)
        log("previous lane drained")
    run_gate()  # fold the finished seed4 into the base-family median
    queue = [
        ("winner_grid400_jitter_cos45k_selfnorm", 9000),
        ("winner_grid400_jitter_cos45k_selfnorm_seed1", 9000),
        ("winner_grid400_jitter_cos45k_selfnorm_seed2", 9000),
        ("winner_grid400_cos60k", 10800),
        ("winner_grid400_jitter_cos45k_selfnorm_seed3", 9000),
        ("winner_grid400_jitter_fixanchor_cos45k_seed1", 9000),
    ]
    for name, tmo in queue:
        run_variant(name, tmo)
        run_gate()
    log("queue drained")


if __name__ == "__main__":
    main()
