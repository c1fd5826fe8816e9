"""Round-4 adaptive TPU queue (wave 3): the fixanchor floor attack.

Waits for the axon backend to answer a short watchdogged probe, then runs
the remaining round-4 floor-hunt lanes serially, adapting on results:

  1. winner_grid400_jitter_fixanchor_cos45k   (the round-Q attack, ~4000 s)
  2. if (1) lands <= PROMOTE_BAR: fixanchor seeds 1,2 (family median needs
     >= 3 seeds of ONE config), acceptance gate after each; seed 3 if the
     median is marginal.  Else: winner_grid400_cos45k_seed4 (5-seed median
     of the base family) + winner_grid400_cos60k (decay-window stretch).
  3. whatever of {seed4, cos60k, fixanchor seed3} is still unrun, in
     information-value order, until the list drains.

Everything runs under NNPDE_SCAN_CHUNK_CAP=100 (the post-outage worker
kills long dispatches; chunk boundaries are bitwise numerics-free — see
nnpde_tpu/runtime.py scan_chunk_cap).  Each unit is its own subprocess
with a hard timeout, so a worker crash costs one lane, not the queue.

Run inside tmux:  python scripts/tpu_round4d_queue.py >> /tmp/q4d.log 2>&1
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCREEN = os.path.join(REPO, "artifacts", "wan_floor_screen.json")
PROMOTE_BAR = 1.05e-3  # promote the fixanchor family if seed-0 lands here

ENV = dict(os.environ, NNPDE_SCAN_CHUNK_CAP="100")


def log(msg: str) -> None:
    print(f"[q4d {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def probe_backend(timeout_s: int = 150) -> bool:
    code = ("import jax, jax.numpy as jnp\n"
            "d = jax.devices()\n"
            "x = jnp.ones((128, 128))\n"
            "(x @ x).block_until_ready()\n"
            "print('probe ok:', d)\n")
    try:
        r = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                           timeout=timeout_s, capture_output=True, text=True)
        if r.returncode == 0:
            log(r.stdout.strip())
            return True
        log(f"probe rc={r.returncode}: {r.stderr.strip()[-200:]}")
    except subprocess.TimeoutExpired:
        log("probe timeout")
    return False


def screen_result(name: str) -> float | None:
    try:
        rows = json.load(open(SCREEN))
    except Exception:
        return None
    for r in rows:
        if r.get("name") == name and "rel_l2" in r:
            return float(r["rel_l2"])
    return None


def run_variant(name: str, timeout_s: int) -> float | None:
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
    log("waiting for backend")
    while not probe_backend():
        time.sleep(300)
    log("backend UP — queue starts")

    fixanchor = "winner_grid400_jitter_fixanchor_cos45k"
    r1 = run_variant(fixanchor, 9000)
    run_gate()

    queue: list[tuple[str, int]]
    if r1 is not None and r1 <= PROMOTE_BAR:
        log(f"fixanchor seed0 {r1:.4g} <= {PROMOTE_BAR} — promote family")
        queue = [(f"{fixanchor}_seed1", 9000), (f"{fixanchor}_seed2", 9000),
                 (f"{fixanchor}_seed3", 9000),
                 ("winner_grid400_cos45k_seed4", 9000),
                 ("winner_grid400_cos60k", 10800)]
    else:
        log(f"fixanchor seed0 {r1} > bar — stay on the base family")
        queue = [("winner_grid400_cos45k_seed4", 9000),
                 ("winner_grid400_cos60k", 10800),
                 (f"{fixanchor}_seed1", 9000), (f"{fixanchor}_seed2", 9000)]

    for name, tmo in queue:
        run_variant(name, tmo)
        run_gate()
    log("queue drained")


if __name__ == "__main__":
    main()
