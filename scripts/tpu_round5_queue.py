"""Round-5 TPU queue: close the seed-replication gate under the
pre-registered metric, then the short acceptance rows.

Supersedes tpu_round4f_queue.py.  Changes vs wave 5:
  * seeds 0-2 of the selfnorm family re-run under the round-T metric
    (docs/WAN_FLOOR.md — the round-4 seed-0 row used the void
    continuum-1/L normalisation and was removed from the ledger);
  * the short rows (subspace-2d, poisson-5d-neumann) interleave after
    the first long run so a session that dies mid-queue still lands them;
  * a stop sentinel (`touch /tmp/q5_stop`) drains the queue at the next
    segment boundary so the chip can be reclaimed for perf work without
    killing a run mid-segment (the axon chip SERIALIZES clients);
  * failed variants are tracked and summarised at the end (ADVICE r4
    low: a silently dropped variant must not read as 'queue drained').

Run (first thing in a session, after checking nothing else holds the chip):

    NNPDE_SCAN_CHUNK_CAP=100 nohup python scripts/tpu_round5_queue.py \
        > /tmp/q5.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCREEN = os.path.join(REPO, "artifacts", "wan_floor_screen.json")
ACCEPT = os.path.join(REPO, "ACCEPTANCE.json")
ENV = dict(os.environ, NNPDE_SCAN_CHUNK_CAP="100")
STOP = "/tmp/q5_stop"

# Long (segmented) floor runs, highest value first: three seeds of the
# declared-metric family feed the median gate.
LONG = [
    "winner_grid400_jitter_cos45k_selfnorm",
    "winner_grid400_jitter_cos45k_selfnorm_seed1",
    "winner_grid400_jitter_cos45k_selfnorm_seed2",
    # critic-width ablation (VERDICT r4 #5): w64 critic at the winner
    # shape — decides whether the packed fused WAN path is accuracy-viable
    "winner_grid400_jitter_cos45k_selfnorm_criticw64",
]
# Short acceptance rows: (acceptance.py subcommand, ACCEPTANCE.json row
# name that marks it done, timeout_s).
SHORT = [
    ("poisson-5d-neumann", "poisson_5d_drm_neumann", 1800),
    ("poisson-5d-neumann-hard", "poisson_5d_drm_neumann_hard", 1800),
    ("subspace-2d", "subspace_qho2d_k6", 3600),
    ("subspace-kh", "subspace_kh_k4", 1800),
]

failed: list[str] = []


def log(msg: str) -> None:
    print(f"[q5 {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def stop_requested() -> bool:
    if os.path.exists(STOP):
        log("stop sentinel seen — draining")
        return True
    return False


def in_ledger(name: str):
    try:
        rows = json.load(open(SCREEN))
    except Exception:
        return None
    for r in rows:
        if r.get("name") == name and "rel_l2" in r:
            return float(r["rel_l2"])
    return None


def accept_row_done(row: str) -> bool:
    try:
        rows = json.load(open(ACCEPT))
    except Exception:
        return False
    return any(r.get("name") == row for r in rows)


def run_gate() -> None:
    try:
        r = subprocess.run(
            [sys.executable, "scripts/acceptance.py", "seed-replication"],
            cwd=REPO, env=ENV, timeout=600, capture_output=True, text=True)
        log(f"gate rc={r.returncode}: {(r.stdout or r.stderr)[-300:]}")
    except subprocess.TimeoutExpired:
        log("gate TIMEOUT")


def run_short_rows() -> None:
    for sub, row, tmo in SHORT:
        if accept_row_done(row):
            continue
        if stop_requested():
            return
        log(f"short row: acceptance.py {sub}")
        try:
            r = subprocess.run(
                [sys.executable, "scripts/acceptance.py", sub],
                cwd=REPO, env=ENV, timeout=tmo, capture_output=True, text=True)
            log(f"{sub} rc={r.returncode}: {(r.stdout or r.stderr)[-300:]}")
            if r.returncode != 0:
                failed.append(sub)
        except subprocess.TimeoutExpired:
            log(f"{sub} TIMEOUT")
            failed.append(sub)


def main() -> None:
    run_gate()
    first_done = False
    for name in LONG:
        if stop_requested():
            break
        done = in_ledger(name)
        if done is not None:
            log(f"{name}: already in ledger ({done:.4g}) — skip")
            continue
        log(f"start {name} (segmented; resumes any checkpoint)")
        ok = False
        # Progress is checkpointed every segment; a worker fault surfaces
        # as rc!=0 and one retry picks up from the last completed segment.
        # rc=75 means the probe classified the process as a SLOW-MODE
        # worker (docs/WAN_FLOOR.md round Q): re-fork up to 8 times —
        # each re-fork costs ~2 min and re-rolls the worker state, vs 4x
        # the full-run wall time for letting a slow fork finish.
        hard_attempts, slow_forks = 0, 0
        while hard_attempts < 2 and slow_forks < 8:
            r = subprocess.run(
                [sys.executable, "scripts/wan_floor.py", "--segmented", name],
                cwd=REPO, env=ENV, capture_output=True, text=True)
            if r.returncode == 75:
                slow_forks += 1
                log(f"{name} slow-mode fork #{slow_forks} — re-forking "
                    f"after a 60 s backoff (a globally-degraded backend "
                    f"should not burn every re-roll in one slump)")
                time.sleep(60)
                continue
            hard_attempts += 1
            log(f"{name} attempt {hard_attempts} rc={r.returncode} "
                f"tail: {(r.stdout or r.stderr)[-300:]}")
            if r.returncode == 0:
                ok = True
                break
        if slow_forks >= 8 and not ok:
            log(f"{name}: 8 consecutive slow forks — finishing in slow "
                f"mode rather than dropping the run")
            r = subprocess.run(
                [sys.executable, "scripts/wan_floor.py", "--segmented", name],
                cwd=REPO, env=dict(ENV, NNPDE_FLOOR_PROBE="0"),
                capture_output=True, text=True)
            log(f"{name} slow-mode completion rc={r.returncode} "
                f"tail: {(r.stdout or r.stderr)[-300:]}")
            ok = r.returncode == 0
        if not ok:
            failed.append(name)
        run_gate()
        if not first_done:
            first_done = True
            run_short_rows()
    run_short_rows()
    if failed:
        log(f"queue drained, {len(failed)} FAILED: {failed}")
    else:
        log("queue drained, all ok")


if __name__ == "__main__":
    main()
