#!/bin/bash
# (committed copy of the round-4 /tmp recovery queue — run from the repo root
# when the axon TPU backend returns; see TODO.md "Blocked on the TPU backend")
# Serial TPU work queue for round 4 — fire on backend recovery.
# Each unit appends to /tmp/tpu_queue.log and its own artifact files;
# safe to kill/restart (compilation cache + per-unit outputs).
cd /root/repo
log() { echo "=== $1 at $(date)" >> /tmp/tpu_queue.log; }

log "Q1 bench exact"
timeout 1200 python bench.py > /tmp/bench_exact.json 2>/tmp/bench_exact.err
log "Q2 bench fused"
timeout 1200 python bench.py --kernel-mode fused > /tmp/bench_fused.json 2>/tmp/bench_fused.err
log "Q2b bench fused-analytic"
timeout 1200 python bench.py --kernel-mode fused-analytic > /tmp/bench_fused_analytic.json 2>/tmp/bench_fused_analytic.err
log "Q3 kernel accuracy"
timeout 1800 python scripts/kernel_accuracy.py > /tmp/kernel_acc.log 2>&1
log "Q4 bench scaling fused"
timeout 2400 python scripts/bench_scaling.py 64:fused 128:fused 256:fused > /tmp/bench_scaling_fused.log 2>&1
log "Q4b acceptance fused parity"
timeout 2400 python scripts/acceptance.py fused > /tmp/acc_fused.log 2>&1
log "Q5 wan step A/B"
timeout 3600 python scripts/bench_wan_step.py --out artifacts/bench_wan_step.json > /tmp/bench_wan_step.log 2>&1
log "Q6 floquet point2 train"
timeout 3600 python scripts/floquet_point2.py --train --M 3 > /tmp/floquet_p2.log 2>&1
log "queue head done"

log "Q7 acceptance floquet point2"
timeout 3600 python scripts/acceptance.py kh-floquet-p2 > /tmp/acc_floq_p2.log 2>&1
log "queue measurements+floquet done — launch the long WAN lanes next"
