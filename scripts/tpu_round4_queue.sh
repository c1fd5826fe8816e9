#!/bin/bash
# Round-4 recovery queue v2 — re-runs the measurements lost to the
# post-outage worker regression (the worker kills long dispatches: a
# grid400 WAN EG step scanned 500 epochs/dispatch dies UNAVAILABLE even
# with round-3 code, while 100 epochs/dispatch completes — see
# runtime.scan_chunk_cap).  Everything here runs under
# NNPDE_SCAN_CHUNK_CAP=100; chunk boundaries are numerics-free.
#
# Order is cheap/high-value first: fused diagnostics + the WAN step-rate
# A/B (VERDICT r3 #4's measured half), then the full-scale fused parity
# run, then the ~1 h seed-replication / jitter-composition runs
# (VERDICT r3 #5).
cd /root/repo
export NNPDE_SCAN_CHUNK_CAP=100
log() { echo "=== $1 at $(date)" >> /tmp/tpu_q4.log; }

log "Q1 fused_short diagnostic (does the fused WAN survive under the cap?)"
timeout 1800 python scripts/wan_floor.py winner_grid400_cos45k_fused_short \
  > /tmp/q4_fused_short.log 2>&1
echo "rc=$?" >> /tmp/q4_fused_short.log

log "Q2 WAN step-rate A/B (warmup-fixed harness, both impls)"
timeout 5400 python scripts/bench_wan_step.py --impls xla,pallas-fused \
  --e1 200 --e2 600 --chunk 100 --out artifacts/bench_wan_step.json \
  > /tmp/q4_bench_wan.log 2>&1
echo "rc=$?" >> /tmp/q4_bench_wan.log

log "Q3 fused full-scale winner (accuracy parity at 45k)"
timeout 7200 python scripts/wan_floor.py winner_grid400_cos45k_fused \
  > /tmp/q4_fused_full.log 2>&1
echo "rc=$?" >> /tmp/q4_fused_full.log

log "Q4 seed1"
timeout 10800 python scripts/wan_floor.py winner_grid400_cos45k_seed1 \
  > /tmp/q4_seed1.log 2>&1
echo "rc=$?" >> /tmp/q4_seed1.log

log "Q5 seed2"
timeout 10800 python scripts/wan_floor.py winner_grid400_cos45k_seed2 \
  > /tmp/q4_seed2.log 2>&1
echo "rc=$?" >> /tmp/q4_seed2.log

log "Q6 seed-replication acceptance row"
timeout 600 python scripts/acceptance.py seed-replication \
  > /tmp/q4_seedrep.log 2>&1
echo "rc=$?" >> /tmp/q4_seedrep.log

log "Q7 jitter composition (grid400+jitter, 45k — WAN_FLOOR round N's dangling run)"
timeout 10800 python scripts/wan_floor.py winner_grid400_jitter_cos45k \
  > /tmp/q4_jitter.log 2>&1
echo "rc=$?" >> /tmp/q4_jitter.log

log "Q8 seed3 (bonus widening of the replication set)"
timeout 10800 python scripts/wan_floor.py winner_grid400_cos45k_seed3 \
  > /tmp/q4_seed3.log 2>&1
echo "rc=$?" >> /tmp/q4_seed3.log

log "queue done"
