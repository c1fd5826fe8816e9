#!/bin/bash
# Round-4 continuation queue (serial, one chip).  All WAN lanes run under
# the post-outage dispatch cap (the uncapped seed4 attempt died
# UNAVAILABLE ~3 min in, same signature as the attributed worker kills).
cd /root/repo
export NNPDE_SCAN_CHUNK_CAP=100
log() { echo "=== $1 at $(date)" >> /tmp/tpu_q4b.log; }

log "Q1 isolated WAN step A/B (fresh process per impl)"
timeout 3600 python scripts/bench_wan_step.py --impls xla,pallas-fused \
  --e1 200 --e2 600 --chunk 100 --out artifacts/bench_wan_step_isolated.json \
  > /tmp/bench_wan_isolated.log 2>&1
echo "rc=$?" >> /tmp/bench_wan_isolated.log

log "Q2 seed4 north-star replication (capped)"
timeout 7200 python scripts/wan_floor.py winner_grid400_cos45k_seed4 \
  > /tmp/wan_seed4.log 2>&1
echo "rc=$?" >> /tmp/wan_seed4.log

log "Q3 fixanchor screen (grid300, 30k)"
timeout 5400 python scripts/wan_floor.py winner_grid300_jitter_fixanchor \
  > /tmp/wan_fixanchor300.log 2>&1
echo "rc=$?" >> /tmp/wan_fixanchor300.log

log "Q4 fused tile sweep"
timeout 1800 python scripts/bench_fused_tile.py \
  > /tmp/bench_fused_tile.log 2>&1
echo "rc=$?" >> /tmp/bench_fused_tile.log

log "Q5 fused bf16x3 step-rate cost (w64 + w128)"
timeout 1800 python scripts/bench_scaling.py 64:fused_bf16x3 128:fused_bf16x3 \
  > /tmp/bench_fused_bf16x3.log 2>&1
echo "rc=$?" >> /tmp/bench_fused_bf16x3.log

log "queue drained"
