#!/bin/bash
# Round-4 floor-attack wave 2 (serial, chained behind tpu_round4b_queue):
# the two full-scale candidates that could move the seed-median below the
# 1e-3 bar — jittered-weak-form + fixed anchors, and the 60k decay window.
cd /root/repo
export NNPDE_SCAN_CHUNK_CAP=100
log() { echo "=== $1 at $(date)" >> /tmp/tpu_q4c.log; }

while [ -e /proc/$(cat /tmp/tpu_q4b.pid) ]; do sleep 60; done
log "q4b drained — wave 2 starts"

log "W1 fixanchor full scale (grid400, 45k)"
timeout 7200 python scripts/wan_floor.py winner_grid400_jitter_fixanchor_cos45k \
  > /tmp/wan_fixanchor400.log 2>&1
echo "rc=$?" >> /tmp/wan_fixanchor400.log

log "W2 60k decay window (grid400)"
timeout 9000 python scripts/wan_floor.py winner_grid400_cos60k \
  > /tmp/wan_cos60k.log 2>&1
echo "rc=$?" >> /tmp/wan_cos60k.log

log "wave 2 drained"
