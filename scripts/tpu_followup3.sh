#!/bin/bash
# Round-4 follow-up queue 3: re-measure the WAN step rate at the winner
# shape after the per-epoch critic context landed on the XLA path (the
# u-jet is no longer recomputed per inner critic step).  Baseline from
# the same day, pre-context: XLA 13.33 epochs/s, fused 12.57.
cd /root/repo
export NNPDE_SCAN_CHUNK_CAP=100
log() { echo "=== $1 at $(date)" >> /tmp/tpu_followup3.log; }

while [ -e /proc/$(cat /tmp/tpu_followup2.pid) ]; do sleep 60; done
log "followup2 exited — post-context WAN step A/B starts"

timeout 5400 python scripts/bench_wan_step.py --impls xla,pallas-fused \
  --e1 200 --e2 600 --chunk 100 --out artifacts/bench_wan_step_ctx.json \
  > /tmp/bench_wan_step_ctx.log 2>&1
echo "rc=$?" >> /tmp/bench_wan_step_ctx.log
log "done"
