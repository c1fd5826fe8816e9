#!/bin/bash
# Round-4 follow-up queue: runs after the watcher (queue + lanes) exits.
# Re-runs the lane casualties that crashed in the TPU-worker restart
# window behind the fused full-scale crash (see docs/WAN_FLOOR.md), then
# the diagnostics for that crash itself.
cd /root/repo
log() { echo "=== $1 at $(date)" >> /tmp/tpu_followup.log; }

# wait for the watcher process tree to finish (laneA seeds 3-4)
while [ -e /proc/$(cat /tmp/tpu_watch.pid) ]; do sleep 60; done
log "watcher exited — follow-ups start"

log "F1 seed1 re-run"
timeout 7200 python scripts/wan_floor.py winner_grid400_cos45k_seed1 >> /tmp/wan_laneA.log 2>&1
log "F2 seed2 re-run"
timeout 7200 python scripts/wan_floor.py winner_grid400_cos45k_seed2 >> /tmp/wan_laneA.log 2>&1
log "F3 seed-replication acceptance"
timeout 600 python scripts/acceptance.py seed-replication >> /tmp/wan_laneA.log 2>&1
log "F4 jitter composition re-run"
timeout 7200 python scripts/wan_floor.py winner_grid400_jitter_cos45k >> /tmp/wan_laneB.log 2>&1
log "F5 fused full-scale short repro (diagnostic, expect possible crash)"
timeout 1800 python scripts/wan_floor.py winner_grid400_cos45k_fused_short > /tmp/fused_crash_repro.log 2>&1
echo "rc=$?" >> /tmp/fused_crash_repro.log
log "F6 bench_wan_step xla row (raised windows)"
timeout 3600 python scripts/bench_wan_step.py --impls xla --e1 400 --e2 1200 \
  --out artifacts/bench_wan_step_xla.json > /tmp/bench_wan_step_xla.log 2>&1
log "follow-ups done"
