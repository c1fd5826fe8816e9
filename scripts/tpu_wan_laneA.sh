#!/bin/bash
# Lane A: north-star seed replication (serial, ~1h each)
cd /root/repo
for s in 1 2 3 4; do
  echo "=== seed$s at $(date)" >> /tmp/wan_laneA.log
  timeout 7200 python scripts/wan_floor.py winner_grid400_cos45k_seed$s >> /tmp/wan_laneA.log 2>&1
done
timeout 600 python scripts/acceptance.py seed-replication >> /tmp/wan_laneA.log 2>&1
echo "laneA done at $(date)" >> /tmp/wan_laneA.log
