#!/bin/bash
# Lane B: full-scale fused WAN A/B + the dangling jitter composition run
cd /root/repo
echo "=== fused full-scale at $(date)" >> /tmp/wan_laneB.log
timeout 7200 python scripts/wan_floor.py winner_grid400_cos45k_fused >> /tmp/wan_laneB.log 2>&1
echo "=== jitter composition at $(date)" >> /tmp/wan_laneB.log
timeout 7200 python scripts/wan_floor.py winner_grid400_jitter_cos45k >> /tmp/wan_laneB.log 2>&1
echo "laneB done at $(date)" >> /tmp/wan_laneB.log
