#!/bin/bash
# Round-4 follow-up queue 2 — the 50x-headline composition measurements
# (VERDICT r3 #3): fused one-pass kernel x reduced-precision dots, step
# rate and e2e accuracy.  Waits for the main round-4 queue (seed
# replication + jitter composition) to free the chip, then runs
# same-session A/Bs.
cd /root/repo
export NNPDE_SCAN_CHUNK_CAP=100
log() { echo "=== $1 at $(date)" >> /tmp/tpu_followup2.log; }

while [ -e /proc/$(cat /tmp/tpu_q4.pid) ]; do sleep 60; done
log "q4 queue exited — composition measurements start"

log "C1 bench fused (headline re-confirm, same session as C2)"
timeout 1200 python bench.py --kernel-mode fused > /tmp/bench_fused_c1.log 2>&1
echo "rc=$?" >> /tmp/bench_fused_c1.log

log "C2 bench fused-bf16 (composition step rate)"
timeout 1200 python bench.py --kernel-mode fused-bf16 > /tmp/bench_fused_bf16.log 2>&1
echo "rc=$?" >> /tmp/bench_fused_bf16.log

log "C3 width scaling of the composition"
timeout 3600 python scripts/bench_scaling.py 64:fused_bf16dots 128:fused_bf16dots 256:fused_bf16dots \
  > /tmp/bench_scaling_fbf16.log 2>&1
echo "rc=$?" >> /tmp/bench_scaling_fbf16.log

log "C4 hybrid-kernel x fused e2e (accuracy + wall time, 2D headline shape, 3k epochs)"
timeout 1800 python -m nnpde_tpu.exp.cli poisson --dim 2 --method PINN \
  --jet-impl pallas-fused --compute-dtype hybrid-kernel --epochs 3000 \
  --chunk 100 --save-dir results/ND_Poisson > /tmp/hybrid_fused_e2e.log 2>&1
echo "rc=$?" >> /tmp/hybrid_fused_e2e.log

log "C5 f32 fused e2e control (same shape/horizon)"
timeout 1800 python -m nnpde_tpu.exp.cli poisson --dim 2 --method PINN \
  --jet-impl pallas-fused --compute-dtype float32 --epochs 3000 \
  --chunk 100 --save-dir results/ND_Poisson > /tmp/f32_fused_e2e.log 2>&1
echo "rc=$?" >> /tmp/f32_fused_e2e.log

log "composition follow-ups done"
