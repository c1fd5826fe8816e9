#!/bin/bash
# Round-4 TPU recovery watcher (committed copy; run inside tmux).
# Probes the axon backend every 5 minutes with a 150 s watchdog; on the
# first successful probe it runs the serial measurement queue, then the
# two long WAN lanes back-to-back (single chip -> serial, lane B first:
# it is the cheaper one and unblocks the fused-WAN parity row).
cd /root/repo
echo "watch start at $(date)" >> /tmp/tpu_watch.log
while true; do
  if timeout 150 python - <<'EOF' >> /tmp/tpu_watch.log 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
x = jnp.ones((128, 128))
(x @ x).block_until_ready()
print("probe ok:", d)
EOF
  then
    echo "backend UP at $(date)" >> /tmp/tpu_watch.log
    break
  fi
  echo "probe failed at $(date); sleeping 300" >> /tmp/tpu_watch.log
  sleep 300
done
bash scripts/tpu_recovery_queue.sh
echo "queue done at $(date)" >> /tmp/tpu_watch.log
bash scripts/tpu_wan_laneB.sh
echo "laneB done at $(date)" >> /tmp/tpu_watch.log
bash scripts/tpu_wan_laneA.sh
echo "laneA done at $(date)" >> /tmp/tpu_watch.log
echo "ALL DONE at $(date)" >> /tmp/tpu_watch.log
