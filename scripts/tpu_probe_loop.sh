#!/bin/bash
# Probe the axon tunnel every 5 min; log when it answers. Used to detect
# recovery after a wedge (~30-45 min, r3 observation) without holding a
# hung python on the tunnel.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=bench_logs/probe_loop.log
: > "$LOG"
while true; do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
print('sum', int(jnp.arange(8).sum()))
" >> "$LOG" 2>&1; then
    echo "TUNNEL UP $(date +%H:%M:%S)" >> "$LOG"
    exit 0
  fi
  echo "down $(date +%H:%M:%S)" >> "$LOG"
  sleep 300
done
