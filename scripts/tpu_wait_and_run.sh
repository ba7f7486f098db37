#!/bin/bash
# Wait for the axon tunnel to answer, then run the full r3 measurement
# session. The tunnel wedges for ~30-45 min after a killed remote compile
# and recovers on its own — so probe with a short timeout every 5 min
# rather than giving up (round-2's mistake was treating the outage as
# terminal).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p bench_logs
LOG=bench_logs/wait_${1:-session}.log
DEADLINE=$(( $(date +%s) + ${2:-36000} ))   # default: keep trying 10 h
N=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  N=$((N+1))
  echo "probe $N $(date +%H:%M:%S)" >> "$LOG"
  if timeout 120 python -c "
import jax, jax.numpy as jnp
print('sum', int(jnp.arange(8).sum()))
" >> "$LOG" 2>&1; then
    echo "TUNNEL UP $(date +%H:%M:%S) — starting session" >> "$LOG"
    exec bash scripts/tpu_session_r3.sh "${1:-}"
  fi
  sleep 300
done
echo "DEADLINE REACHED, tunnel never answered" >> "$LOG"
exit 1
