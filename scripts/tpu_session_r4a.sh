#!/bin/bash
# r4 session A: stream-vs-brute router data, MXU microbench, diff step.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=bench_logs/r4a_$(date +%Y%m%d_%H%M%S).log
exec >> "$LOG" 2>&1
echo "=== r4a session $(date) ==="
echo "--- stage 1: sphere streaming wavefront vs brute REGEN (10k) ---"
timeout 2400 python -u scripts/bench_sphere_stream_tpu.py --rounds 3
echo "--- stage 2: MXU microbench (K-scaling / packing / pipelining) ---"
timeout 2400 python -u scripts/bench_mxu_microbench.py
echo "--- stage 3: diff train step (one-hot gathers) ---"
timeout 2400 python -u bench.py --diff
echo "=== done $(date) ==="
