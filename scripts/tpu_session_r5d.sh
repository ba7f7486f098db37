#!/bin/bash
# r5 session D: config-4 stage split + remat A/B (VERDICT #2), the
# refraction-splitting equal-wall-time A/B (VERDICT #7), and the mesh
# streaming re-measure with the r4 flush-cap fix (VERDICT #8).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=bench_logs/r5d_$(date +%Y%m%d_%H%M%S).log
exec >> "$LOG" 2>&1
echo "=== r5d session $(date) ==="
echo "--- stage 0: bench.py --procedural (DDA streaming product surface) ---"
timeout 3600 python -u bench.py --procedural
echo "--- stage 0 done $(date) ---"
echo "--- stage 1: diff train-step stage split + remat A/B ---"
timeout 3600 python -u scripts/bench_diff_stages_tpu.py
echo "--- stage 1 done $(date) ---"
echo "--- stage 2: refraction splitting equal-wall-time A/B ---"
timeout 3600 python -u scripts/bench_split_ab_tpu.py
echo "--- stage 2 done $(date) ---"
echo "--- stage 3: mesh streaming re-measure (r4 flush-cap fix) ---"
timeout 3600 python -u bench.py --mesh-stream
echo "=== done $(date) ==="
