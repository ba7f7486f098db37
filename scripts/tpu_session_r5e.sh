#!/bin/bash
# r5 session E: NEE-on big-scene number (VERDICT #8 gate: >= 1.2 Mrays/s
# at 10k spheres — now via the DDA shadow walk), then the config-5 soak
# at the REAL spec (1920x1080 @ 5000 spp, 10k spheres) with the
# checkpoint -> hard-kill -> resume bit-continuity protocol.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=bench_logs/r5e_$(date +%Y%m%d_%H%M%S).log
exec >> "$LOG" 2>&1
echo "=== r5e session $(date) ==="
echo "--- stage 0: diff stage split retry (noremat OOM-guarded) ---"
timeout 3600 python -u scripts/bench_diff_stages_tpu.py
echo "--- stage 0 done $(date) ---"
echo "--- stage 1: NEE-on procedural (DDA shadow walk) ---"
timeout 3600 python -u bench.py --procedural --procedural-nee
echo "--- stage 1 done $(date) ---"
echo "--- stage 2: config-5 soak SOLO 1920x1080 @ 5000 spp ---"
timeout 14400 python -u scripts/config5_soak.py --phase solo --spp 5000 \
    --window-spp 250
echo "--- stage 2 done $(date) ---"
echo "--- stage 3: config-5 soak part1 (checkpoint + hard kill) ---"
timeout 7200 python -u scripts/config5_soak.py --phase part1 --spp 5000 \
    --kill-spp 2500 --window-spp 250
echo "--- stage 3 done $(date) ---"
echo "--- stage 4: config-5 soak part2 (resume + bit-continuity) ---"
timeout 7200 python -u scripts/config5_soak.py --phase part2 --spp 5000 \
    --kill-spp 2500 --window-spp 250
echo "=== done $(date) ==="
