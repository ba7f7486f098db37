#!/bin/bash
# r5f session: BASELINE config-5 workload at FULL spec (1920x1080 @ 5000 spp,
# 10k procedural spheres, DDA streaming engine, capped launches), with the
# real checkpoint -> hard-kill -> resume -> bit-continuity protocol.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=bench_logs/r5f_$(date +%Y%m%d_%H%M%S).log
echo "=== r5f config-5 full-spec soak $(date) ===" | tee $LOG
echo "--- phase solo: 1920x1080 @ 5000 spp ---" | tee -a $LOG
timeout 14400 python scripts/config5_soak.py --phase solo --spp 5000 >> $LOG 2>&1
echo "--- solo done $(date), rc=$? ---" | tee -a $LOG
echo "--- phase part1: first 2500 spp + checkpoint + hard kill ---" | tee -a $LOG
timeout 14400 python scripts/config5_soak.py --phase part1 --spp 5000 --kill-spp 2500 >> $LOG 2>&1
echo "--- part1 done $(date), rc=$? ---" | tee -a $LOG
echo "--- phase part2: resume + finish + bit-continuity ---" | tee -a $LOG
timeout 14400 python scripts/config5_soak.py --phase part2 --spp 5000 --kill-spp 2500 >> $LOG 2>&1
echo "--- part2 done $(date), rc=$? ---" | tee -a $LOG
echo "=== r5f done $(date) ===" | tee -a $LOG
