#!/bin/bash
# r5g session: config-4 diff measurements with the replay differentiator
# (VERDICT r4 #2: target <= 200 ms), plus product-surface re-confirmation.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
LOG=bench_logs/r5g_$(date +%Y%m%d_%H%M%S).log
echo "=== r5g session $(date) ===" | tee $LOG
echo "--- stage 0: replay hardware sanity (Mosaic lowering) ---" | tee -a $LOG
timeout 3600 python scripts/check_replay_tpu.py >> $LOG 2>&1
echo "--- stage 0 done $(date), rc=$? ---" | tee -a $LOG
echo "--- stage 1: config-4 interleaved A/B (replay / noremat / scan) ---" | tee -a $LOG
timeout 7200 python scripts/bench_diff_ab_tpu.py --rounds 5 >> $LOG 2>&1
echo "--- stage 1 done $(date), rc=$? ---" | tee -a $LOG
echo "--- stage 2: bench.py --diff (the recorded config-4 product number) ---" | tee -a $LOG
timeout 3600 python bench.py --diff >> $LOG 2>&1
echo "--- stage 2 done $(date), rc=$? ---" | tee -a $LOG
echo "--- stage 3: headline + procedural re-confirmation ---" | tee -a $LOG
timeout 3600 python bench.py >> $LOG 2>&1
timeout 3600 python bench.py --procedural >> $LOG 2>&1
echo "--- stage 3 done $(date), rc=$? ---" | tee -a $LOG
echo "=== r5g done $(date) ===" | tee -a $LOG
