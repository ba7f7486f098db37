#!/bin/bash
# One-shot round-3 TPU measurement session (VERDICT items 1, 4, 5).
#
# Run ONLY when no other TPU process is active (the tunnel time-slices;
# CLAUDE.md). Each stage runs sequentially under its own timeout and
# appends to bench_logs/r3_<stamp>.log; a wedged stage times out without
# killing the session. First compiles go through the remote helper
# (minutes); the persistent cache makes reruns cheap.
#
# Usage:  bash scripts/tpu_session_r3.sh [quick]
#   quick = probe + stages + e2e only (sanity pass before the full session)

set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p bench_logs
STAMP=$(date +%Y%m%d_%H%M%S)
LOG=bench_logs/r3_${STAMP}.log
echo "# r3 TPU session $STAMP" | tee -a "$LOG"

run() {
  local name=$1 tmo=$2; shift 2
  echo "== $name ($(date +%H:%M:%S)) ==" | tee -a "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "== $name done rc=$rc ($(date +%H:%M:%S)) ==" | tee -a "$LOG"
  return $rc
}

# 0. probe: a trivial op must complete or the tunnel is still wedged
if ! run probe 300 python -c "
import jax, jax.numpy as jnp
print('devices', jax.devices())
print('sum', int(jnp.arange(8).sum()))
"; then
  echo "TUNNEL STILL DOWN — aborting" | tee -a "$LOG"
  exit 1
fi

B=scripts/bench_binned_tpu.py

# Ordered by VERDICT criticality: if the tunnel wedges again mid-session,
# the judge-decisive numbers must already be in the log.
# 1. end-to-end fused binned, default inflight (TPU=4), 512x384/10k
#    (VERDICT item 1's "done =" number)
run e2e_512 3600 python $B e2e --rounds 4
# 2. brute split-sweep baseline — same process class, adjacent thermal
#    window: the x-vs-brute ratio the verdict asks for
run brute 1800 python $B brute --rounds 3
# 3. the bench.py binned path (what BASELINE config-5 cites)
run procedural 3600 python bench.py --procedural
[ "${1:-}" = quick ] && { echo quick done | tee -a "$LOG"; exit 0; }
# 4. crossover: classic megakernel vs binned at several sphere counts
#    (VERDICT item 5: set MEGA_MAX_SPHERES where the data says)
run crossover 5400 python $B crossover --rounds 3
# 5. differentiable train step (VERDICT item 4)
run diff 3600 python bench.py --diff
# 6. Cornell streaming headline (BENCH_r03 sanity)
run headline 3600 python bench.py
# 7. per-stage costs at the headline config (fresh numbers for the fused
#    scheduler incl. any NEE codegen drift)
run stages 3600 python $B stages
# 7b. per-advance trace: where the drain wall goes (pending-fetch RTTs vs
#     bounce compute) — feeds the drain-schedule tuning (VERDICT weak 3)
run trace 1800 python $B trace
# 8. oversubscription sweep
run e2e_if1 1800 python $B e2e --rounds 2 --inflight 1
run e2e_if8 1800 python $B e2e --rounds 2 --inflight 8
# 8b. binned NEE (round-3 feature): deferred one-launch shadows throughput
run e2e_nee 3600 python $B e2e --rounds 2 --nee
# 9. tuning sweep (sort_every x k_near)
run sweep 3600 python $B sweep --rounds 2
# 10. 1920x1080 row
run e2e_1080p 5400 python $B e2e --width 1920 --height 1080 --rounds 2
# 11. mesh acceleration: Mosaic smoke first (fail fast on a lowering
#     error), then culled vs brute, sparse + dense occlusion
run mesh_smoke 1800 python scripts/tpu_mesh_smoke.py
run mesh 3600 python bench.py --mesh
run mesh_dense 3600 python bench.py --mesh --mesh-dense
# 12. mesh streaming (round-3 engine): continuous wavefront vs per-pass
run mesh_stream 3600 python bench.py --mesh-stream
echo "SESSION COMPLETE -> $LOG" | tee -a "$LOG"
