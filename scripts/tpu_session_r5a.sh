#!/bin/bash
# r5 session A: the stranded r4b measurement plan, ordered by importance
# (VERDICT r4 items #2/#3/#4): honest post-precision-fix config-4 diff
# number first, then the bounce stage split (attributes the 44% of
# big-scene wall outside the kernel), the procedural drain-fix re-run,
# the binned UV Mosaic smoke (open since r3), and the fixed MXU
# microbench.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=bench_logs/r5a_$(date +%Y%m%d_%H%M%S).log
exec >> "$LOG" 2>&1
echo "=== r5a session $(date) ==="
echo "--- stage 1: diff train step re-measure (post bf16-precision fix) ---"
timeout 2400 python -u bench.py --diff
echo "--- stage 1 done $(date) ---"
echo "--- stage 2: wavefront bounce stage split @10k ---"
timeout 2400 python -u scripts/bench_bounce_stages_tpu.py
echo "--- stage 2 done $(date) ---"
echo "--- stage 3: bench.py --procedural (binned drain, r3-#3 fix check) ---"
timeout 3600 python -u bench.py --procedural
echo "--- stage 3 done $(date) ---"
echo "--- stage 4: binned UV AOV Mosaic smoke ---"
timeout 2400 python -u - << 'PYEOF'
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_smallpt_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import numpy as np
from smallpt_tpu.config import RenderConfig, CameraModel, Filter, Mode
from smallpt_tpu.core.scene import procedural_sphere_scene
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.engine.binned import BinnedStreamingRenderer
config = RenderConfig(width=64, height=48, spp_per_cell=1,
                      camera_model=CameraModel.LEGACY, filter=Filter.TENT,
                      max_depth=4, mode=Mode.UV)
scene = procedural_sphere_scene(2100)
r = BinnedStreamingRenderer(scene, smallpt_camera(), config, seed=0)
r.step(add_samples=2, n_bounces=6)
r.flush()
rad, w = r.accumulators()
rad, w = np.asarray(rad), np.asarray(w)
img = rad / np.maximum(w[..., None], 1)
assert np.isfinite(img).all(), "UV AOV produced non-finite values"
assert img.max() > 0.05, "UV AOV all-dark (suspicious)"
assert (img >= -1e-5).all() and (img <= 1 + 1e-5).all(), "UV out of [0,1]"
print("binned UV Mosaic smoke OK:",
      "min", float(img.min()), "max", float(img.max()),
      "mean", float(img.mean()))
PYEOF
echo "--- stage 4 done $(date) ---"
echo "--- stage 5: MXU microbench (K-scaling / packing / pipelining) ---"
timeout 2400 python -u scripts/bench_mxu_microbench.py
echo "=== done $(date) ==="
