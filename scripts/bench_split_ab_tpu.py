"""Refraction splitting at equal wall time — the VERDICT r3#7/r4#7 A/B.

The reference splits REFR paths into both branches at depth <= 2
(/root/reference/smallpt.cpp:248-254); the repo supports that only on
the FLAT scheduler (budgeted within-group spawn, ops/wavefront.py),
while every performance path uses probabilistic single-path selection
(the reference's own depth > 2 rule, smallpt.cpp:256-263). The open
question: at EQUAL WALL TIME on hardware, does split-FLAT's lower
per-sample variance beat single-path streaming's higher sample rate?

Protocol: ground truth = long streaming render (4096 spp). Each variant
renders for ~BUDGET_S seconds (whole passes / steps, wall-clocked with
value fetches); error = display-space RMSE (gamma 2.2, clip [0,1],
normalized estimates) vs truth. Variants: flat_split4, flat_split1
(control: same scheduler, no splitting), streaming single-path.

Usage: python scripts/bench_split_ab_tpu.py [SMALLPT_TPU_BENCH_CPU=1]
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax

if os.environ.get("SMALLPT_TPU_BENCH_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_smallpt_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

from smallpt_tpu.config import (CameraModel, Filter, RenderConfig,
                                Scheduler)
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core.scene import cornell_box_scene
from smallpt_tpu.engine.renderer import render
from smallpt_tpu.engine.streaming import StreamingRenderer

SMOKE = bool(os.environ.get("SMALLPT_TPU_BENCH_CPU"))
W, H = (64, 48) if SMOKE else (256, 192)
DEPTH = 8 if SMOKE else 24
TRUTH_SPP = 64 if SMOKE else 4096
BUDGET_S = 2.0 if SMOKE else 20.0


def display(img):
    x = np.clip(np.asarray(img, np.float64), 0.0, 1.0)
    return x ** (1.0 / 2.2)


def rmse(a, b):
    return float(np.sqrt(np.mean((display(a) - display(b)) ** 2)))


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    scene = cornell_box_scene()
    camera = smallpt_camera()
    base = RenderConfig(width=W, height=H, spp_per_cell=1,
                        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
                        max_depth=DEPTH)

    # ---- ground truth (streaming, long)
    sr = StreamingRenderer(scene, camera, base, seed=1234)
    t0 = time.perf_counter()
    add = TRUTH_SPP
    sr.step(n_iters=64, add_samples=add)
    sr.flush()
    rad, w = sr.accumulators()
    truth = np.asarray(rad) / np.maximum(np.asarray(w)[..., None], 1)
    print(f"truth: {TRUTH_SPP} spp in {time.perf_counter()-t0:.1f}s",
          flush=True)

    results = {}

    # ---- FLAT variants: whole passes until the budget is spent
    for name, split in (("flat_split4", 4), ("flat_split1", 1)):
        cfg = dataclasses.replace(
            base, scheduler=Scheduler.FLAT, split_budget=split,
            spp_per_cell=1,
        )
        key = prng.base_key(7)
        # compile pass (not counted)
        img = render(scene, camera, cfg, jax.random.fold_in(key, 0))
        acc = np.zeros((H, W, 3))
        _ = float(jnp.sum(img))
        spp_done = 0
        passes = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < BUDGET_S:
            img = render(scene, camera, cfg,
                         jax.random.fold_in(key, passes + 1))
            acc += np.asarray(img)  # value fetch = sync
            spp_done += cfg.spp
            passes += 1
        wall = time.perf_counter() - t0
        est = acc / spp_done
        results[name] = (rmse(est, truth), spp_done, wall)
        print(f"{name}: {passes} passes, {spp_done} spp in {wall:.1f}s "
              f"rmse={results[name][0]:.5f}", flush=True)

    # ---- streaming single-path: steps until the budget is spent
    sr2 = StreamingRenderer(scene, camera, base, seed=7)
    sr2.step(n_iters=64, add_samples=2)  # compile + warm (not counted)
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < BUDGET_S:
        sr2.step(n_iters=256, add_samples=8)
    sr2.flush()
    wall = time.perf_counter() - t0
    rad, w = sr2.accumulators()
    w = np.asarray(w)
    est = np.asarray(rad) / np.maximum(w[..., None], 1)
    results["streaming"] = (rmse(est, truth), float(w.mean()), wall)
    print(f"streaming: mean {w.mean():.0f} spp in {wall:.1f}s "
          f"rmse={results['streaming'][0]:.5f}", flush=True)

    print(flush=True)
    for nm, (e, spp, wall) in results.items():
        print(f"RESULT {nm:12s} rmse={e:.5f} spp={spp} wall={wall:.1f}s",
              flush=True)
    s4, s1 = results["flat_split4"][0], results["flat_split1"][0]
    st = results["streaming"][0]
    print(f"VERDICT: split4/split1 rmse ratio {s4/s1:.3f}; "
          f"streaming/split4 {st/s4:.3f} "
          f"({'streaming dominates' if st < s4 else 'split wins'} at equal "
          f"wall time)", flush=True)


if __name__ == "__main__":
    main()
