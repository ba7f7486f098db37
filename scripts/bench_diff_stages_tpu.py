"""Config-4 train-step stage split + remat A/B (VERDICT r4 #2).

Decomposes the 266.6 ms train step: forward-only render_mean, then the
full value_and_grad step with diff_remat on (bounce recompute in
backward, the r1-r4 default) vs off (stored residuals, pure-VJP
backward). Gradients of the two modes are checked allclose — same math,
different storage schedule.

Usage: python scripts/bench_diff_stages_tpu.py [SMALLPT_TPU_BENCH_CPU=1]
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

from smallpt_tpu.config import CameraModel, Filter, Intersector, RenderConfig
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core.scene import cornell_box_scene
from smallpt_tpu.grad.diff import image_loss_and_grads, render_mean

SMOKE = bool(os.environ.get("SMALLPT_TPU_BENCH_CPU"))
W = H = 96 if SMOKE else 512
DEPTH = 4 if SMOKE else 16


def timed(fn, reps, fetch):
    t0 = time.perf_counter()
    r = None
    for _ in range(reps):
        r = fn()
    fetch(r)
    return (time.perf_counter() - t0) / reps


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    scene = cornell_box_scene()
    camera = smallpt_camera()
    base = prng.base_key(0)
    cfgs = {
        "remat": RenderConfig(
            width=W, height=H, spp_per_cell=1,
            camera_model=CameraModel.LEGACY, filter=Filter.TENT,
            max_depth=DEPTH, intersector=Intersector.PALLAS,
        ),
    }
    cfgs["noremat"] = dataclasses.replace(cfgs["remat"], diff_remat=False)
    target = render_mean(scene, camera, cfgs["remat"], prng.base_key(99))
    np.asarray(target)

    grads_by_mode = {}
    fns = {}
    fns["forward_only"] = (
        lambda: render_mean(scene, camera, cfgs["remat"],
                            jax.random.fold_in(base, 1)),
        lambda r: float(jnp.sum(r)),
    )
    for nm, cfg in cfgs.items():
        def step(cfg=cfg, nm=nm):
            loss, img, grads = image_loss_and_grads(
                scene, camera, cfg, jax.random.fold_in(base, 1), target
            )
            grads_by_mode[nm] = grads
            return loss
        fns[f"step_{nm}"] = (step, lambda r: float(r))

    dead = []
    for nm, (fn, fetch) in fns.items():
        t0 = time.perf_counter()
        try:
            fetch(fn())
        except Exception as e:  # noqa: BLE001 — e.g. HBM OOM at 512x512:
            # storing scan residuals for 16 bounces needs ~25 GB (measured
            # r5d stage 1) — report and keep measuring the others
            print(f"variant {nm} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            dead.append(nm)
            continue
        print(f"compile+first {nm}: {time.perf_counter()-t0:.0f}s",
              flush=True)
    for nm in dead:
        fns.pop(nm)

    # gradient agreement between remat modes (when both ran)
    ga = jax.tree.leaves(grads_by_mode.get("remat", {}))
    gb = jax.tree.leaves(grads_by_mode.get("noremat", {}))
    worst = 0.0
    for a, b in zip(ga or [], gb or []):
        a, b = np.asarray(a), np.asarray(b)
        # two different compiled programs: reassociation/FMA noise through
        # depth-16 product chains; judge against the tensor's own scale and
        # report (the FD gates in tests/test_grad.py are the correctness
        # authority, run with the default remat mode)
        scale = max(float(np.abs(b).max()), 1e-6)
        worst = max(worst, float(np.abs(a - b).max() / scale))
    if ga and gb:
        print(f"grads agree across remat modes: worst scaled diff "
              f"{worst:.2e}", flush=True)
        assert worst < 5e-2, "remat modes disagree beyond noise envelope"

    reps = 1 if SMOKE else 3
    best = {}
    for w in range(1 if SMOKE else 4):
        for nm, (fn, fetch) in fns.items():
            dt = timed(fn, reps, fetch)
            best[nm] = min(best.get(nm, 9e9), dt)
    print(flush=True)
    for nm, v in best.items():
        print(f"BEST {nm:16s} {v*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
