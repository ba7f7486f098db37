"""Streaming DDA vs classic streaming on the 10k-sphere scene — the r5
flagship A/B (VERDICT r4 #1 "done" gate: >= 2x brute e2e, router flip).

Protocol (CLAUDE.md bench rules): one process, interleaved variants,
value-fetch per step, warmup before windows, best sustained window
reported. Rays counted by the kernels' own per-bounce counters.

Stages:
  1. Hardware parity smoke at 64x48: classic vs DDA streaming images
     (same budget) — max rel pixel diff (razor-edge envelope expected).
  2. Interleaved throughput at 512x384 @ 10k, depth 24: classic
     streaming, DDA streaming at several grids, brute REGEN per-pass
     (the r4 big-scene champion) for the same wall-clock accounting.

Usage: python scripts/bench_stream_dda_tpu.py [SMALLPT_TPU_BENCH_CPU=1]
"""

from __future__ import annotations

import os
import time

import jax

if os.environ.get("SMALLPT_TPU_BENCH_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_smallpt_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

from smallpt_tpu.config import RenderConfig, CameraModel, Filter, Intersector
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core.scene import procedural_sphere_scene
from smallpt_tpu.ops.megakernel import (
    init_stream_state, stream_image, stream_pending, stream_step,
)
from smallpt_tpu.ops.stream_dda import (
    build_stream_dda_tables, init_stream_dda_state, stream_step_dda,
)

SMOKE = bool(os.environ.get("SMALLPT_TPU_BENCH_CPU"))


def drain(stepf, f, i, max_steps=200):
    for _ in range(max_steps):
        f, i, _ = stepf(f, i)
        a, c = stream_pending(i)
        if a == 0 and c == 0:
            break
    return f, i


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    camera = smallpt_camera()
    key = prng.base_key(0)

    # ---- stage 1: hardware parity smoke
    cfg_s = RenderConfig(width=64, height=48, spp_per_cell=1,
                         camera_model=CameraModel.LEGACY, filter=Filter.TENT,
                         max_depth=6)
    scene_s = procedural_sphere_scene(2100)
    budget = 2
    f, i = init_stream_state(cfg_s)
    f, i = drain(lambda f_, i_: stream_step(
        scene_s, camera, cfg_s, key, f_, i_, budget, 64), f, i)
    rad_c, w_c = stream_image(f, i, cfg_s)
    tabs = build_stream_dda_tables(scene_s, cfg_s, occ_target=28.0)
    f, i = init_stream_dda_state(cfg_s)
    f, i = drain(lambda f_, i_: stream_step_dda(
        scene_s, camera, cfg_s, key, f_, i_, budget, 320, tabs), f, i)
    rad_d, w_d = stream_image(f, i, cfg_s)
    rad_c, rad_d = np.asarray(rad_c), np.asarray(rad_d)
    w_eq = bool((np.asarray(w_c) == np.asarray(w_d)).all())
    diff = np.abs(rad_d - rad_c).max(axis=-1)
    print(f"parity: weights_eq={w_eq} n_px_diff>1e-3={int((diff > 1e-3).sum())}"
          f"/{diff.size} max_abs={float(diff.max()):.4f}", flush=True)

    # ---- stage 2: interleaved throughput @ 10k
    W, H, depth = (128, 96, 8) if SMOKE else (512, 384, 24)
    cfg = RenderConfig(width=W, height=H, spp_per_cell=1,
                       camera_model=CameraModel.LEGACY, filter=Filter.TENT,
                       max_depth=depth, intersector=Intersector.PALLAS)
    scene = procedural_sphere_scene(500 if SMOKE else 10_000)
    occs = (28.0, 48.0, 96.0) if not SMOKE else (28.0,)
    tabs10 = {occ: build_stream_dda_tables(scene, cfg, occ_target=occ)
              for occ in occs}
    for occ, tb in tabs10.items():
        print(f"grid occ={occ}: nb={tb.nb} C={tb.n_cells} K={tb.k} "
              f"ovf={tb.n_overflow}", flush=True)

    state = {}

    def classic_mk():
        f, i = init_stream_state(cfg)
        return ("classic", f, i, 0,
                lambda f_, i_, b: stream_step(
                    scene, camera, cfg, key, f_, i_, b, 96))

    def dda_mk(occ):
        f, i = init_stream_dda_state(cfg)
        return (f"dda{int(occ)}", f, i, 0,
                lambda f_, i_, b, tb=tabs10[occ]: stream_step_dda(
                    scene, camera, cfg, key, f_, i_, b, 480, tb))

    variants = [classic_mk()] + [dda_mk(o) for o in occs]
    state = {v[0]: [v[1], v[2], v[3], v[4]] for v in variants}

    # compile + warmup
    for nm, st in state.items():
        t0 = time.perf_counter()
        st[2] += 4
        st[0], st[1], r = st[3](st[0], st[1], st[2])
        _ = int(r)
        print(f"compile+first {nm}: {time.perf_counter()-t0:.0f}s", flush=True)

    windows = 1 if SMOKE else 4
    reps = 1 if SMOKE else 3
    best = {}
    for w in range(windows):
        for nm, st in state.items():
            t0 = time.perf_counter()
            rays = 0
            for _ in range(reps):
                st[2] += 8
                st[0], st[1], r = st[3](st[0], st[1], st[2])
                rays += int(r)
            dt = time.perf_counter() - t0
            rate = rays / dt
            best[nm] = max(best.get(nm, 0.0), rate)
            print(f"w{w} {nm:10s} {rays/1e6:7.2f} Mrays {dt:6.2f}s "
                  f"{rate/1e6:7.2f} Mrays/s", flush=True)
    print(flush=True)
    for nm, v in best.items():
        note = "" if nm == "classic" else f"  ({v/best['classic']:.2f}x classic)"
        print(f"BEST {nm:10s} {v/1e6:8.2f} Mrays/s{note}", flush=True)


if __name__ == "__main__":
    main()
