"""Config-4 train-step A/B: replay vs scan differentiator, remat vs stored
residuals — INTERLEAVED in one process (never A/B across processes: the
chip's thermal band makes separate-process numbers incomparable,
CLAUDE.md). Reports best-of-rounds wall ms per variant plus the shared
forward ray count.

Variants:
  replay          diff_replay=True,  diff_remat=True   (new default)
  replay-noremat  diff_replay=True,  diff_remat=False  (stored replay
                  residuals, pure-VJP backward — small enough where the
                  hybrid body OOM'd at 24.6 GB, BASELINE r5d)
  scan            diff_replay=False, diff_remat=True   (the r5e 244.3 ms
                  reference path)

Usage: python scripts/bench_diff_ab_tpu.py [--rounds N] [--skip-scan]
"""

from __future__ import annotations

import argparse
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_smallpt_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

from smallpt_tpu.config import (CameraModel, Filter, Intersector,
                                RenderConfig)
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core.scene import cornell_box_scene
from smallpt_tpu.grad.diff import image_loss_and_grads, render_mean


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--skip-scan", action="store_true")
    ap.add_argument("--skip-noremat", action="store_true")
    args = ap.parse_args()

    base_cfg = dict(
        width=args.width, height=args.height, spp_per_cell=1,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
        max_depth=args.depth, intersector=Intersector.PALLAS,
    )
    variants = {"replay": RenderConfig(**base_cfg)}
    if not args.skip_noremat:
        variants["replay-noremat"] = RenderConfig(**base_cfg,
                                                  diff_remat=False)
    if not args.skip_scan:
        variants["scan"] = RenderConfig(**base_cfg, diff_replay=False)

    scene = cornell_box_scene()
    camera = smallpt_camera()
    base = prng.base_key(0)
    cfg0 = variants["replay"]
    target = render_mean(scene, camera, cfg0, prng.base_key(99))
    np.asarray(target)
    print(f"backend={jax.default_backend()}", flush=True)

    # forward ray count (shared streams across variants — razor-edge lanes
    # may differ by a handful of rays; report the replay path's count)
    from smallpt_tpu.grad.replay import record_forward
    _, _, rays = record_forward(scene, camera, cfg0, base)
    rays_fwd = float(rays)
    print(f"fwd rays/step {rays_fwd:.0f}", flush=True)

    def one(cfg, seed):
        t0 = time.perf_counter()
        loss, _, grads = image_loss_and_grads(
            scene, camera, cfg, jax.random.fold_in(base, seed), target
        )
        # force a value fetch (block_until_ready LIES on the axon tunnel)
        _ = float(loss) + float(jnp.asarray(grads.albedo).sum())
        return time.perf_counter() - t0

    # compile + warm each variant
    for name, cfg in variants.items():
        t0 = time.perf_counter()
        try:
            one(cfg, 1000)
        except Exception as e:  # OOM guard (noremat at big shapes)
            print(f"variant {name} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            variants = {k: v for k, v in variants.items() if k != name}
            continue
        print(f"compile+first {name}: {time.perf_counter() - t0:.0f}s",
              flush=True)

    best = {name: None for name in variants}
    for r in range(args.rounds):
        for name, cfg in variants.items():
            dt = one(cfg, r)
            if best[name] is None or dt < best[name]:
                best[name] = dt
            print(f"round {r} {name}: {dt * 1e3:.1f} ms", flush=True)

    for name in variants:
        ms = best[name] * 1e3
        print(json.dumps({
            "metric": f"train_step_ms_cornell_{args.width}x{args.height}_"
                      f"{name}",
            "value": round(ms, 1),
            "unit": "ms",
            "fwd_mrays_s": round(rays_fwd / best[name] / 1e6, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
