"""A/B: continuous-wavefront streaming vs per-pass brute REGEN on the
10k-sphere scene (TPU).

Round-3 pinned the big-scene path at 3.59 Mrays/s e2e while this round's
kernel-only measurement put the split-sweep intersect at ~8 Mrays/s — the
gap is occupancy (per-pass REGEN drains with decaying occupancy) plus
per-pass wrapper work. engine/mesh_stream.py::WavefrontStreamingRenderer
already runs ANY scene the XLA shading path serves as ONE re-launched
program per bounce with stream-keyed regeneration (~100% occupancy); this
measures it on the sphere scene it was never pointed at.

Usage: python scripts/bench_sphere_stream_tpu.py [--n 10000]
"""

from __future__ import annotations

import argparse
import os
import time

import jax

if os.environ.get("SMALLPT_TPU_BENCH_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_smallpt_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

from smallpt_tpu.config import (CameraModel, Filter, Intersector,
                                RenderConfig)
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core.scene import procedural_sphere_scene
from smallpt_tpu.engine.mesh_stream import WavefrontStreamingRenderer
from smallpt_tpu.engine.renderer import _render_with_stats_jit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--depth", type=int, default=24)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    print(f"backend={jax.default_backend()}", flush=True)
    config = RenderConfig(
        width=args.width, height=args.height, spp_per_cell=1,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
        max_depth=args.depth, intersector=Intersector.PALLAS,
    )
    scene = procedural_sphere_scene(args.n)
    camera = smallpt_camera()
    base = prng.base_key(0)

    r = WavefrontStreamingRenderer(scene, camera, config, seed=0)

    def stream_once(seed):
        r.key = jax.random.fold_in(base, seed)
        r.reset()  # also zeroes stats (per-round rates)
        t0 = time.perf_counter()
        # ~7 bounces/sample mean path length (depth-24 RR): run the bulk
        # at full occupancy, let flush() drain the tail in max_depth-sized
        # rounds
        r.step(n_bounces=7 * args.spp, add_samples=args.spp)
        r.flush()
        return r.stats.rays, time.perf_counter() - t0

    cfg_pp = config.replace(spp_per_cell=max(1, args.spp // 4))

    def brute_once(seed):
        t0 = time.perf_counter()
        img, rays = _render_with_stats_jit(
            scene, camera, cfg_pp, jax.random.fold_in(base, seed))
        n = float(rays)
        return n, time.perf_counter() - t0

    t0 = time.perf_counter()
    stream_once(1000)
    print(f"stream compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    brute_once(2000)
    print(f"brute compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

    best = {}
    for w in range(args.rounds):
        for name, fn in (("stream", stream_once), ("brute", brute_once)):
            rays, dt = fn(w)
            rate = rays / dt
            print(f"# {name} round {w}: {rate/1e6:.2f} M "
                  f"({rays:.2e} rays / {dt:.2f}s)", flush=True)
            if name not in best or rate > best[name]:
                best[name] = rate
    print()
    for name, rate in best.items():
        print(f"{name:8s} {rate/1e6:7.2f} Mrays/s", flush=True)
    print(f"stream/brute = {best['stream']/best['brute']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
