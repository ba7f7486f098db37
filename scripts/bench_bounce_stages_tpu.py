"""Per-stage cost of the XLA streaming-wavefront bounce at 10k spheres.

r4 session A measured the wavefront at ~52 ms/bounce-equivalent while the
intersect KERNEL alone runs 24.45 ms at the same 196k lanes — this script
splits the difference into (kernel) / (wrapper: transpose+takes+normalize)
/ (full bounce: + regen + shading + state where-chains), all same-process.

Usage: python scripts/bench_bounce_stages_tpu.py [--n 10000]
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

import functools

import jax.numpy as jnp
import numpy as np

from smallpt_tpu.config import (CameraModel, Filter, Intersector,
                                RenderConfig)
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core.scene import procedural_sphere_scene
from smallpt_tpu.engine import mesh_stream as ms
from smallpt_tpu.ops import intersect_pallas as ip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--depth", type=int, default=24)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--windows", type=int, default=4)
    args = ap.parse_args()

    interpret = jax.default_backend() != "tpu"
    print(f"backend={jax.default_backend()}", flush=True)
    config = RenderConfig(
        width=args.width, height=args.height, spp_per_cell=1,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
        max_depth=args.depth, intersector=Intersector.PALLAS,
    )
    scene = procedural_sphere_scene(args.n)
    camera = smallpt_camera()
    key = prng.base_key(0)
    G = config.n_pixels

    rng = np.random.default_rng(0)
    org = jnp.asarray(rng.uniform([5, 5, 20], [95, 75, 150], (G, 3)),
                      jnp.float32)
    d = rng.normal(size=(G, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs = jnp.asarray(d, jnp.float32)

    # --- variants (each ONE jit program, relaunched iters times) ----------
    table, perm, nbc, nsc = ip.build_sphere_table(scene)
    n_pad = -(-G // ip._RAY_TILE) * ip._RAY_TILE
    org_t = jnp.zeros((3, n_pad), jnp.float32).at[:, :G].set(org.T)
    dir_t = (jnp.zeros((3, n_pad), jnp.float32).at[0, :].set(1.0)
             .at[:, :G].set(dirs.T))

    def kernel_only():
        return ip._closest_hit(org_t, dir_t, table, nbc, nsc,
                               interpret=interpret)

    # scene as a jit ARGUMENT (not a closure): the wrapper's eager
    # MAX_BIG capacity check must see tracers to skip itself
    @jax.jit
    def _wrapper_only(o, dd, sc):
        h = ip.intersect_spheres_pallas(o, dd, sc, want_uv=False,
                                        interpret=interpret)
        return h.t, h.inst, h.x, h.n

    @jax.jit
    def _wrapper_uv(o, dd, sc):
        h = ip.intersect_spheres_pallas(o, dd, sc, want_uv=True,
                                        interpret=interpret)
        return h.t, h.inst, h.x, h.n, h.uv

    wrapper_only = lambda o, dd: _wrapper_only(o, dd, scene)
    wrapper_uv = lambda o, dd: _wrapper_uv(o, dd, scene)

    st0 = ms._init_state(config)
    st0 = st0._replace(budget=jnp.full((G,), 1 << 30, jnp.int32))

    # full bounce, donated state — replicate the renderer's launch
    def full_bounce(st):
        st, rays = ms._bounce(scene, camera, key, st, config, None, None)
        return st

    variants = [
        ("kernel_only", lambda st: (kernel_only(), st)[1]),
        ("wrapper_nouv", lambda st: (wrapper_only(org, dirs), st)[1]),
        ("wrapper_uv", lambda st: (wrapper_uv(org, dirs), st)[1]),
        ("full_bounce", full_bounce),
    ]

    # compile + warm
    state = {}
    for name, fn in variants:
        t0 = time.perf_counter()
        st = fn(st0 if name == "full_bounce" else None)
        if name == "full_bounce":
            state[name] = st
        jax.block_until_ready(st)
        float(jnp.sum(org_t))  # fetch barrier
        print(f"compile {name}: {time.perf_counter()-t0:.0f}s", flush=True)

    best = {}
    for w in range(args.windows):
        for name, fn in variants:
            st = state.get(name)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                st = fn(st)
            if name == "full_bounce":
                state[name] = st
                float(jnp.sum(st.s_idx))
            else:
                float(jnp.sum(org_t))
            dt = (time.perf_counter() - t0) / args.iters
            best[name] = min(best.get(name, 9e9), dt)
    print(flush=True)
    for name, v in best.items():
        print(f"{name:14s} {v*1e3:8.2f} ms/launch  "
              f"({G/v/1e6:6.2f} M lanes/s)", flush=True)


if __name__ == "__main__":
    main()
