"""Per-ray DDA kernel vs the brute split-sweep on hardware — the r5
pair-cut calibration (VERDICT r4 #1).

Stages, each printed as it lands (the tunnel can die mid-session):
  0. TPU health probe (the K128 microbench variant crashed the backend
     twice — establish a clean slate first).
  1. Hardware exactness gate: DDA vs brute on the 2100-sphere procedural
     scene, 4096 rays — winner ids equal, t within FMA noise. Also the
     first Mosaic lowering of the DDA kernel (one-hot dots, while_loop).
  2. Kernel-only interleaved A/B at 512x384 (196k rays) on the 10k
     procedural scene: classic _closest_hit vs _closest_hit_dda at
     several grid configs, for bounce-like rays (origins in the volume,
     isotropic dirs) AND camera-like rays (outside origins, coherent).

Usage: python scripts/bench_dda_tpu.py  [SMALLPT_TPU_BENCH_CPU=1 smoke]
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

from smallpt_tpu.core.scene import procedural_sphere_scene
from smallpt_tpu.ops import dda as dda_mod
from smallpt_tpu.ops.dda import build_dda_grid, _closest_hit_dda
from smallpt_tpu.ops.intersect_pallas import (
    _RAY_TILE, build_sphere_table, _closest_hit,
    intersect_spheres_pallas,
)
from smallpt_tpu.ops.dda import intersect_spheres_dda

SMOKE = bool(os.environ.get("SMALLPT_TPU_BENCH_CPU"))


def _fetch(x):
    return float(jnp.sum(x))


def _rays(n, seed, inside=True, coherent=False):
    rng = np.random.default_rng(seed)
    if inside:
        org = rng.uniform([5, 5, 20], [95, 75, 150], (n, 3))
    else:
        org = np.tile(np.asarray([[50.0, 52.0, 295.6]]), (n, 1))
        org += rng.normal(scale=0.5, size=(n, 3))
    if coherent:
        d = np.asarray([0.0, -0.04, -1.0]) + rng.normal(scale=0.2, size=(n, 3))
    else:
        d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (jnp.asarray(org, jnp.float32), jnp.asarray(d, jnp.float32))


def _pack(org, dirs):
    n = org.shape[0]
    n_pad = -(-n // _RAY_TILE) * _RAY_TILE
    org_t = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(org.T)
    dir_t = (jnp.zeros((3, n_pad), jnp.float32).at[0, :].set(1.0)
             .at[:, :n].set(dirs.T))
    return org_t, dir_t


def main():
    interpret = jax.default_backend() != "tpu"
    print(f"backend={jax.default_backend()}", flush=True)

    # ---- stage 0: health probe
    t0 = time.perf_counter()
    _fetch(jnp.arange(1024.0) * 2.0)
    print(f"health probe ok ({time.perf_counter()-t0:.1f}s)", flush=True)

    # ---- stage 1: hardware exactness gate
    scene_s = procedural_sphere_scene(400 if SMOKE else 2100)
    grid_s = build_dda_grid(scene_s, occ_target=16.0)
    org, dirs = _rays(2048 if SMOKE else 4096, seed=7)
    h_ref = intersect_spheres_pallas(org, dirs, scene_s, want_uv=False,
                                     interpret=interpret)
    h_dda = intersect_spheres_dda(org, dirs, scene_s, grid_s,
                                  interpret=interpret, want_uv=False)
    tr, td = np.asarray(h_ref.t), np.asarray(h_dda.t)
    hit_r, hit_d = np.isfinite(tr), np.isfinite(td)
    id_eq = (np.asarray(h_ref.inst)[hit_r & hit_d]
             == np.asarray(h_dda.inst)[hit_r & hit_d])
    rel = np.abs(tr[hit_r & hit_d] - td[hit_r & hit_d]) / np.maximum(
        tr[hit_r & hit_d], 1e-3)
    print(
        f"exactness: hitmiss_eq={float((hit_r == hit_d).mean()):.6f} "
        f"id_eq={float(id_eq.mean()):.6f} max_rel_dt={float(rel.max()):.2e} "
        f"(grid C={grid_s.n_cells} K={grid_s.k} ovf={grid_s.n_overflow})",
        flush=True,
    )
    assert (hit_r == hit_d).all(), "hit/miss mismatch on hardware"
    assert id_eq.all(), "winner id mismatch on hardware"
    assert rel.max() < 1e-5, "t beyond FMA-noise envelope"
    print("stage 1 PASS", flush=True)

    # ---- stage 2: kernel-only interleaved A/B @ 10k spheres
    n_rays = 8 * _RAY_TILE if SMOKE else 192 * _RAY_TILE  # 196,608
    scene = procedural_sphere_scene(500 if SMOKE else 10_000)
    table, perm, nbc, nsc = build_sphere_table(scene)
    configs = [(16.0, 128), (28.0, 128), (48.0, 128)]
    if SMOKE:
        configs = configs[:2]
    grids = {occ: build_dda_grid(scene, occ_target=occ, k_max=km)
             for occ, km in configs}
    for occ, g in grids.items():
        print(f"grid occ={occ}: nb={g.nb} C={g.n_cells} K={g.k} "
              f"ovf={g.n_overflow} tbl_mb="
              f"{g.cells3.size * 4 / 1e6:.1f}", flush=True)

    cases = {}
    for nm, (inside, coh) in (("bounce", (True, False)),
                              ("camera", (False, True))):
        o, d = _rays(n_rays, seed=11, inside=inside, coherent=coh)
        cases[nm] = _pack(o, d)

    def run_classic(ot, dt):
        return _closest_hit(ot, dt, table, nbc, nsc, interpret=interpret)

    def make_dda(g):
        ovf = g.overflow if g.overflow.shape[0] else jnp.zeros(
            (64, 8), jnp.float32)

        def run(ot, dt):
            return _closest_hit_dda(
                ot, dt, g.part_a, ovf, g.cells3, k=g.k, nb=g.nb, lo=g.lo,
                cell=g.cell, eps_local=g.eps_local,
                n_overflow_chunks=g.overflow.shape[0] // 64,
                interpret=interpret,
            )
        return run

    variants = [("classic", run_classic)] + [
        (f"dda_occ{int(occ)}", make_dda(g)) for occ, g in grids.items()
    ]

    # compile all
    for nm, fn in variants:
        for cn, (ot, dt) in cases.items():
            t0 = time.perf_counter()
            _fetch(fn(ot, dt)[0])
            print(f"compile+first {nm}/{cn}: "
                  f"{time.perf_counter()-t0:.0f}s", flush=True)

    reps = 2 if SMOKE else 6
    best = {}
    for w in range(1 if SMOKE else 4):
        for nm, fn in variants:
            for cn, (ot, dt) in cases.items():
                t0 = time.perf_counter()
                r = None
                for _ in range(reps):
                    r = fn(ot, dt)
                _fetch(r[0])
                dt_s = (time.perf_counter() - t0) / reps
                k = f"{nm}/{cn}"
                best[k] = min(best.get(k, 9e9), dt_s)
    print(flush=True)
    for k, v in best.items():
        print(f"{k:22s} {v*1e3:8.2f} ms/launch "
              f"({n_rays/v/1e6:6.2f} Mrays/s)", flush=True)
    base = {cn: best[f"classic/{cn}"] for cn in cases}
    for k, v in best.items():
        if not k.startswith("classic"):
            cn = k.split("/")[1]
            print(f"{k}: {base[cn]/v:.2f}x classic ({cn})", flush=True)


if __name__ == "__main__":
    main()
