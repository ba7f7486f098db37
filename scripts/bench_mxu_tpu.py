"""A/B: classic VPU split-sweep vs MXU-assisted intersect kernel on TPU.

The round-3 verdict pinned the 10k-sphere scene at the brute VPU roofline
(~3.5 Mrays/s for ~27 elem-ops/pair at the measured 0.96 T f32 elem-ops/s).
The MXU sweep (ops/intersect_pallas.py::_intersect_kernel_mxu) moves ~14 of
those ops onto the otherwise-idle MXU as a K=8 matmul per 64-sphere chunk;
whether that wins depends on small-K matmul economics on this chip (v5e) —
this script measures it, interleaved in one process per CLAUDE.md.

Usage: python scripts/bench_mxu_tpu.py [--n 10000] [--rays 196608]
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

from smallpt_tpu.core.scene import procedural_sphere_scene
from smallpt_tpu.ops import intersect_pallas as ip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--rays", type=int, default=512 * 384)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--windows", type=int, default=5)
    args = ap.parse_args()

    interpret = jax.default_backend() != "tpu"
    print(f"backend={jax.default_backend()} devices={jax.devices()}")

    scene = procedural_sphere_scene(args.n)
    rng = np.random.default_rng(0)
    org = jnp.asarray(rng.uniform([5, 5, 20], [95, 75, 150],
                                  (args.rays, 3)), jnp.float32)
    d = rng.normal(size=(args.rays, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs = jnp.asarray(d, jnp.float32)

    # pre-built tables + pre-transposed rays: time the KERNEL, not the prep
    table, perm, nbc, nsc = ip.build_sphere_table(scene)
    (stbl, mtbl, perm_m, nbc_m, nsc_m, eps_small, shift) = (
        ip.build_sphere_table_mxu(scene))
    n = args.rays
    n_pad = -(-n // ip._RAY_TILE) * ip._RAY_TILE
    org_t = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(org.T)
    org_tc = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(
        (org - shift[None, :]).T)
    dir_t = (jnp.zeros((3, n_pad), jnp.float32).at[0, :].set(1.0)
             .at[:, :n].set(dirs.T))

    P = jax.lax.Precision

    def run_classic():
        t, i = ip._closest_hit(org_t, dir_t, table, nbc, nsc,
                               interpret=interpret)
        return t, i

    def run_mxu(prec):
        t, i = ip._closest_hit_mxu(org_tc, dir_t, stbl, mtbl, nbc_m, nsc_m,
                                   eps_small, precision=prec,
                                   interpret=interpret)
        return t, i

    # Mosaic's dot lowering supports only DEFAULT and HIGHEST (HIGH raises
    # NotImplementedError); DEFAULT (1-pass bf16) has unusable det numerics
    # but bounds the matmul-side speed ceiling
    variants = [
        ("classic", run_classic),
        ("mxu_highest", lambda: run_mxu(P.HIGHEST)),
        ("mxu_default", lambda: run_mxu(P.DEFAULT)),
    ]

    # compile + warm (also ramps the chip clock)
    for name, fn in variants:
        t0 = time.perf_counter()
        t, i = fn()
        s = float(jnp.sum(t * 0 + 1.0))  # force fetch
        print(f"compile {name}: {time.perf_counter() - t0:.1f}s")

    # sanity: ids must agree (statistically) across variants
    t_c, i_c = run_classic()
    ic = np.asarray(jnp.take(perm, jnp.minimum(i_c[:n], perm.shape[0] - 1)))
    for name, fn in variants[1:]:
        t_m, i_m = fn()
        im = np.asarray(jnp.take(perm_m,
                                 jnp.minimum(i_m[:n], perm_m.shape[0] - 1)))
        flips = (ic != im).mean()
        print(f"id-flips {name} vs classic: {flips:.5f}")

    # interleaved best-of-N windows
    best = {name: float("inf") for name, _ in variants}
    for w in range(args.windows):
        for name, fn in variants:
            t0 = time.perf_counter()
            r = None
            for _ in range(args.iters):
                r = fn()
            float(jnp.sum(r[0]))  # fetch closes the window
            dt = (time.perf_counter() - t0) / args.iters
            best[name] = min(best[name], dt)
    print()
    base = best["classic"]
    for name, _ in variants:
        mrays = args.rays / best[name] / 1e6
        print(f"{name:14s} {best[name]*1e3:8.2f} ms/launch  "
              f"{mrays:7.2f} Mrays/s  x{base/best[name]:.2f} vs classic")


if __name__ == "__main__":
    main()
