"""MXU cost-model microbench: what does a small-K dot cost inside a Mosaic
kernel loop, and does it overlap with VPU work?

Decides the MXU-sweep design (ops/intersect_pallas.py::_intersect_kernel_mxu):
the first TPU A/B measured VPU-residue ~14 ms, per-DEFAULT-pass ~4.3 ms and
STRICTLY ADDITIVE costs (no overlap in the naive loop) on the 10k-sphere
sweep shape. Questions:
  1. K-scaling: does a (128, K) @ (K, 1024) DEFAULT dot cost ~K or ~128?
     (If padded to K=128, the hi/lo split-bf16 trick — two K=16 dots ==
     bf16x3 accuracy — costs the same as the single K=8 dot.)
  2. bf16 inputs vs f32 inputs at DEFAULT.
  3. Software pipelining: dot for chunk c+1 issued before chunk c's VPU
     consumption — does wall time drop toward max(VPU, MXU)?

Usage: python scripts/bench_mxu_microbench.py
"""

from __future__ import annotations

import functools
import os
import time

import jax

if os.environ.get("SMALLPT_TPU_BENCH_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_smallpt_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 1024          # lanes per tile (rays)
ROWS = 128        # output rows per chunk (2 coefficient blocks x 64)
N_CHUNKS = 157    # 10k spheres / 64
GRID = 24         # ray tiles per launch (196k rays)
VPU_OPS = 16      # representative per-chunk VPU chain length (elem-ops/pair)
if os.environ.get("SMALLPT_TPU_BENCH_CPU"):
    N_CHUNKS, GRID = 5, 2  # interpreter smoke: shapes only, not timings


def _k(x):
    return float(jnp.sum(x))


def make_dot_kernel(K, in_dtype, vpu_ops, pipelined):
    def kernel(tbl_ref, feats_ref, out_ref):
        feats = feats_ref[...]  # (K, R)

        def dot(c):
            blk = tbl_ref[pl.ds((c % N_CHUNKS) * ROWS, ROWS), :]
            return jax.lax.dot_general(
                blk, feats, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )

        def consume(p, acc):
            # representative VPU chain on the dot result
            x = p[0:64, :] - p[64:128, :]
            for _ in range(max(vpu_ops - 4, 0) // 2):
                x = x * x + p[0:64, :]
            m = jnp.min(x, axis=0, keepdims=True)
            return jnp.minimum(acc, m)

        init = jnp.full((1, R), 3e38, jnp.float32)
        if pipelined:
            def body(c, carry):
                acc, p_cur = carry
                p_next = dot(c + 1)
                return consume(p_cur, acc), p_next
            acc, p_last = jax.lax.fori_loop(
                0, N_CHUNKS - 1, body, (init, dot(0)))
            acc = consume(p_last, acc)
        else:
            def body(c, acc):
                return consume(dot(c), acc)
            acc = jax.lax.fori_loop(0, N_CHUNKS, body, init)
        out_ref[...] = acc

    @functools.partial(jax.jit, static_argnames=("interpret",))
    def run(tbl, feats, interpret=False):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[
                pl.BlockSpec((N_CHUNKS * ROWS, K), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, R), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, R), lambda g: (0, g),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, GRID * R), jnp.float32),
            interpret=interpret,
        )(tbl, feats)

    return run


def make_vpu_only_kernel(vpu_ops):
    """Same loop shape, no dot: the VPU-side floor."""
    def kernel(tbl_ref, feats_ref, out_ref):
        base = feats_ref[0:64, :]

        def body(c, acc):
            p = tbl_ref[pl.ds((c % N_CHUNKS) * ROWS, 64), :][:, 0:1] + base
            x = p - base
            for _ in range(max(vpu_ops - 4, 0) // 2):
                x = x * x + p
            m = jnp.min(x, axis=0, keepdims=True)
            return jnp.minimum(acc, m)

        out_ref[...] = jax.lax.fori_loop(
            0, N_CHUNKS, body, jnp.full((1, R), 3e38, jnp.float32))

    @functools.partial(jax.jit, static_argnames=("interpret",))
    def run(tbl, feats, interpret=False):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[
                pl.BlockSpec((N_CHUNKS * ROWS, 8), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((64, R), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, R), lambda g: (0, g),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, GRID * R), jnp.float32),
            interpret=interpret,
        )(tbl, feats)

    return run


def main():
    interpret = jax.default_backend() != "tpu"
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    variants = []
    for K in (8, 16, 32, 64, 128):
        for dt in (jnp.float32, jnp.bfloat16):
            for pipe in (False, True):
                if K not in (8, 16) and (dt != jnp.float32 or pipe):
                    continue  # K-scaling probed on f32/seq only
                variants.append((f"K{K}_{jnp.dtype(dt).name}"
                                 f"{'_pipe' if pipe else ''}",
                                 make_dot_kernel(K, dt, VPU_OPS, pipe), K, dt))
    vpu_only = make_vpu_only_kernel(VPU_OPS)

    args_cache = {}

    def args_for(K, dt):
        if (K, dt) not in args_cache:
            tbl = jnp.asarray(
                rng.normal(size=(N_CHUNKS * ROWS, K)), dt)
            feats = jnp.asarray(rng.normal(size=(K, R)), dt)
            args_cache[(K, dt)] = (tbl, feats)
        return args_cache[(K, dt)]

    tbl8, feats8 = args_for(8, jnp.float32)
    t0 = time.perf_counter()
    _k(vpu_only(tbl8, jnp.tile(feats8, (8, 1)), interpret=interpret))
    print(f"compile vpu_only {time.perf_counter()-t0:.0f}s", flush=True)
    for name, fn, K, dt in variants:
        t0 = time.perf_counter()
        _k(fn(*args_for(K, dt), interpret=interpret))
        print(f"compile {name} {time.perf_counter()-t0:.0f}s", flush=True)

    best = {}
    for w in range(4):
        rows = [("vpu_only",
                 lambda: vpu_only(tbl8, jnp.tile(feats8, (8, 1)),
                                  interpret=interpret))]
        rows += [(name, (lambda fn=fn, K=K, dt=dt: fn(
            *args_for(K, dt), interpret=interpret)))
            for name, fn, K, dt in variants]
        for name, call in rows:
            t0 = time.perf_counter()
            r = None
            for _ in range(6):
                r = call()
            _k(r)
            dt_s = (time.perf_counter() - t0) / 6
            best[name] = min(best.get(name, 9e9), dt_s)
    print(flush=True)
    for name, v in best.items():
        print(f"{name:22s} {v*1e3:7.2f} ms/launch", flush=True)


if __name__ == "__main__":
    main()
