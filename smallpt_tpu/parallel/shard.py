"""Multi-chip sharding of the render: SPMD over a (tile, sample) device mesh.

The reference's parallelism taxonomy (SURVEY.md §2.3) maps to TPU axes:

- image-row data parallelism (shn::syncParallelLoop over rows,
  smallpt.cpp:736,784) -> the ``tile`` mesh axis: row bands of the image
- per-ray parallelism (OptiX ray packing, smallpt.cpp:560-568) -> the vmapped
  lane axis inside each shard (XLA vectorization)
- huge-spp scaling (the progressive outer loop, smallpt.cpp:901-941) -> the
  ``sample`` mesh axis: each shard renders a disjoint subset of every pixel's
  samples, reduced with an ICI psum (SURVEY.md §5.7's "long-context" analog)

Scene and camera parameters are replicated (in_spec P()); shard_map's
transpose rule turns that into an automatic gradient all-reduce in the
backward pass — the multi-host gradient story of BASELINE.json config 5 with
no hand-written collectives.

Sample keying is global (core/rng.py), so the sharded render is placement-
invariant up to XLA's per-shape f32 codegen (different program shapes may
differ by ulps, which flips the rare razor-edge path on smallpt's tangent
geometry) — tested statistically in tests/test_sharding.py.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from smallpt_tpu.config import RenderConfig
from smallpt_tpu.engine.renderer import (
    render_samples,
    render_pixels,
    _render_mesh_accel,
    _mesh_nee_for,
    _use_mega,
    _use_regen,
)


def make_mesh(
    n_tile: int | None = None,
    n_sample: int = 1,
    devices: Sequence | None = None,
) -> Mesh:
    """Build a (tile, sample) mesh. Defaults to all devices on the tile axis
    (the reference's row-parallel layout)."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    if n_tile is None:
        n_tile = devs.size // n_sample
    if n_tile * n_sample != devs.size:
        raise ValueError(
            f"mesh {n_tile}x{n_sample} != {devs.size} devices"
        )
    return Mesh(devs.reshape(n_tile, n_sample), ("tile", "sample"))


def _sample_grids(config: RenderConfig):
    """Per-sample index arrays laid out (H, spp*W): rows are image rows
    (tile axis), columns are in-pixel-sample-major x image-column
    (sample axis) — so sharding axis 1 gives each shard whole sample
    indices of every pixel in its rows."""
    H, W, spp = config.height, config.width, config.spp
    row = jnp.repeat(jnp.arange(H, dtype=jnp.int32)[:, None], spp * W, axis=1)
    ip = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), W)[None, :].repeat(H, axis=0)
    col = jnp.tile(jnp.arange(W, dtype=jnp.int32), spp)[None, :].repeat(H, axis=0)
    pixel = row * W + col
    sid = pixel * spp + ip
    group = ip // config.spp_per_cell
    cx = group % config.jitter_size
    cy = group // config.jitter_size
    return sid, col, row, cx, cy


def render_sharded(
    scene,
    camera,
    config: RenderConfig,
    key: jax.Array,
    mesh: Mesh,
    differentiable: bool = False,
) -> jnp.ndarray:
    """One full-frame pass sharded over the mesh. Returns the (H, W, 3)
    summed-radiance image (fully replicated on exit, like the reference's
    single accumBuffer).

    Eager wrapper: the mesh accel and NEE triangle-light tables MUST be
    built outside the jit (their construction is dynamic-shape); the old
    single jitted function saw tracers here, so the sharded mesh path
    silently brute-swept and mesh NEE could not run at all."""
    maccel = _render_mesh_accel(scene, config)
    mnee = _mesh_nee_for(scene, config)
    return _render_sharded_jit(
        scene, camera, config, key, mesh, differentiable, maccel, mnee
    )


@functools.partial(
    jax.jit, static_argnames=("config", "mesh", "differentiable")
)
def _render_sharded_jit(
    scene,
    camera,
    config: RenderConfig,
    key: jax.Array,
    mesh: Mesh,
    differentiable: bool,
    maccel,
    mnee,
) -> jnp.ndarray:
    n_tile = mesh.shape["tile"]
    n_sample = mesh.shape["sample"]
    if config.height % n_tile:
        raise ValueError(f"height {config.height} not divisible by tile axis {n_tile}")
    if config.spp % n_sample:
        raise ValueError(f"spp {config.spp} not divisible by sample axis {n_sample}")

    sid, col, row, cx, cy = _sample_grids(config)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("tile", "sample"), P("tile", "sample"),
                  P("tile", "sample"), P("tile", "sample"),
                  P("tile", "sample"), P(), P()),
        out_specs=P("tile", None, None),
        # the wavefront while_loop carry mixes device-varying lanes with
        # replicated-constant init values; skip the static vma check
        check_vma=False,
    )
    def shard_render(scene, camera, key, sid, col, row, cx, cy, maccel,
                     mnee):
        h_loc, cols_loc = sid.shape
        W = config.width
        spp_loc = cols_loc // W
        if _use_mega(scene, config, differentiable):
            from smallpt_tpu.ops.megakernel import render_pass_megakernel

            part, _ = render_pass_megakernel(
                scene, camera, config, key,
                ip_offset=jax.lax.axis_index("sample").astype(jnp.int32)
                * spp_loc,
                row_offset=row[0, 0],
                n_rows=h_loc,
                k_samples=spp_loc,
            )
        elif _use_regen(config, differentiable):
            # one lane per local pixel, consuming this shard's spp_loc
            # in-pixel sample slots sequentially
            pix_col = col[:, :W].reshape(-1)
            pix_row = row[:, :W].reshape(-1)
            pixel = pix_row * W + pix_col
            ip_offset = jax.lax.axis_index("sample").astype(jnp.int32) * spp_loc
            rad, _ = render_pixels(
                scene, camera, config, key, pixel, pix_col, pix_row,
                ip_offset, spp_loc, mesh_accel=maccel, mesh_nee=mnee,
            )
            part = rad.reshape(h_loc, W, 3)
        else:
            flat = lambda a: a.reshape(-1)
            rad = render_samples(
                scene, camera, config, key,
                flat(sid), flat(col), flat(row), flat(cx), flat(cy),
                differentiable=differentiable, mesh_accel=maccel,
                mesh_nee=mnee,
            )
            # local layout (h_loc, spp_loc, W, 3) -> partial image
            part = rad.reshape(h_loc, spp_loc, W, 3).sum(axis=1)
        # reduce partial sample sums across the sample axis (ICI psum)
        return jax.lax.psum(part, axis_name="sample")

    img = shard_render(scene, camera, key, sid, col, row, cx, cy, maccel,
                       mnee)
    return img


def render_image_sharded(
    scene, camera, config: RenderConfig, mesh: Mesh, seed: int = 0, n_passes: int = 1
) -> jnp.ndarray:
    """Progressive mean image over n_passes, sharded (render_image analog)."""
    from smallpt_tpu.core import rng as prng

    base = prng.base_key(seed)
    acc = jnp.zeros((config.height, config.width, 3), jnp.dtype(config.dtype))
    for p in range(n_passes):
        acc = acc + render_sharded(
            scene, camera, config, jax.random.fold_in(base, p), mesh
        )
    return acc / (n_passes * config.spp)
