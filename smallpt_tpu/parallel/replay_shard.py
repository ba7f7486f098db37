"""Sharded recorded-winner-replay training step — config 4 at config-5
scale.

The single-chip replay differentiator (grad/replay.py) composed with the
(tile, sample) mesh of parallel/shard.py:

- RECORD: each shard runs the fused megakernel recorder on its row band x
  in-pixel-sample slice (render_record_megakernel's ip_offset/row_offset
  hooks — exactly render_pass_megakernel's sharding surface), psums the
  partial radiance over the sample axis, and keeps its winner planes
  LOCAL (a (max_depth, h_loc, spp_loc*W) grid aligned with
  parallel/shard.py::_sample_grids' layout — winners never cross the
  interconnect; only the (H, W, 3) image does).
- REPLAY: gradients come from jax.grad of a sharded replay loss — each
  shard replays its own recorded winners through the search-free scan
  (grad/replay.py::replay_samples); scene parameters ride in replicated
  (in_spec P()), so shard_map's transpose rule turns the backward pass
  into an automatic gradient all-reduce, the same collective story as
  render_sharded's scan path.

Global sample keying makes the estimator placement-invariant: the
recorded winner of (pixel, sample s, depth d) is the same number whichever
shard records it."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from smallpt_tpu.config import RenderConfig
from smallpt_tpu.core import camera as cam
from smallpt_tpu.core import rng as prng
from smallpt_tpu.grad.diff import merge_scene, split_scene
from smallpt_tpu.grad.replay import replay_samples, use_replay
from smallpt_tpu.parallel.shard import _sample_grids


def _shard_shape(config: RenderConfig, sid):
    h_loc, cols_loc = sid.shape
    W = config.width
    return h_loc, W, cols_loc // W


@functools.partial(jax.jit, static_argnames=("config", "mesh"))
def image_loss_and_grads_sharded(
    scene, camera, config: RenderConfig, key, target, mesh: Mesh
):
    """Sharded L2 loss + SceneParams grads via recorded-winner replay.

    Same contract as grad/diff.py::image_loss_and_grads, over a
    (tile, sample) mesh. Requires a replay-eligible config on a scene
    inside the megakernel's capacity (the fused recorder has no sharded
    fallback — everything else routes through render_sharded's scan
    differentiator)."""
    from smallpt_tpu.ops.megakernel import (MEGA_MAX_SPHERES,
                                            render_record_megakernel)

    if not use_replay(scene, config):
        raise ValueError(
            "config is not replay-eligible (see grad/replay.py::use_replay)"
            " — use render_sharded(differentiable=True) for the scan path"
        )
    if scene.n_spheres > MEGA_MAX_SPHERES:
        raise ValueError(
            f"sharded replay records through the fused megakernel "
            f"(<= {MEGA_MAX_SPHERES} spheres)"
        )
    n_tile = mesh.shape["tile"]
    n_sample = mesh.shape["sample"]
    if config.height % n_tile:
        raise ValueError(
            f"height {config.height} not divisible by tile axis {n_tile}"
        )
    if config.spp % n_sample:
        raise ValueError(
            f"spp {config.spp} not divisible by sample axis {n_sample}"
        )

    sid, col, row, cx, cy = _sample_grids(config)
    params, refl = split_scene(scene)
    sg_scene = jax.lax.stop_gradient(scene)
    D = config.max_depth
    dtype = jnp.dtype(config.dtype)

    grid_spec = P("tile", "sample")

    # ---- record pass: fused kernel per shard, winner planes stay local --
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), grid_spec, grid_spec),
        out_specs=(P("tile", None, None), P(None, "tile", "sample"), P()),
        check_vma=False,  # megakernel while_loop carry mixes device-varying
                          # lanes with replicated init values
    )
    def shard_record(scene, camera, key, sid, row):
        h_loc, W, spp_loc = _shard_shape(config, sid)
        img_part, winners, rays = render_record_megakernel(
            scene, camera, config, key,
            ip_offset=jax.lax.axis_index("sample").astype(jnp.int32)
            * spp_loc,
            row_offset=row[0, 0],
            n_rows=h_loc,
            k_samples=spp_loc,
        )
        # FLAT (lane = local_pixel * spp_loc + s) -> the _sample_grids
        # layout (rows x (sample-major x column)) so the winner grid's
        # sharding matches sid's
        wgrid = (
            winners.reshape(D, h_loc, W, spp_loc)
            .transpose(0, 1, 3, 2)
            .reshape(D, h_loc, spp_loc * W)
        )
        img = jax.lax.psum(img_part, axis_name="sample")
        rays = jax.lax.psum(rays, axis_name=("tile", "sample"))
        return img, wgrid, rays

    img_sum, wgrid, rays = shard_record(sg_scene, camera, key, sid, row)
    img = img_sum / config.spp
    loss = jnp.mean((img - target) ** 2)

    # ---- replay pass: differentiable, sharded, winners as constants -----
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(None, "tile", "sample"), grid_spec,
                  grid_spec, grid_spec, grid_spec, grid_spec),
        out_specs=P("tile", None, None),
        check_vma=False,
    )
    def shard_replay(scene, camera, key, wgrid, sid, col, row, cx, cy):
        h_loc, W, spp_loc = _shard_shape(config, sid)
        flat = lambda a: a.reshape(-1)
        sid_f = flat(sid)
        u_cam = prng.camera_uniforms(key, sid_f, dtype)
        u_lens = (
            prng.lens_uniforms(key, sid_f, dtype)
            if config.aperture > 0.0 else None
        )
        org, dirs = cam.generate_rays(
            camera, u_cam, config, flat(col), flat(row), flat(cx),
            flat(cy), u_lens=u_lens,
        )
        rad = replay_samples(
            scene, config, key, sid_f, org, dirs,
            wgrid.reshape(D, -1),
        )
        part = rad.reshape(h_loc, spp_loc, W, 3).sum(axis=1)
        return jax.lax.psum(part, axis_name="sample")

    def replay_loss(p):
        rimg = shard_replay(
            merge_scene(p, refl), camera, key, wgrid, sid, col, row, cx, cy
        ) / config.spp
        return jnp.mean((rimg - target) ** 2)

    grads = jax.grad(replay_loss)(params)
    return loss, img, grads
