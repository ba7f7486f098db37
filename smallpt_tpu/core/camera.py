"""Cameras and primary-ray generation.

Two camera models, matching the reference's two renderer generations:

- ``LegacyCamera``: smallpt's frame camera — position (50,52,295.6), direction
  normalize(0,-0.042612,-1), cx = (w*0.5135/h,0,0), cy = normalize(cx x d) *
  0.5135, with ray origins pushed 140 units forward (smallpt.cpp:277-279,333).
- ``MatrixCamera``: the current engine's 4x4 localToWorld camera
  (smallpt.cpp:607-624) whose ray direction is M * (clipX, clipY, near, 0)
  (smallpt.cpp:626-641).

Ray generation is pure JAX over a flat sample batch; all pixel/cell/sample
index math mirrors SampleIndex (smallpt.cpp:72-104) and foreachSampleInRow
(smallpt.cpp:706-726) but is computed, not stored.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from smallpt_tpu.config import RenderConfig, Filter, CameraModel


class LegacyCamera(NamedTuple):
    origin: jnp.ndarray  # (3,)
    direction: jnp.ndarray  # (3,) normalized
    fov_scale: jnp.ndarray  # scalar, smallpt's 0.5135
    push_forward: jnp.ndarray  # scalar, smallpt's 140


class MatrixCamera(NamedTuple):
    local_to_world: jnp.ndarray  # (4, 4)
    near_plane: jnp.ndarray  # scalar


def smallpt_camera(dtype=jnp.float32) -> LegacyCamera:
    """The hardcoded cpuRender camera (smallpt.cpp:277)."""
    d = jnp.asarray([0.0, -0.042612, -1.0], dtype=dtype)
    d = d / jnp.linalg.norm(d)
    return LegacyCamera(
        origin=jnp.asarray([50.0, 52.0, 295.6], dtype=dtype),
        direction=d,
        fov_scale=jnp.asarray(0.5135, dtype=dtype),
        push_forward=jnp.asarray(140.0, dtype=dtype),
    )


def matrix_camera_from_frame(vx, vy, vz, org, near_plane=1.0, dtype=jnp.float32):
    """Build a MatrixCamera from an orthonormal frame + origin, matching the
    Camera ctor's column layout (smallpt.cpp:609-617)."""
    m = jnp.zeros((4, 4), dtype=dtype)
    m = m.at[:3, 0].set(jnp.asarray(vx, dtype=dtype))
    m = m.at[:3, 1].set(jnp.asarray(vy, dtype=dtype))
    m = m.at[:3, 2].set(jnp.asarray(vz, dtype=dtype))
    m = m.at[:3, 3].set(jnp.asarray(org, dtype=dtype))
    m = m.at[3, 3].set(1.0)
    return MatrixCamera(local_to_world=m, near_plane=jnp.asarray(near_plane, dtype))


def default_matrix_camera(dtype=jnp.float32) -> MatrixCamera:
    """The interactive app's camera: vx=(1,0,0), vz=(0,0,-1),
    vy = normalize(vx x vz), org=(0,-1,0), near=1 (smallpt.cpp:885-899)."""
    vx = np.array([1.0, 0.0, 0.0])
    vz = np.array([0.0, 0.0, -1.0])
    vy = np.cross(vx, vz)
    vy = vy / np.linalg.norm(vy)
    return matrix_camera_from_frame(vx, vy, vz, (0.0, -1.0, 0.0), 1.0, dtype)


def sample_indices(config: RenderConfig, n_pixels: int):
    """Decompose flat sample ids into (pixel, col, row, cell_x, cell_y, s).

    Sample layout matches indexInImage = pixelIdx * sppPerPixel +
    (groupIdx * sppPerCell + s) with groupIdx = sy*jitter+sx
    (smallpt.cpp:715-719).
    """
    spp = config.spp
    sample_id = jnp.arange(n_pixels * spp, dtype=jnp.int32)
    pixel = sample_id // spp
    in_pixel = sample_id % spp
    group = in_pixel // config.spp_per_cell
    cell_x = group % config.jitter_size
    cell_y = group // config.jitter_size
    col = pixel % config.width
    row = pixel // config.width
    return sample_id, pixel, col, row, cell_x, cell_y


def filter_offsets(u: jnp.ndarray, config: RenderConfig, cell_x, cell_y):
    """Map per-sample uniforms u (N,2) to sub-pixel offsets in pixel space,
    centered on 0.

    BOX (smallpt.cpp:745-758): jitter the uniform into the sample's cell, then
    0.5*(2r-1) over the whole pixel -> stratified offsets in [-0.5, 0.5].
    TENT (smallpt.cpp:327-333): smallpt's tent filter per cell; the cell
    center term (sx+0.5+dx)/jitter is handled here so the offset is relative
    to the pixel center.
    """
    js = config.jitter_size
    if config.filter == Filter.BOX:
        jittered = (jnp.stack([cell_x, cell_y], -1).astype(u.dtype) + u) / js
        return 0.5 * (2.0 * jittered - 1.0)
    elif config.filter == Filter.TENT:
        r = 2.0 * u
        d = jnp.where(r < 1.0, jnp.sqrt(r) - 1.0, 1.0 - jnp.sqrt(jnp.maximum(2.0 - r, 0.0)))
        cell = jnp.stack([cell_x, cell_y], -1).astype(u.dtype)
        # (cell + 0.5 + d)/js in [~-0.5/js, ~1.5/js] spans the pixel with tent
        # tails into neighbors; recenter by -0.5 to be pixel-center relative.
        return (cell + 0.5 + d) / js - 0.5
    raise ValueError(config.filter)


def _thin_lens(org, dirs, right, up, config: RenderConfig, u_lens):
    """Thin-lens depth of field: jitter the origin on the aperture disk and
    re-aim at the along-ray focus point (pinhole when aperture == 0)."""
    r = config.aperture * jnp.sqrt(u_lens[:, 0])
    theta = 2.0 * jnp.pi * u_lens[:, 1]
    lx = (r * jnp.cos(theta))[:, None]
    ly = (r * jnp.sin(theta))[:, None]
    focus = org + dirs * config.focal_distance
    org2 = org + right[None, :] * lx + up[None, :] * ly
    d2 = focus - org2
    return org2, d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)


def generate_rays(camera, u: jnp.ndarray, config: RenderConfig, col, row, cell_x, cell_y,
                  u_lens=None):
    """Primary rays for a flat sample batch.

    u: (N,2) uniforms; u_lens: (N,2) aperture uniforms (required when
    config.aperture > 0). Returns (origins (N,3), dirs (N,3) normalized).
    """
    offset = filter_offsets(u, config, cell_x, cell_y)
    if config.camera_model == CameraModel.LEGACY:
        if not isinstance(camera, LegacyCamera):
            raise TypeError("LEGACY camera_model needs a LegacyCamera")
        w, h = config.width, config.height
        # smallpt: d = cx*(((sx+.5+dx)/2 + x)/w - .5) + cy*(...) + cam.d
        # (smallpt.cpp:331-332); offset already holds (sx+.5+dx)/2 - 0.5.
        sx = (col.astype(u.dtype) + 0.5 + offset[:, 0]) / w - 0.5
        sy = (row.astype(u.dtype) + 0.5 + offset[:, 1]) / h - 0.5
        cx = jnp.stack(
            [jnp.asarray(w * camera.fov_scale / h, u.dtype), jnp.zeros((), u.dtype), jnp.zeros((), u.dtype)]
        )
        cy_raw = jnp.cross(cx, camera.direction)
        cy = cy_raw / jnp.linalg.norm(cy_raw) * camera.fov_scale
        d = sx[:, None] * cx[None, :] + sy[:, None] * cy[None, :] + camera.direction[None, :]
        org = camera.origin[None, :] + d * camera.push_forward
        dirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        if config.aperture > 0.0:
            right = cx / jnp.linalg.norm(cx)
            up = cy / jnp.linalg.norm(cy)
            return _thin_lens(org, dirs, right, up, config, u_lens)
        return org, dirs
    elif config.camera_model == CameraModel.MATRIX:
        if not isinstance(camera, MatrixCamera):
            raise TypeError("MATRIX camera_model needs a MatrixCamera")
        # raster -> normalized -> clip space (smallpt.cpp:628-633)
        raster = jnp.stack(
            [col.astype(u.dtype) + 0.5 + offset[:, 0], row.astype(u.dtype) + 0.5 + offset[:, 1]], -1
        )
        pixel_size = jnp.asarray([1.0 / config.width, 1.0 / config.height], u.dtype)
        clip = 2.0 * raster * pixel_size[None, :] - 1.0
        local = jnp.concatenate(
            [
                clip,
                jnp.full((clip.shape[0], 1), camera.near_plane, u.dtype),
                jnp.zeros((clip.shape[0], 1), u.dtype),
            ],
            axis=-1,
        )
        d4 = local @ camera.local_to_world.T  # (N,4): M @ v per sample
        d = d4[:, :3]
        dirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        org = jnp.broadcast_to(camera.local_to_world[:3, 3][None, :], dirs.shape)
        if config.aperture > 0.0:
            m = camera.local_to_world
            right = m[:3, 0] / jnp.linalg.norm(m[:3, 0])
            up = m[:3, 1] / jnp.linalg.norm(m[:3, 1])
            return _thin_lens(org, dirs, right, up, config, u_lens)
        return org, dirs
    raise ValueError(config.camera_model)
