"""Pallas TPU closest-hit intersect kernel — the OptiX Prime analog.

The reference offloads ray queries to a native GPU library
(OptixIntersector::traceRays, smallpt.cpp:553-583: pack rays -> rtpQueryExecute
closest-hit -> unpack). The TPU-native equivalent is this Mosaic kernel: each
grid step owns a tile of rays (lane dimension, 128-wide vregs) and sweeps the
sphere table in sublane chunks of 8, carrying the running closest (t, id) in
vector registers — the (rays x spheres) candidate matrix never exists in HBM,
unlike the pure-JAX path (ops/intersect.py) where XLA materializes chunked
intermediates.

Layout choices (see pallas_guide.md tiling rules):
- rays live in the LANE dimension: every vreg row is 128 rays, so occupancy
  is 100% regardless of scene size (spheres-in-lanes would waste 93% of the
  vreg on the 9-sphere Cornell box);
- spheres live in the SUBLANE dimension, walked 8 at a time: the sphere
  table is tiny (4 floats/sphere) and stays in VMEM for the whole sweep;
- the quadratic uses the cancellation-stable citardauq form of
  ops/intersect.py::sphere_hit_t (Sphere::intersectAnalytic math,
  scene.cpp:129-140) so f32 survives smallpt's 1e5-radius wall spheres.

Hit completion (position, normal) happens outside in plain JAX from (t, inst)
— XLA fuses it into the consumer, and it keeps the kernel free of gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smallpt_tpu.core.math import safe_normalize
from smallpt_tpu.core.scene import SphereScene
from smallpt_tpu.ops.intersect import Hit

# Rays per grid step (lane-dim width of the tile). 8 lane-tiles of 128.
_RAY_TILE = 1024
# Spheres per sublane chunk (f32 sublane tile height).
_S_CHUNK = 8
_BIG = 3.0e38  # finite inf stand-in inside the kernel (avoids inf-inf NaNs)


def _intersect_kernel(org_ref, dir_ref, tbl_ref, t_ref, i_ref, *, n_chunks):
    """One ray tile vs the whole sphere table.

    org_ref/dir_ref: (3, R) ray components; tbl_ref: (S_pad, 8) columns
    [cx, cy, cz, r, eps, 0, 0, 0]; outputs (1, R) best t and sphere id.
    """
    ox = org_ref[0:1, :]  # (1, R)
    oy = org_ref[1:2, :]
    oz = org_ref[2:3, :]
    dx = dir_ref[0:1, :]
    dy = dir_ref[1:2, :]
    dz = dir_ref[2:3, :]

    def body(c, carry):
        best_t, best_i = carry
        tbl = tbl_ref[pl.ds(c * _S_CHUNK, _S_CHUNK), :]  # (8, 8)
        cx = tbl[:, 0:1]  # (8, 1) broadcasts against (1, R)
        cy = tbl[:, 1:2]
        cz = tbl[:, 2:3]
        r = tbl[:, 3:4]
        eps = tbl[:, 4:5]

        opx = cx - ox  # (8, R)
        opy = cy - oy
        opz = cz - oz
        b = opx * dx + opy * dy + opz * dz
        # perpendicular component: fp = op - (op.d) d
        fx = opx - b * dx
        fy = opy - b * dy
        fz = opz - b * dz
        pp = fx * fx + fy * fy + fz * fz
        sp = jnp.sqrt(pp)
        det = (r - sp) * (r + sp)  # r^2 - pp without cancellation
        valid = det >= 0.0
        s = jnp.sqrt(jnp.maximum(det, 0.0))
        opn = jnp.sqrt(b * b + pp)  # |op| via exact identity
        cc = (opn - r) * (opn + r)  # |op|^2 - r^2, stably
        denom = b + s
        # citardauq near root; denom <= 0 means both roots behind/absent
        t_near = jnp.where(denom > 0.0, cc / jnp.where(denom == 0.0, 1.0, denom), -_BIG)
        t_far = denom
        t = jnp.where(t_near > eps, t_near, jnp.where(t_far > eps, t_far, _BIG))
        t = jnp.where(valid & (r > 0.0), t, _BIG)  # r==0 rows are padding

        tmin = jnp.min(t, axis=0, keepdims=True)  # (1, R)
        srow = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        idx = jnp.min(
            jnp.where(t <= tmin, srow, jnp.int32(0x7FFFFFFF)), axis=0, keepdims=True
        ) + c * _S_CHUNK
        better = tmin < best_t
        return (
            jnp.where(better, tmin, best_t),
            jnp.where(better, idx, best_i),
        )

    init = (
        jnp.full((1, _RAY_TILE), _BIG, jnp.float32),
        jnp.zeros((1, _RAY_TILE), jnp.int32),
    )
    best_t, best_i = jax.lax.fori_loop(0, n_chunks, body, init)
    t_ref[:, :] = best_t
    i_ref[:, :] = best_i


@functools.partial(
    jax.jit, static_argnames=("n_spheres", "interpret")
)
def _closest_hit(org_t, dir_t, table, n_spheres: int, interpret: bool = False):
    """org_t/dir_t: (3, N_pad) f32; table: (S_pad, 8). Returns (t, i) (N_pad,)."""
    n_pad = org_t.shape[1]
    s_pad = table.shape[0]
    n_chunks = s_pad // _S_CHUNK
    grid = (n_pad // _RAY_TILE,)
    kernel = functools.partial(_intersect_kernel, n_chunks=n_chunks)
    t, i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, _RAY_TILE), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, _RAY_TILE), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, 8), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _RAY_TILE), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _RAY_TILE), lambda g: (0, g), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(org_t, dir_t, table)
    return t[0], i[0]


def build_sphere_table(
    scene: SphereScene, eps: float = 1e-4, eps_rel: float = 5e-7
) -> jnp.ndarray:
    """(S_pad, 8) f32 columns [cx, cy, cz, r, eps_i, 0, 0, 0], S padded to 8.

    eps_i = max(eps, eps_rel * r) per sphere — the same per-sphere root
    rejection as the pure-JAX path (RenderConfig.intersect_eps_rel)."""
    s = scene.n_spheres
    pad = (-s) % _S_CHUNK
    c = jnp.asarray(scene.center, jnp.float32)
    r = jnp.asarray(scene.radius, jnp.float32)
    eps_i = jnp.maximum(jnp.asarray(eps, jnp.float32), eps_rel * r)
    tbl = jnp.concatenate(
        [c, r[:, None], eps_i[:, None], jnp.zeros((s, 3), jnp.float32)], axis=1
    )
    if pad:
        tbl = jnp.concatenate([tbl, jnp.zeros((pad, 8), jnp.float32)], axis=0)
    return tbl


def intersect_spheres_pallas(
    org: jnp.ndarray,
    dirs: jnp.ndarray,
    scene: SphereScene,
    eps: float = 1e-4,
    eps_rel: float = 5e-7,
    interpret: bool | None = None,
) -> Hit:
    """Closest analytic sphere hit via the Pallas kernel. Drop-in for
    ops.intersect.intersect_spheres (the traceRays backend contract,
    smallpt.cpp:427-605). interpret=None auto-selects the Pallas interpreter
    on non-TPU backends (the CPU test platform)."""
    if interpret is None:
        # real Mosaic lowering on TPU (incl. the axon tunnel platform);
        # interpreter on the CPU test platform
        interpret = jax.default_backend() == "cpu"
    n = org.shape[0]
    s = scene.n_spheres
    table = build_sphere_table(scene, eps=eps, eps_rel=eps_rel)

    n_pad = -(-n // _RAY_TILE) * _RAY_TILE
    org_t = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(org.astype(jnp.float32).T)
    # pad dirs with a unit vector so padded lanes stay finite
    dir_t = (
        jnp.zeros((3, n_pad), jnp.float32)
        .at[0, :].set(1.0)
        .at[:, :n].set(dirs.astype(jnp.float32).T)
    )

    t, i = _closest_hit(org_t, dir_t, table, s, interpret=interpret)
    t = t[:n]
    best_i = jnp.minimum(i[:n], s - 1)

    t = jnp.where(t >= _BIG, jnp.inf, t).astype(org.dtype)
    ok = jnp.isfinite(t)[:, None]
    x = org + jnp.where(ok, t[:, None], 0.0) * dirs
    ctr = jnp.take(scene.center, best_i, axis=0)
    nrm = safe_normalize(jnp.where(ok, x - ctr, 1.0))
    return Hit(
        t=t,
        inst=best_i,
        prim=best_i,
        x=jnp.where(ok, x, 0.0),
        n=nrm,
        uv=jnp.zeros((n, 2), org.dtype),
    )
