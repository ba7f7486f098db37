"""Pallas TPU closest-hit ray/triangle kernel — mesh-mode traceRays.

The reference's mesh path builds an OptiX Prime BVH over triangle meshes and
queries it on the GPU (OptixIntersector, smallpt.cpp:475-603); the CPU
fallback is a brute nearest-hit loop over all triangles
(CPUIntersector + scene.cpp:95-116). This kernel is the TPU-native brute
sweep: rays in the lane dimension, triangles walked in sublane chunks from a
VMEM-resident table, running closest (t, triId, u, v) carried in vector
registers. The math is iq's formulation (triIntersect, scene.cpp:52-70):

    n = cross(e1, e2);  q = cross(rov0, d)
    d' = 1 / dot(d, n)
    u = d' * dot(-q, e2);  v = d' * dot(q, e1);  t = d' * dot(-n, rov0)
    inside iff 0 <= u, 0 <= v, u + v <= 1

Hit completion (barycentric interpolation of position/normal) is shared with
the pure-JAX backend (ops/intersect.py::complete_mesh_hit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smallpt_tpu.core.scene import MeshScene
from smallpt_tpu.ops.intersect import Hit, complete_mesh_hit

_RAY_TILE = 1024
# culled-sweep SMEM budget per pallas_call: scalar-prefetch lists are
# SMEM-resident for the whole launch, so the tile axis is slabbed to keep
# tiles_per_call * l_max * 8 B under this (the slab count adapts to the
# accel's l_max; _MAX_TILES_PER_CALL caps it when lists are tiny)
_SMEM_LIST_BUDGET = 64 * 512 * 8
_MAX_TILES_PER_CALL = 256
_T_CHUNK = 32
_BIG = 3.0e38


def _mesh_kernel(org_ref, dir_ref, tbl_ref, t_ref, i_ref, u_ref, v_ref,
                 *, n_chunks, eps):
    """One ray tile vs the whole triangle table.

    tbl_ref: (T_pad, 16) f32 rows [v0(3) e1(3) e2(3) n(3) valid 0 0 0].
    Outputs (1, R): best t (BIG on miss), tri id, u, v.
    """
    ox = org_ref[0:1, :]
    oy = org_ref[1:2, :]
    oz = org_ref[2:3, :]
    dx = dir_ref[0:1, :]
    dy = dir_ref[1:2, :]
    dz = dir_ref[2:3, :]

    def body(c, carry):
        bt, bi, bu, bv = carry
        tbl = tbl_ref[pl.ds(c * _T_CHUNK, _T_CHUNK), :]  # (TC, 16)
        v0x, v0y, v0z = tbl[:, 0:1], tbl[:, 1:2], tbl[:, 2:3]
        e1x, e1y, e1z = tbl[:, 3:4], tbl[:, 4:5], tbl[:, 5:6]
        e2x, e2y, e2z = tbl[:, 6:7], tbl[:, 7:8], tbl[:, 8:9]
        nx, ny, nz = tbl[:, 9:10], tbl[:, 10:11], tbl[:, 11:12]
        valid = tbl[:, 12:13] > 0.5

        rx = ox - v0x  # rov0, (TC, R)
        ry = oy - v0y
        rz = oz - v0z
        # q = cross(rov0, d)
        qx = ry * dz - rz * dy
        qy = rz * dx - rx * dz
        qz = rx * dy - ry * dx
        dn = dx * nx + dy * ny + dz * nz
        inv = 1.0 / jnp.where(dn == 0.0, 1.0, dn)
        u = -(qx * e2x + qy * e2y + qz * e2z) * inv
        v = (qx * e1x + qy * e1y + qz * e1z) * inv
        t = -(nx * rx + ny * ry + nz * rz) * inv
        inside = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & ((u + v) <= 1.0)
        tt = jnp.where(inside & valid & (dn != 0.0) & (t > eps), t, _BIG)

        tmin = jnp.min(tt, axis=0, keepdims=True)
        srow = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 0)
        winner = tt <= tmin
        idx = jnp.min(
            jnp.where(winner, srow, jnp.int32(0x7FFFFFFF)),
            axis=0, keepdims=True,
        )
        # winner's (u, v) via select-by-row (no gathers in-kernel)
        first = winner & (srow == idx)
        usel = jnp.sum(jnp.where(first, u, 0.0), axis=0, keepdims=True)
        vsel = jnp.sum(jnp.where(first, v, 0.0), axis=0, keepdims=True)
        better = tmin < bt
        return (
            jnp.where(better, tmin, bt),
            jnp.where(better, idx + c * _T_CHUNK, bi),
            jnp.where(better, usel, bu),
            jnp.where(better, vsel, bv),
        )

    init = (
        jnp.full((1, _RAY_TILE), _BIG, jnp.float32),
        jnp.zeros((1, _RAY_TILE), jnp.int32),
        jnp.zeros((1, _RAY_TILE), jnp.float32),
        jnp.zeros((1, _RAY_TILE), jnp.float32),
    )
    bt, bi, bu, bv = jax.lax.fori_loop(0, n_chunks, body, init)
    t_ref[:, :] = bt
    i_ref[:, :] = bi
    u_ref[:, :] = bu
    v_ref[:, :] = bv


def build_tri_table(scene: MeshScene) -> jnp.ndarray:
    """(T_pad, 16) f32 rows [v0 e1 e2 n=cross(e1,e2) valid 0 0 0]."""
    pos = jnp.asarray(scene.positions, jnp.float32)
    idx = scene.indices
    v0 = jnp.take(pos, idx[:, 0], axis=0)
    v1 = jnp.take(pos, idx[:, 1], axis=0)
    v2 = jnp.take(pos, idx[:, 2], axis=0)
    e1 = v1 - v0
    e2 = v2 - v0
    n = jnp.cross(e1, e2)
    t = scene.n_triangles
    rows = jnp.concatenate(
        [v0, e1, e2, n, jnp.ones((t, 1), jnp.float32),
         jnp.zeros((t, 3), jnp.float32)],
        axis=1,
    )
    pad = (-t) % _T_CHUNK
    if pad:
        rows = jnp.concatenate([rows, jnp.zeros((pad, 16), jnp.float32)])
    return rows


@functools.partial(jax.jit, static_argnames=("n_chunks", "eps", "interpret"))
def _closest_tri(org_t, dir_t, table, n_chunks, eps, interpret=False):
    n_pad = org_t.shape[1]
    t_pad = table.shape[0]
    kernel = functools.partial(_mesh_kernel, n_chunks=n_chunks, eps=eps)
    t, i, u, v = pl.pallas_call(
        kernel,
        grid=(n_pad // _RAY_TILE,),
        in_specs=[
            pl.BlockSpec((3, _RAY_TILE), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, _RAY_TILE), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_pad, 16), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _RAY_TILE), lambda g: (0, g), memory_space=pltpu.VMEM)
        ] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(org_t, dir_t, table)
    return t[0], i[0], u[0], v[0]


def _mesh_culled_kernel(stp_ref, lst_ref, dlo_ref, org_ref, dir_ref, tbl_ref,
                        t_ref, i_ref, u_ref, v_ref,
                        *, n_glob_chunks, n_chunks, eps, n_rays, tile0=0):
    """Grid-culled closest-hit with DISTANCE-ORDERED tile-level early exit.

    stp_ref (T,) int32 scalar-prefetch: signed walk count — |stop| listed
    entries to sweep, negative when the reachable set overflowed l_max
    (then a full ascending fallback sweep runs iff the exit bound was not
    met after the walk); lst_ref (T, l_max) int32: reachable chunk ids in
    (distance bucket, id) order; dlo_ref (T, l_max) f32: per-slot lower
    bound on every REMAINING chunk's distance from any valid lane origin
    (non-decreasing). After each listed chunk the tile exits once every
    valid lane's best t is STRICTLY below the next slot's bound — no
    remaining chunk can then contain a closer (or equal-t smaller-id) hit
    for any lane.

    tbl_ref rows are mesh_accel's reordered table (global block first;
    column 13 = original tri id); chunk c occupies rows
    [c*CHUNK_T, (c+1)*CHUNK_T). The per-chunk math is the brute
    _mesh_kernel body (iq's formulation); the fold tie-breaks equal t on
    the ORIGINAL tri id, which makes the winner identical to the brute
    sweep's first-min-row fold for ANY sweep order — i_ref holds the
    original tri id directly (no order-gather needed outside)."""
    from smallpt_tpu.ops.mesh_accel import CHUNK_T

    t = pl.program_id(0)
    ox = org_ref[0:1, :]
    oy = org_ref[1:2, :]
    oz = org_ref[2:3, :]
    dx = dir_ref[0:1, :]
    dy = dir_ref[1:2, :]
    dz = dir_ref[2:3, :]
    big_oid = jnp.float32(3e38)

    def chunk_body(cid, carry):
        bt, bo, bu, bv = carry
        tbl = tbl_ref[pl.ds(cid * CHUNK_T, CHUNK_T), :]  # (TC, 16)
        v0x, v0y, v0z = tbl[:, 0:1], tbl[:, 1:2], tbl[:, 2:3]
        e1x, e1y, e1z = tbl[:, 3:4], tbl[:, 4:5], tbl[:, 5:6]
        e2x, e2y, e2z = tbl[:, 6:7], tbl[:, 7:8], tbl[:, 8:9]
        nx, ny, nz = tbl[:, 9:10], tbl[:, 10:11], tbl[:, 11:12]
        valid = tbl[:, 12:13] > 0.5
        oid = tbl[:, 13:14]

        rx = ox - v0x
        ry = oy - v0y
        rz = oz - v0z
        qx = ry * dz - rz * dy
        qy = rz * dx - rx * dz
        qz = rx * dy - ry * dx
        dn = dx * nx + dy * ny + dz * nz
        inv = 1.0 / jnp.where(dn == 0.0, 1.0, dn)
        u = -(qx * e2x + qy * e2y + qz * e2z) * inv
        v = (qx * e1x + qy * e1y + qz * e1z) * inv
        tt = -(nx * rx + ny * ry + nz * rz) * inv
        inside = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & ((u + v) <= 1.0)
        tt = jnp.where(inside & valid & (dn != 0.0) & (tt > eps), tt, _BIG)

        tmin = jnp.min(tt, axis=0, keepdims=True)
        winner = tt <= tmin
        # within-chunk tie-break: smallest ORIGINAL id among min-t rows
        osel = jnp.min(
            jnp.where(winner, oid, big_oid), axis=0, keepdims=True
        )
        first = winner & (oid == osel)
        usel = jnp.sum(jnp.where(first, u, 0.0), axis=0, keepdims=True)
        vsel = jnp.sum(jnp.where(first, v, 0.0), axis=0, keepdims=True)
        better = (tmin < bt) | ((tmin == bt) & (osel < bo))
        return (
            jnp.where(better, tmin, bt),
            jnp.where(better, osel, bo),
            jnp.where(better, usel, bu),
            jnp.where(better, vsel, bv),
        )

    stop = stp_ref[t]
    overflow = stop < 0
    walk = jnp.abs(stop)  # listed entries to sweep (nearest-first)
    l_max = lst_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _RAY_TILE), 1)
    lane_valid = (lane + (t + tile0) * _RAY_TILE) < n_rays
    neg_big = -jnp.float32(3e38)

    def tile_max(bt):
        return jnp.max(jnp.where(lane_valid, bt, neg_big))

    init = (
        jnp.full((1, _RAY_TILE), _BIG, jnp.float32),
        jnp.full((1, _RAY_TILE), big_oid, jnp.float32),
        jnp.zeros((1, _RAY_TILE), jnp.float32),
        jnp.zeros((1, _RAY_TILE), jnp.float32),
    )
    carry = jax.lax.fori_loop(
        0, n_glob_chunks, lambda c, cr: chunk_body(c, cr), init
    )

    def cond(c):
        return c[0] != 0

    def body(c):
        _, j, bt, bo, bu, bv = c
        # clamp the SMEM list read (an OOB read is UB on Mosaic)
        cid = n_glob_chunks + lst_ref[t, jnp.minimum(j, l_max - 1)]
        bt, bo, bu, bv = chunk_body(cid, (bt, bo, bu, bv))
        j2 = j + 1
        # exit once every valid lane's best t is strictly below the bound
        # on all remaining chunks (strict: an equal-t remaining hit could
        # still win the oid tie-break)
        dnext = dlo_ref[t, jnp.minimum(j2, l_max - 1)]
        more = jnp.logical_and(j2 < walk, tile_max(bt) >= dnext)
        return (more.astype(jnp.int32), j2, bt, bo, bu, bv)

    state = (
        (walk > 0).astype(jnp.int32), jnp.int32(0),
        carry[0], carry[1], carry[2], carry[3],
    )
    _, _, bt, bo, bu, bv = jax.lax.while_loop(cond, body, state)

    # overflow fallback: the reachable set didn't fit l_max. The dropped
    # chunks are exactly the farthest-rank tail, so dlo[walk-1] still
    # bounds them — only if some lane's best t reaches that bound can an
    # unlisted chunk matter, and then we sweep EVERYTHING ascending
    # (idempotent (t, oid) fold: re-sweeping listed chunks is harmless).
    bound_rest = dlo_ref[t, jnp.maximum(walk - 1, 0)]
    need_fb = jnp.logical_and(overflow, tile_max(bt) >= bound_rest)

    def fb_body(c):
        _, j, bt, bo, bu, bv = c
        bt, bo, bu, bv = chunk_body(n_glob_chunks + j, (bt, bo, bu, bv))
        j2 = j + 1
        return ((j2 < n_chunks).astype(jnp.int32), j2, bt, bo, bu, bv)

    _, _, bt, bo, bu, bv = jax.lax.while_loop(
        cond, fb_body,
        (need_fb.astype(jnp.int32), jnp.int32(0), bt, bo, bu, bv),
    )
    t_ref[:, :] = bt
    i_ref[:, :] = jnp.where(bo >= big_oid, 0.0, bo).astype(jnp.int32)
    u_ref[:, :] = bu
    v_ref[:, :] = bv


def intersect_mesh_culled(
    org: jnp.ndarray,
    dirs: jnp.ndarray,
    scene: MeshScene,
    accel,
    eps: float = 0.0,
    interpret: bool | None = None,
) -> Hit:
    """Grid-culled closest triangle hit — the accelerated traceRays
    (OptixIntersector's BVH query slot, smallpt.cpp:578-582), drop-in for
    intersect_mesh_pallas. ``accel`` is a mesh_accel.MeshGridAccel built
    once per mesh; per call this computes per-tile reachable-chunk lists
    in XLA (sort-free) and sweeps global + listed chunks in the kernel.
    Conservative reach masks guarantee the same closest hit as the brute
    sweep (tests pin exact equality)."""
    from smallpt_tpu.ops.mesh_accel import CHUNK_T, RAY_TILE, mesh_tile_lists

    assert RAY_TILE == _RAY_TILE
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = org.shape[0]
    n_pad = -(-n // _RAY_TILE) * _RAY_TILE
    org_t = (
        jnp.zeros((3, n_pad), jnp.float32)
        .at[:, :n].set(org.astype(jnp.float32).T)
    )
    dir_t = (
        jnp.zeros((3, n_pad), jnp.float32)
        .at[0, :].set(1.0)
        .at[:, :n].set(dirs.astype(jnp.float32).T)
    )
    valid = jnp.arange(n_pad, dtype=jnp.int32) < n
    lists, dlo, stops = mesh_tile_lists(org_t, dir_t, valid, accel)

    table = accel.table
    t_pad = table.shape[0]
    n_tiles = n_pad // _RAY_TILE
    # scalar-prefetch arrays live in SMEM for the WHOLE launch: slab the
    # tile axis so (slab, l_max)·8 B stays well under the SMEM budget even
    # for full-frame batches (768 tiles at 512x384 spp4 would be ~3 MB)
    slab = max(1, min(
        n_tiles, _MAX_TILES_PER_CALL,
        _SMEM_LIST_BUDGET // max(accel.l_max * 8, 1),
    ))
    outs = []
    for s0 in range(0, n_tiles, slab):
        s1 = min(s0 + slab, n_tiles)
        kernel = functools.partial(
            _mesh_culled_kernel,
            n_glob_chunks=accel.n_glob_chunks,
            n_chunks=accel.n_chunks,
            eps=float(eps),
            n_rays=n,
            tile0=s0,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(s1 - s0,),
            in_specs=[
                pl.BlockSpec((3, _RAY_TILE), lambda g, *_: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, _RAY_TILE), lambda g, *_: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t_pad, 16), lambda g, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, _RAY_TILE), lambda g, *_: (0, g),
                             memory_space=pltpu.VMEM)
            ] * 4,
        )
        n_lane = (s1 - s0) * _RAY_TILE
        outs.append(pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((1, n_lane), jnp.float32),
                jax.ShapeDtypeStruct((1, n_lane), jnp.int32),
                jax.ShapeDtypeStruct((1, n_lane), jnp.float32),
                jax.ShapeDtypeStruct((1, n_lane), jnp.float32),
            ],
            interpret=interpret,
        )(
            stops[s0:s1], lists[s0:s1], dlo[s0:s1],
            org_t[:, s0 * _RAY_TILE:s1 * _RAY_TILE],
            dir_t[:, s0 * _RAY_TILE:s1 * _RAY_TILE],
            table,
        ))
    t, i, u, v = (
        jnp.concatenate([o[k] for o in outs], axis=1)
        for k in range(4)
    )
    t, i, u, v = t[0, :n], i[0, :n], u[0, :n], v[0, :n]
    t = jnp.where(t >= _BIG, jnp.inf, t).astype(org.dtype)
    return complete_mesh_hit(scene, t, i, u.astype(org.dtype),
                             v.astype(org.dtype))


def intersect_mesh_pallas(
    org: jnp.ndarray,
    dirs: jnp.ndarray,
    scene: MeshScene,
    eps: float = 0.0,
    interpret: bool | None = None,
) -> Hit:
    """Closest triangle hit via the Pallas sweep — drop-in for
    ops.intersect.intersect_mesh (rejects t <= eps like the reference's
    t <= 0 check, scene.cpp:105)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = org.shape[0]
    table = build_tri_table(scene)
    n_chunks = table.shape[0] // _T_CHUNK

    n_pad = -(-n // _RAY_TILE) * _RAY_TILE
    org_t = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(org.astype(jnp.float32).T)
    dir_t = (
        jnp.zeros((3, n_pad), jnp.float32)
        .at[0, :].set(1.0)
        .at[:, :n].set(dirs.astype(jnp.float32).T)
    )
    t, i, u, v = _closest_tri(org_t, dir_t, table, n_chunks,
                              float(eps), interpret=interpret)
    t = jnp.where(t[:n] >= _BIG, jnp.inf, t[:n]).astype(org.dtype)
    return complete_mesh_hit(scene, t, i[:n], u[:n].astype(org.dtype),
                             v[:n].astype(org.dtype))
