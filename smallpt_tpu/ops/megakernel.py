"""Pallas TPU wavefront megakernel: regenerate + intersect + shade, fused.

The reference's hot loop crosses host<->GPU every bounce and runs trace and
shade as separate passes (Renderer::render, smallpt.cpp:779-807;
OptixIntersector::traceRays, smallpt.cpp:553-583). The pure-JAX wavefront
(ops/wavefront.py) already fuses the loop on-device, but XLA still emits ~30
separate fused kernels per bounce, each paying launch + HBM round-trip for
the 786k-lane path state — profiling shows the loop runs at ~1% of VPU peak,
bound by that per-op overhead.

This module is the TPU-native answer: ONE persistent Mosaic kernel renders
the whole pass. Each grid tile owns 8192 rays and drains them with an
in-kernel while loop — ray regeneration (camera sampling, thin-lens DoF),
PCG4D uniforms, the closest-hit sphere sweep (SMEM scalar reads for small
scenes, chunked VMEM loads for big ones), material winner-select, the full
smallpt BSDF/RR shading, and optional next-event estimation (shadow sweep +
per-light suppression bits) all happen in vector registers; path state
crosses HBM once per kernel launch, not per bounce. Streaming mode keeps
that state alive ACROSS launches (engine/streaming.py), so lanes regenerate
at ~100% occupancy indefinitely — measured ~1.1 Grays/s on one TPU v5 lite
chip for the full-BSDF Cornell box.

Semantics are identical to the regenerative scheduler
(ops/wavefront.py::run_wavefront_regen): split_budget == 1 (probabilistic
single-path refraction everywhere, the reference's own depth>2 behavior,
smallpt.cpp:256-263), Mode.FULL transport, RR after rr_depth
(smallpt.cpp:187-198), tent/box filters, legacy/matrix cameras. The RNG is
bit-identical to core/rng.py (same PCG4D keying), so images match the JAX
scheduler up to f32 op-ordering noise on razor-edge paths.

State layout: every per-lane value is stored as an (8, G/8) f32 or int32
plane stacked into one (8*NF, G/8) buffer — each plane is natively
(sublane, lane)-tiled, so kernel loads need no relayout, and the lane's
global id (== its pixel id) is recomputed from grid position via iota.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smallpt_tpu.config import RenderConfig, Filter, CameraModel, Mode
from smallpt_tpu.core.camera import LegacyCamera, MatrixCamera
from smallpt_tpu.core.rng import (
    _CAMERA_SALT, _GOLDEN, _LENS_SALT, _NEE_SALT, _NEE_SLOT_STRIDE,
    _STREAM_IP_MULT, _pcg4d,
)
from smallpt_tpu.core.scene import SphereScene

# sphere-table capacity: scalar SMEM sweep up to MAX_SMEM_SPHERES; chunked
# VMEM sweep beyond (table bytes = S*16*4; 64k spheres = 4 MB of VMEM)
MAX_SMEM_SPHERES = 512
MAX_VMEM_SPHERES = 65536
# renderer.py routes scenes above this to the split-sweep REGEN path: the
# in-kernel material fold makes the fused sweep lose to the standalone
# intersect kernel at large S (engine/renderer.py::_use_mega)
MEGA_MAX_SPHERES = 2048

# Float-state planes (each (8, C) where C = lanes/8 columns per tile).
_F_OX, _F_OY, _F_OZ = 0, 1, 2       # ray origin
_F_DX, _F_DY, _F_DZ = 3, 4, 5      # ray direction
_F_WX, _F_WY, _F_WZ = 6, 7, 8      # throughput
_F_RX, _F_RY, _F_RZ = 9, 10, 11    # accumulated radiance
_F_M1, _F_M2 = 12, 13              # completed-sample luminance sum / sum sq
_NF = 14
# Int-state planes.
_I_DEPTH, _I_SIDX, _I_ALIVE, _I_RAYS, _I_BUDGET, _I_SUP = 0, 1, 2, 3, 4, 5
_NI = 6

_SUB = 8          # f32 sublane tile height
_LANE = 1024      # lanes per tile column block (8 lane-tiles)
_TILE = _SUB * _LANE  # rays per grid step
_BIG = 3.0e38

def _to_unit(bits):
    # Mosaic has no uint32->f32 cast; the top-24-bit value fits int32, whose
    # cast IS supported — bit-identical to core/rng.py::_to_unit.
    i24 = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    return i24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _normalize3(x, y, z):
    inv = jax.lax.rsqrt(x * x + y * y + z * z)
    return x * inv, y * inv, z * inv


def _atan2_poly(y, x):
    """atan2(y, x) from Mosaic-proven ops only (abs/min/max/div/select +
    an odd minimax polynomial — no transcendental intrinsics). Octant
    reduction to z = min/max in [0, 1], degree-9 minimax atan on [0, 1]
    (max err ~1.1e-5 rad), then quadrant unfolding. Matches
    jnp.arctan2's (-pi, pi] convention up to signed zero: atan2(0, 0) = 0
    and atan2(+0, -x) = pi, but y = -0.0, x < 0 returns +pi where numpy
    returns -pi (`y < 0.0` is false for negative zero — harmless for the
    UV use, where both map to u = 0.5). Used for the UV AOV's lat/long
    (the in-kernel analog of ops/intersect.py::sphere_uv)."""
    f = jnp.float32
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    z = jnp.minimum(ax, ay) / jnp.maximum(hi, f(1e-30))
    z2 = z * z
    p = f(0.0208351)
    p = p * z2 - f(0.0851330)
    p = p * z2 + f(0.1801410)
    p = p * z2 - f(0.3302995)
    p = p * z2 + f(0.9998660)
    a = p * z
    a = jnp.where(ay > ax, f(jnp.pi / 2) - a, a)
    a = jnp.where(x < 0.0, f(jnp.pi) - a, a)
    return jnp.where(y < 0.0, -a, a)


def _asin_poly(y):
    """asin(y) for y in [-1, 1] via atan2(y, sqrt(1-y^2)) — exact at the
    poles (atan2(+-1, 0) = +-pi/2), sqrt/mul/select only."""
    c = jnp.clip(y, -1.0, 1.0)
    return _atan2_poly(c, jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0)))


def _shadow_tt(ox, oy, oz, dx, dy, dz, scx, scy, scz, sr, seps):
    """Candidate hit distance for the NEE shadow sweep — the same stable
    citardauq form as the main sweep (giant wall spheres occlude too)."""
    opx = scx - ox
    opy = scy - oy
    opz = scz - oz
    b = opx * dx + opy * dy + opz * dz
    fx = opx - b * dx
    fy = opy - b * dy
    fz = opz - b * dz
    pp = fx * fx + fy * fy + fz * fz
    sp = jnp.sqrt(pp)
    det = (sr - sp) * (sr + sp)
    s_ = jnp.sqrt(jnp.maximum(det, 0.0))
    opn = jnp.sqrt(b * b + pp)
    cc = (opn - sr) * (opn + sr)
    denom = b + s_
    t_near = jnp.where(denom > 0.0,
                       cc / jnp.where(denom == 0.0, 1.0, denom), -_BIG)
    tt = jnp.where(t_near > seps, t_near,
                   jnp.where(denom > seps, denom, _BIG))
    return jnp.where((det >= 0.0) & (sr > 0.0), tt, _BIG)


def _mega_kernel(
    kw_ref,      # (1, 2) uint32 SMEM: key words k0, k1
    ip_ref,      # (1, 4) int32 SMEM: [ip_offset, row_offset, reserved, max_it]
                 #   ip_offset  — sample-axis shard offset (SURVEY.md §5.7)
                 #   row_offset — tile-axis shard's first global image row
                 #   reserved   — (sample budgets live in the _I_BUDGET plane)
                 #   max_it     — wavefront iteration cap for this launch
    cam_ref,     # (1, 16) f32 SMEM: A(3) B(3) C(3) O(3) push
    tbl_ref,     # (S, 16) f32 sphere+material table — SMEM (scalar reads)
                 # for small scenes, VMEM (chunked loads) for big ones
    f_ref,       # (8*_NF, C) f32 state (aliased in/out)
    i_ref,       # (8*_NI, C) int32 state (aliased in/out)
    f_out,       # aliased output of f_ref
    i_out,       # aliased output of i_ref
    rec_out=None,  # (8*record_depths, C) int32 winner record (see below)
    *,
    config: RenderConfig,
    n_spheres: int,
    n_cols: int,  # total state columns (G_pad / 8)
    streaming: bool,  # streaming keying v2: (pixel, ip) as separate PCG4D
                      # words (core/rng.py::stream_key_words)
    table_in_smem: bool,  # True: per-sphere scalar reads from SMEM (small
                          # scenes); False: chunked VMEM loads (big scenes)
    record_depths: int | None = None,  # record each lane's winner sphere id
                 # per bounce depth into rec_out (-1 = miss or dead) — the
                 # recorded-winner replay differentiator's fast forward
                 # (grad/replay.py::record_forward). Requires budget == 1
                 # (depth lockstep: with one sample per lane and no regen,
                 # every live lane at iteration `it` is at depth `it`, so
                 # plane d is written exactly at depth == d). The per-depth
                 # planes ride the loop CARRY: a dynamically-indexed ref
                 # write per iteration would be a per-lane scatter, not a
                 # Mosaic-friendly op. Cost: 2 elem-ops per depth plane per
                 # iteration (~12% on the 9-sphere Cornell sweep).
):
    t = pl.program_id(0)

    fplane = lambda i: f_ref[pl.ds(8 * i, 8), :]
    iplane = lambda i: i_ref[pl.ds(8 * i, 8), :]

    ox0, oy0, oz0 = fplane(_F_OX), fplane(_F_OY), fplane(_F_OZ)
    dx0, dy0, dz0 = fplane(_F_DX), fplane(_F_DY), fplane(_F_DZ)
    wx0, wy0, wz0 = fplane(_F_WX), fplane(_F_WY), fplane(_F_WZ)
    rx0, ry0, rz0 = fplane(_F_RX), fplane(_F_RY), fplane(_F_RZ)
    m10, m20 = fplane(_F_M1), fplane(_F_M2)
    depth0 = iplane(_I_DEPTH)
    s_idx0 = iplane(_I_SIDX)
    alive0 = iplane(_I_ALIVE) != 0
    nrays0 = iplane(_I_RAYS)
    sup0 = iplane(_I_SUP)
    budget = iplane(_I_BUDGET)  # per-lane sample allowance (adaptive
                                # sampling writes this plane between steps)

    k0 = kw_ref[0, 0]
    k1 = kw_ref[0, 1]
    ip_offset = ip_ref[0, 0]
    row_offset = ip_ref[0, 1]
    max_it_in = ip_ref[0, 3]

    # lane/pixel id: plane element (r, c) of tile t is global lane
    # r * n_cols + t * _LANE + c  (the (8, G/8) C-order reshape of (G,)).
    row8 = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)
    col_l = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1)
    lane = row8 * n_cols + t * _LANE + col_l  # == pixel id

    W, H = config.width, config.height
    pix_col = lane % W
    pix_row = lane // W + row_offset  # global image row (sharded tile bands)
    pixel = pix_row * W + pix_col

    max_it = max_it_in

    def loop_cond(carry):
        it = carry[0]
        s_idx = carry[14]
        alive_i = carry[15]
        more = jnp.logical_or(alive_i != 0, s_idx < budget - 1)
        return jnp.logical_and(it < max_it, jnp.any(more))

    def loop_body(carry):
        (it, ox, oy, oz, dx, dy, dz, wx, wy, wz, rx, ry, rz, depth,
         s_idx, alive_i, nrays, m1, m2, sup, *rec) = carry
        rec = list(rec)
        alive = alive_i != 0

        # ---- regenerate dead lanes with their pixel's next sample ----------
        need = jnp.logical_and(jnp.logical_not(alive), s_idx < budget - 1)
        # per-sample statistics: at a sample boundary the just-finished
        # sample's luminance is lum(radiance) - m1 (m1 == luminance at the
        # previous boundary); m2 accumulates its square for the variance
        # estimate driving adaptive sampling (engine/streaming.py)
        cur_lum = (rx + ry + rz) * jnp.float32(1.0 / 3.0)
        delta = cur_lum - m1
        m2 = jnp.where(need, m2 + delta * delta, m2)
        m1 = jnp.where(need, cur_lum, m1)
        s_new = jnp.where(need, s_idx + 1, s_idx)
        ip = ip_offset + s_new
        if streaming:
            # streaming keying v2 (core/rng.py::stream_key_words): pixel and
            # the unbounded in-pixel index ip enter PCG4D as SEPARATE words —
            # unique streams for any ip < 2^32 (v1 packed both into one int32
            # and collided inside config 5's 5000-spp envelope)
            wa = pltpu.bitcast(pixel, jnp.uint32) ^ k0
            wb = k1 ^ (pltpu.bitcast(ip, jnp.uint32)
                       * jnp.uint32(_STREAM_IP_MULT))
        else:
            sid = pixel * config.spp + ip  # matches wavefront regen keying
            wa = pltpu.bitcast(sid, jnp.uint32) ^ k0
            wb = jnp.broadcast_to(k1, sid.shape)
        # jitter cell cycles over the js x js grid; the modulo matters in
        # streaming mode where ip grows beyond spp (per-pass: ip < spp makes
        # it a no-op, matching foreachSampleInRow's cell decomposition,
        # smallpt.cpp:715-719)
        js = config.jitter_size
        group = (ip // config.spp_per_cell) % (js * js)
        cx_cell = (group % js).astype(jnp.float32)
        cy_cell = (group // js).astype(jnp.float32)

        # camera uniforms (bit-identical to core/rng.py::camera_uniforms in
        # per-pass mode / stream_camera_uniforms in streaming mode)
        ua, ub, _, _ = _pcg4d(
            wa,
            wb,
            jnp.full(wa.shape, jnp.uint32(_CAMERA_SALT)),
            jnp.broadcast_to(k0 + k1, wa.shape),
        )
        u0 = _to_unit(ua)
        u1 = _to_unit(ub)

        if config.filter == Filter.TENT:
            r0 = 2.0 * u0
            r1 = 2.0 * u1
            f0 = jnp.where(r0 < 1.0, jnp.sqrt(r0) - 1.0,
                           1.0 - jnp.sqrt(jnp.maximum(2.0 - r0, 0.0)))
            f1 = jnp.where(r1 < 1.0, jnp.sqrt(r1) - 1.0,
                           1.0 - jnp.sqrt(jnp.maximum(2.0 - r1, 0.0)))
            off0 = (cx_cell + 0.5 + f0) / js - 0.5
            off1 = (cy_cell + 0.5 + f1) / js - 0.5
        else:  # BOX
            off0 = (cx_cell + u0) / js - 0.5
            off1 = (cy_cell + u1) / js - 0.5

        sx = (pix_col.astype(jnp.float32) + 0.5 + off0) / W - 0.5
        sy = (pix_row.astype(jnp.float32) + 0.5 + off1) / H - 0.5
        if config.camera_model == CameraModel.MATRIX:
            sx = 2.0 * sx
            sy = 2.0 * sy

        ax, ay, az = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
        bx, by, bz = cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5]
        cxv, cyv, czv = cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8]
        o0x, o0y, o0z = cam_ref[0, 9], cam_ref[0, 10], cam_ref[0, 11]
        push = cam_ref[0, 12]

        gdx = sx * ax + sy * bx + cxv
        gdy = sx * ay + sy * by + cyv
        gdz = sx * az + sy * bz + czv
        gox = o0x + gdx * push
        goy = o0y + gdy * push
        goz = o0z + gdz * push
        ndx, ndy, ndz = _normalize3(gdx, gdy, gdz)
        if config.aperture > 0.0:
            # thin-lens: jitter origin on the aperture disk, re-aim at the
            # along-ray focus point (core/camera.py::_thin_lens, same streams
            # as core/rng.py::lens_uniforms)
            la, lb, _, _ = _pcg4d(
                wa,
                wb,
                jnp.full(wa.shape, jnp.uint32(_LENS_SALT)),
                jnp.broadcast_to(k0 + k1, wa.shape),
            )
            lu0 = _to_unit(la)
            lu1 = _to_unit(lb)
            lrad = jnp.float32(config.aperture) * jnp.sqrt(lu0)
            lth = jnp.float32(2.0 * np.pi) * lu1
            lx_ = lrad * jnp.cos(lth)
            ly_ = lrad * jnp.sin(lth)
            rnx, rny, rnz = _normalize3(
                jnp.broadcast_to(ax, lx_.shape),
                jnp.broadcast_to(ay, lx_.shape),
                jnp.broadcast_to(az, lx_.shape),
            )
            unx, uny, unz = _normalize3(
                jnp.broadcast_to(bx, lx_.shape),
                jnp.broadcast_to(by, lx_.shape),
                jnp.broadcast_to(bz, lx_.shape),
            )
            fdist = jnp.float32(config.focal_distance)
            fpx = gox + ndx * fdist
            fpy = goy + ndy * fdist
            fpz = goz + ndz * fdist
            gox = gox + rnx * lx_ + unx * ly_
            goy = goy + rny * lx_ + uny * ly_
            goz = goz + rnz * lx_ + unz * ly_
            ndx, ndy, ndz = _normalize3(fpx - gox, fpy - goy, fpz - goz)

        ox = jnp.where(need, gox, ox)
        oy = jnp.where(need, goy, oy)
        oz = jnp.where(need, goz, oz)
        dx = jnp.where(need, ndx, dx)
        dy = jnp.where(need, ndy, dy)
        dz = jnp.where(need, ndz, dz)
        one = jnp.float32(1.0)
        wx = jnp.where(need, one, wx)
        wy = jnp.where(need, one, wy)
        wz = jnp.where(need, one, wz)
        depth = jnp.where(need, 0, depth)
        sup = jnp.where(need, 0, sup)
        alive = jnp.logical_or(alive, need)
        nrays = nrays + alive.astype(jnp.int32)

        # ---- closest-hit sphere sweep (stable citardauq form, ----------------
        # ops/intersect.py::sphere_hit_t math) -----------------------------------
        def sphere_tt(scx, scy, scz, sr, seps):
            """Candidate hit distance of one sphere vs the whole tile —
            the shared citardauq form (exactness of the NEE lit-test depends
            on main and shadow sweeps using identical arithmetic)."""
            return _shadow_tt(ox, oy, oz, dx, dy, dz, scx, scy, scz, sr, seps)

        def isect_body(si, carry):
            # SMEM path; carry only (best_t, best_id) — material/geometry of
            # the winner is selected in one post-sweep pass, keeping the hot
            # loop's live-register set minimal (measured 5x on the NEE sweep)
            bt, bi = carry
            tt = sphere_tt(tbl_ref[si, 0], tbl_ref[si, 1], tbl_ref[si, 2],
                           tbl_ref[si, 3], tbl_ref[si, 4])
            better = tt < bt
            return (jnp.where(better, tt, bt),
                    jnp.where(better, si.astype(jnp.float32), bi))

        def isect_chunk_body(c, carry):
            # VMEM path: one (8, 16) vector load per 8 spheres, then static
            # per-row scalar extracts — big sphere tables don't fit SMEM
            bt, bi = carry
            blk = tbl_ref[pl.ds(c * 8, 8), :]
            for r in range(8):
                tt = sphere_tt(blk[r, 0], blk[r, 1], blk[r, 2],
                               blk[r, 3], blk[r, 4])
                better = tt < bt
                sid_f = (c * 8 + r).astype(jnp.float32)
                bt = jnp.where(better, tt, bt)
                bi = jnp.where(better, sid_f, bi)
            return (bt, bi)

        def select_winner(bt, bi):
            # one pass over the table turning the winner id into its
            # material + geometry (12 selects per sphere, once per bounce)
            zero = jnp.zeros((_SUB, _LANE), jnp.float32)
            vals = [zero] * 10 + [jnp.ones((_SUB, _LANE), jnp.float32)]

            def pick(si, vals):
                m = bi == si.astype(jnp.float32)
                cols = (5, 6, 7, 8, 9, 10, 11, 0, 1, 2, 3)
                return [
                    jnp.where(m, tbl_ref[si, col], v)
                    for col, v in zip(cols, vals)
                ]

            def pick_chunk(c, vals):
                blk = tbl_ref[pl.ds(c * 8, 8), :]
                for r in range(8):
                    m = bi == (c * 8 + r).astype(jnp.float32)
                    cols = (5, 6, 7, 8, 9, 10, 11, 0, 1, 2, 3)
                    vals = [
                        jnp.where(m, blk[r, col], v)
                        for col, v in zip(cols, vals)
                    ]
                return vals

            if table_in_smem:
                return jax.lax.fori_loop(0, n_spheres, pick, vals)
            return jax.lax.fori_loop(0, -(-n_spheres // 8), pick_chunk, vals)

        big = jnp.full((_SUB, _LANE), _BIG, jnp.float32)
        carry0 = (big, jnp.full((_SUB, _LANE), -1.0, jnp.float32))
        if table_in_smem:
            bt, bi = jax.lax.fori_loop(0, n_spheres, isect_body, carry0)
        else:
            bt, bi = jax.lax.fori_loop(
                0, -(-n_spheres // 8), isect_chunk_body, carry0
            )
        (em_x, em_y, em_z, al_x, al_y, al_z, refl, bcx, bcy, bcz, br) = (
            select_winner(bt, bi)
        )

        hit = bt < _BIG
        live_hit = jnp.logical_and(alive, hit)

        if record_depths:
            # budget-1 lockstep: depth == it for every lane (regen at it=0
            # sets 0; the unconditional depth+1 below keeps dead lanes in
            # step), so exactly plane `depth` is written this iteration
            win_i = jnp.where(live_hit, bi.astype(jnp.int32), -1)
            rec = [
                jnp.where(depth == d, win_i, rec[d])
                for d in range(record_depths)
            ]

        if config.has_env and config.mode == Mode.FULL:
            # escaped rays pick up the constant environment radiance (the
            # smallpt.cpp:168 hook); the lane dies below as a plain miss.
            # config is static, so env-off kernels compile unchanged.
            live_miss = jnp.logical_and(alive, jnp.logical_not(hit))
            ex, ey, ez = (jnp.float32(c) for c in config.env_emission)
            rx = rx + jnp.where(live_miss, wx * ex, 0.0)
            ry = ry + jnp.where(live_miss, wy * ey, 0.0)
            rz = rz + jnp.where(live_miss, wz * ez, 0.0)

        # hit point + unit normal (sphere): n = (x - c) / |x - c|
        hx = ox + bt * dx
        hy = oy + bt * dy
        hz = oz + bt * dz
        nx0 = hx - bcx
        ny0 = hy - bcy
        nz0 = hz - bcz
        nx, ny, nz = _normalize3(
            jnp.where(hit, nx0, 1.0), jnp.where(hit, ny0, 0.0),
            jnp.where(hit, nz0, 0.0),
        )

        if config.flip_normals:
            ndot = nx * dx + ny * dy + nz * dz
            flip = ndot < 0.0
            nlx = jnp.where(flip, nx, -nx)
            nly = jnp.where(flip, ny, -ny)
            nlz = jnp.where(flip, nz, -nz)
        else:
            nlx, nly, nlz = nx, ny, nz

        # emission accumulation (pre-RR, smallpt.cpp:179); with NEE, a light
        # sampled at the previous vertex is suppressed here (ops/wavefront.py
        # semantics, bit per config.nee_lights slot)
        lh = live_hit
        if config.nee_lights:
            # nearest-sphere id for the suppression test: recover it from the
            # winner's center/radius is ambiguous, so carry a light-hit mask
            # from the sweep instead: compare against each light's center
            hit_sup = jnp.zeros_like(lh)
            for slot, li in enumerate(config.nee_lights):
                is_li = bi == jnp.float32(li)
                hit_sup = hit_sup | (
                    is_li & (((sup >> slot) & 1) == 1)
                )
            keep = jnp.logical_not(hit_sup)
            rx = rx + jnp.where(lh & keep, wx * em_x, 0.0)
            ry = ry + jnp.where(lh & keep, wy * em_y, 0.0)
            rz = rz + jnp.where(lh & keep, wz * em_z, 0.0)
        else:
            rx = rx + jnp.where(lh, wx * em_x, 0.0)
            ry = ry + jnp.where(lh, wy * em_y, 0.0)
            rz = rz + jnp.where(lh, wz * em_z, 0.0)

        # shade uniforms (bit-identical to core/rng.py::shade_uniforms, hist = 0
        # — streaming substitutes the v2 (pixel, ip) words for (sid, hist))
        sa, sb, sc, sd_ = _pcg4d(
            wa,
            wb,
            pltpu.bitcast(depth, jnp.uint32) + jnp.uint32(_GOLDEN),
            jnp.broadcast_to(k0 + k1, wa.shape),
        )
        u_rr = _to_unit(sa)
        u_b1 = _to_unit(sb)
        u_b2 = _to_unit(sc)
        u_ch = _to_unit(sd_)

        # Russian roulette (smallpt.cpp:187-198)
        p_rr = jnp.maximum(al_x, jnp.maximum(al_y, al_z))
        rr_active = depth > config.rr_depth
        survive = jnp.logical_or(jnp.logical_not(rr_active), u_rr < p_rr)
        boost = jnp.where(
            jnp.logical_and(rr_active, survive),
            1.0 / jnp.maximum(p_rr, 1e-12), 1.0,
        )
        fx_ = al_x * boost
        fy_ = al_y * boost
        fz_ = al_z * boost

        # DIFF: cosine-weighted hemisphere around nl (smallpt.cpp:208-216)
        r1 = jnp.float32(2.0 * np.pi) * u_b1
        r2s = jnp.sqrt(u_b2)
        bigx = jnp.abs(nlx) > 0.1
        upx = jnp.where(bigx, 0.0, 1.0)
        upy = jnp.where(bigx, 1.0, 0.0)
        # u = normalize(cross(up, w)); up.z == 0
        tux = upy * nlz
        tuy = -upx * nlz
        tuz = upx * nly - upy * nlx
        tux, tuy, tuz = _normalize3(tux, tuy, tuz)
        tvx = nly * tuz - nlz * tuy
        tvy = nlz * tux - nlx * tuz
        tvz = nlx * tuy - nly * tux
        cr1 = jnp.cos(r1) * r2s
        sr1 = jnp.sin(r1) * r2s
        wzc = jnp.sqrt(jnp.maximum(1.0 - u_b2, 0.0))
        ddx = tux * cr1 + tvx * sr1 + nlx * wzc
        ddy = tuy * cr1 + tvy * sr1 + nly * wzc
        ddz = tuz * cr1 + tvz * sr1 + nlz * wzc
        ddx, ddy, ddz = _normalize3(ddx, ddy, ddz)

        # SPEC mirror (smallpt.cpp:218)
        nd = nx * dx + ny * dy + nz * dz
        msx = dx - nx * (2.0 * nd)
        msy = dy - ny * (2.0 * nd)
        msz = dz - nz * (2.0 * nd)

        # REFR: Snell + TIR + Schlick (smallpt.cpp:225-246)
        into = (nx * nlx + ny * nly + nz * nlz) > 0.0
        nc = jnp.float32(1.0)
        nt = jnp.float32(config.ior)
        nnt = jnp.where(into, nc / nt, nt / nc)
        ddn = dx * nlx + dy * nly + dz * nlz
        cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
        tir = cos2t < 0.0
        sq = jnp.sqrt(jnp.maximum(cos2t, 0.0))
        sgn = jnp.where(into, 1.0, -1.0)
        tfac = sgn * (ddn * nnt + sq)
        tdx = dx * nnt - nx * tfac
        tdy = dy * nnt - ny * tfac
        tdz = dz * nnt - nz * tfac
        tdx, tdy, tdz = _normalize3(
            jnp.where(tir, 1.0, tdx), jnp.where(tir, 0.0, tdy),
            jnp.where(tir, 0.0, tdz),
        )
        a_ = nt - nc
        b2_ = nt + nc
        r0_ = (a_ * a_) / (b2_ * b2_)
        cterm = 1.0 - jnp.where(into, -ddn, tdx * nx + tdy * ny + tdz * nz)
        re = r0_ + (1.0 - r0_) * cterm * cterm * cterm * cterm * cterm
        tr_ = 1.0 - re
        p_refl = 0.25 + 0.5 * re
        choose_refl = u_ch < p_refl
        use_spec_dir = jnp.logical_or(tir, choose_refl)
        rfx = jnp.where(use_spec_dir, msx, tdx)
        rfy = jnp.where(use_spec_dir, msy, tdy)
        rfz = jnp.where(use_spec_dir, msz, tdz)
        refr_w = jnp.where(
            tir, 1.0, jnp.where(choose_refl, re / p_refl, tr_ / (1.0 - p_refl))
        )

        is_diff = refl < 0.5
        is_spec = jnp.logical_and(refl >= 0.5, refl < 1.5)
        is_refr = refl >= 1.5

        newdx = jnp.where(is_diff, ddx, jnp.where(is_spec, msx, rfx))
        newdy = jnp.where(is_diff, ddy, jnp.where(is_spec, msy, rfy))
        newdz = jnp.where(is_diff, ddz, jnp.where(is_spec, msz, rfz))
        wf = jnp.where(is_refr, refr_w, 1.0)
        wfx = fx_ * wf
        wfy = fy_ * wf
        wfz = fz_ * wf

        transmitted = jnp.logical_and(
            is_refr, jnp.logical_and(jnp.logical_not(tir),
                                     jnp.logical_not(choose_refl))
        )
        eps_off = jnp.where(transmitted, -config.shading_eps, config.shading_eps)
        nox = hx + eps_off * nlx
        noy = hy + eps_off * nly
        noz = hz + eps_off * nlz

        new_sup = jnp.zeros_like(sup)
        if config.nee_lights:
            # ---- next-event estimation (ops/wavefront.py semantics, fused):
            # cone-sample each light sphere at surviving diffuse vertices,
            # shadow-sweep the scene, add f*Le*cos*omega/pi; inside-shell
            # points skip (plain path tracing keeps them unbiased)
            for slot, li in enumerate(config.nee_lights):
                lcx, lcy, lcz = tbl_ref[li, 0], tbl_ref[li, 1], tbl_ref[li, 2]
                lrr = tbl_ref[li, 3]
                lex, ley, lez = tbl_ref[li, 5], tbl_ref[li, 6], tbl_ref[li, 7]
                swx = lcx - nox
                swy = lcy - noy
                swz = lcz - noz
                d2 = swx * swx + swy * swy + swz * swz
                inside = d2 <= lrr * lrr
                cos_a_max = jnp.sqrt(
                    jnp.maximum(1.0 - (lrr * lrr) / jnp.maximum(d2, 1e-12), 0.0)
                )
                na, nb, _, _ = _pcg4d(
                    wa,
                    wb,
                    pltpu.bitcast(depth, jnp.uint32)
                    + jnp.uint32(
                        (_NEE_SALT + slot * _NEE_SLOT_STRIDE) & 0xFFFFFFFF
                    ),
                    jnp.broadcast_to(k0 + k1, wa.shape),
                )
                nu0 = _to_unit(na)
                nu1 = _to_unit(nb)
                cos_a = 1.0 - nu0 + nu0 * cos_a_max
                sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))
                nphi = jnp.float32(2.0 * np.pi) * nu1
                inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-12))
                swnx = swx * inv_d
                swny = swy * inv_d
                swnz = swz * inv_d
                bigx2 = jnp.abs(swnx) > 0.1
                upx2 = jnp.where(bigx2, 0.0, 1.0)
                upy2 = jnp.where(bigx2, 1.0, 0.0)
                sux = upy2 * swnz
                suy = -upx2 * swnz
                suz = upx2 * swny - upy2 * swnx
                sux, suy, suz = _normalize3(sux, suy, suz)
                svx = swny * suz - swnz * suy
                svy = swnz * sux - swnx * suz
                svz = swnx * suy - swny * sux
                cphi = jnp.cos(nphi) * sin_a
                sphi = jnp.sin(nphi) * sin_a
                ldx = sux * cphi + svx * sphi + swnx * cos_a
                ldy = suy * cphi + svy * sphi + swny * cos_a
                ldz = suz * cphi + svz * sphi + swnz * cos_a
                ldx, ldy, ldz = _normalize3(ldx, ldy, ldz)

                # shadow sweep: occlusion only needs the running min t — the
                # shadow ray is lit iff the light's own candidate IS that min
                # (the light is part of the sweep, so sbt <= t_light always
                # and equality identifies visibility; both values come from
                # the same arithmetic, so the compare is exact)
                t_light = _shadow_tt(nox, noy, noz, ldx, ldy, ldz,
                                     lcx, lcy, lcz, lrr, tbl_ref[li, 4])

                def shadow_body_smem(si, sbt):
                    tt = _shadow_tt(nox, noy, noz, ldx, ldy, ldz,
                                    tbl_ref[si, 0], tbl_ref[si, 1],
                                    tbl_ref[si, 2], tbl_ref[si, 3],
                                    tbl_ref[si, 4])
                    return jnp.minimum(sbt, tt)

                def shadow_body_vmem(c2, sbt):
                    blk = tbl_ref[pl.ds(c2 * 8, 8), :]
                    for r2 in range(8):
                        tt = _shadow_tt(nox, noy, noz, ldx, ldy, ldz,
                                        blk[r2, 0], blk[r2, 1], blk[r2, 2],
                                        blk[r2, 3], blk[r2, 4])
                        sbt = jnp.minimum(sbt, tt)
                    return sbt

                c20 = jnp.full((_SUB, _LANE), _BIG, jnp.float32)
                if table_in_smem:
                    sbt = jax.lax.fori_loop(0, n_spheres, shadow_body_smem, c20)
                else:
                    sbt = jax.lax.fori_loop(
                        0, -(-n_spheres // 8), shadow_body_vmem, c20
                    )
                lit = (t_light < _BIG) & (sbt >= t_light)
                cosine = jnp.maximum(ldx * nlx + ldy * nly + ldz * nlz, 0.0)
                omega = jnp.float32(2.0 * np.pi) * (1.0 - cos_a_max)
                sampled = live_hit & survive & is_diff & jnp.logical_not(inside)
                active = sampled & lit
                scale = cosine * omega * jnp.float32(1.0 / np.pi)
                rx = rx + jnp.where(active, wx * fx_ * lex * scale, 0.0)
                ry = ry + jnp.where(active, wy * fy_ * ley * scale, 0.0)
                rz = rz + jnp.where(active, wz * fz_ * lez * scale, 0.0)
                new_sup = new_sup | jnp.where(sampled, jnp.int32(1 << slot), 0)

        parent = jnp.logical_and(live_hit, survive)
        ox = jnp.where(parent, nox, ox)
        oy = jnp.where(parent, noy, oy)
        oz = jnp.where(parent, noz, oz)
        dx = jnp.where(parent, newdx, dx)
        dy = jnp.where(parent, newdy, dy)
        dz = jnp.where(parent, newdz, dz)
        wx = jnp.where(parent, wx * wfx, wx)
        wy = jnp.where(parent, wy * wfy, wy)
        wz = jnp.where(parent, wz * wfz, wz)
        depth = depth + 1
        alive = jnp.logical_and(parent, depth < config.max_depth)
        return (it + 1, ox, oy, oz, dx, dy, dz, wx, wy, wz, rx, ry, rz,
                depth, s_new, alive.astype(jnp.int32), nrays, m1, m2,
                new_sup, *rec)

    rec0 = tuple(
        jnp.full((_SUB, _LANE), -1, jnp.int32)
        for _ in range(record_depths or 0)
    )
    carry = (jnp.asarray(0, jnp.int32), ox0, oy0, oz0, dx0, dy0, dz0,
             wx0, wy0, wz0, rx0, ry0, rz0, depth0, s_idx0,
             alive0.astype(jnp.int32), nrays0, m10, m20, sup0, *rec0)
    (_, ox, oy, oz, dx, dy, dz, wx, wy, wz, rx, ry, rz, depth, s_idx,
     alive_i, nrays, m1, m2, sup, *rec) = jax.lax.while_loop(
        loop_cond, loop_body, carry)
    alive = alive_i != 0

    # ---- write back ---------------------------------------------------------
    def wf_(i, v):
        f_out[pl.ds(8 * i, 8), :] = v

    def wi_(i, v):
        i_out[pl.ds(8 * i, 8), :] = v

    wf_(_F_OX, ox); wf_(_F_OY, oy); wf_(_F_OZ, oz)
    wf_(_F_DX, dx); wf_(_F_DY, dy); wf_(_F_DZ, dz)
    wf_(_F_WX, wx); wf_(_F_WY, wy); wf_(_F_WZ, wz)
    wf_(_F_RX, rx); wf_(_F_RY, ry); wf_(_F_RZ, rz)
    wf_(_F_M1, m1); wf_(_F_M2, m2)
    wi_(_I_DEPTH, depth)
    wi_(_I_SIDX, s_idx)
    wi_(_I_ALIVE, alive.astype(jnp.int32))
    wi_(_I_RAYS, nrays)
    wi_(_I_SUP, sup)
    # budget plane is read-only inside the kernel — copy through
    i_out[pl.ds(8 * _I_BUDGET, 8), :] = budget
    if record_depths:
        for d in range(record_depths):
            rec_out[pl.ds(8 * d, 8), :] = rec[d]


def build_scene_table(scene: SphereScene, config: RenderConfig) -> jnp.ndarray:
    """(S, 16) f32: [cx cy cz r eps | ex ey ez | ax ay az | refl | id 0...].

    Col 12 carries the ORIGINAL scene index (exact in f32 below 2^24
    spheres): the binned engine permutes rows by accel.order, and the
    INST_ID AOV must report reference-visible ids (smallpt.cpp:182's
    triId false-coloring slot), not table rows."""
    s = scene.n_spheres
    c = jnp.asarray(scene.center, jnp.float32)
    r = jnp.asarray(scene.radius, jnp.float32)
    eps = jnp.maximum(
        jnp.asarray(config.intersect_eps, jnp.float32),
        config.intersect_eps_rel * r,
    )
    m = scene.material
    tbl = jnp.concatenate(
        [
            c, r[:, None], eps[:, None],
            jnp.asarray(m.emission, jnp.float32),
            jnp.asarray(m.albedo, jnp.float32),
            jnp.asarray(m.refl, jnp.float32)[:, None],
            jnp.arange(s, dtype=jnp.float32)[:, None],  # col 12: orig id
            jnp.zeros((s, 3), jnp.float32),  # pad cols 13..15 -> 16 total
        ],
        axis=1,
    )
    pad = (-s) % 8  # VMEM-path chunks of 8; radius-0 rows never hit
    if pad:
        tbl = jnp.concatenate([tbl, jnp.zeros((pad, 16), jnp.float32)])
    return tbl


def build_camera_vec(camera, config: RenderConfig) -> jnp.ndarray:
    """(1, 16) f32 [A(3) B(3) C(3) O(3) push 0 0 0] such that
    raw dir = sx*A + sy*B + C and origin = O + push*dir (cf.
    core/camera.py::generate_rays; sx/sy are scaled 2x for MATRIX)."""
    if config.camera_model == CameraModel.LEGACY:
        if not isinstance(camera, LegacyCamera):
            raise TypeError("LEGACY camera_model needs a LegacyCamera")
        w, h = config.width, config.height
        cx = jnp.stack([
            (w * camera.fov_scale / h).astype(jnp.float32),
            jnp.float32(0.0), jnp.float32(0.0),
        ])
        cy_raw = jnp.cross(cx, camera.direction)
        cy = cy_raw / jnp.linalg.norm(cy_raw) * camera.fov_scale
        vec = jnp.concatenate([
            cx.astype(jnp.float32), cy.astype(jnp.float32),
            camera.direction.astype(jnp.float32),
            camera.origin.astype(jnp.float32),
            camera.push_forward.reshape(1).astype(jnp.float32),
            jnp.zeros((3,), jnp.float32),
        ])
    else:
        if not isinstance(camera, MatrixCamera):
            raise TypeError("MATRIX camera_model needs a MatrixCamera")
        mtx = camera.local_to_world.astype(jnp.float32)
        near = jnp.asarray(camera.near_plane, jnp.float32)
        vec = jnp.concatenate([
            mtx[:3, 0], mtx[:3, 1], mtx[:3, 2] * near, mtx[:3, 3],
            jnp.zeros((1,), jnp.float32), jnp.zeros((3,), jnp.float32),
        ])
    return vec.reshape(1, 16)


@functools.partial(
    jax.jit, static_argnames=("config", "interpret", "n_rows")
)
def render_pass_megakernel(
    scene: SphereScene,
    camera,
    config: RenderConfig,
    key: jax.Array,
    ip_offset=0,
    row_offset=0,
    n_rows: int | None = None,
    k_samples: int | None = None,
    interpret: bool | None = None,
):
    """One regenerative pass over a row band. Returns ((n_rows, W, 3) summed
    radiance, rays_traced) — semantics of renderer.render_with_stats for the
    REGEN scheduler, computed by the fused Pallas bounce kernel.

    Sharding hooks (parallel/shard.py): row_offset/n_rows select the shard's
    tile band; ip_offset/k_samples give it a disjoint slice of each pixel's
    in-pixel sample axis. Defaults render the whole frame single-chip."""
    if config.split_budget != 1:
        raise ValueError("megakernel requires split_budget == 1")
    if config.mode != Mode.FULL:
        raise ValueError("megakernel renders Mode.FULL only")
    if scene.n_spheres > MAX_VMEM_SPHERES:
        raise ValueError(
            f"megakernel supports <= {MAX_VMEM_SPHERES} spheres"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    if n_rows is None:
        n_rows = config.height
    if k_samples is None:
        k_samples = config.spp
    G = n_rows * config.width
    n_tiles = -(-G // _TILE)
    g_pad = n_tiles * _TILE
    n_cols = g_pad // _SUB

    kw = jax.random.key_data(key).astype(jnp.uint32).reshape(1, -1)[:, :2]
    ip = jnp.stack([
        jnp.asarray(ip_offset, jnp.int32),
        jnp.asarray(row_offset, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(k_samples * config.max_depth, jnp.int32),
    ]).reshape(1, 4)
    cam_vec = build_camera_vec(camera, config)
    table = build_scene_table(scene, config)

    f0, i0 = init_stream_state(config, n_rows)
    i0 = set_sample_budget(i0, k_samples, config, n_rows)

    grid = (n_tiles,)
    table_in_smem = scene.n_spheres <= MAX_SMEM_SPHERES
    kernel = functools.partial(
        _mega_kernel,
        config=config,
        n_spheres=scene.n_spheres,
        n_cols=n_cols,
        streaming=False,
        table_in_smem=table_in_smem,
    )
    table_spec = (
        pl.BlockSpec(memory_space=pltpu.SMEM)
        if table_in_smem
        else pl.BlockSpec((table.shape[0], 16), lambda t: (0, 0),
                          memory_space=pltpu.VMEM)
    )
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                     # kw
            pl.BlockSpec(memory_space=pltpu.SMEM),                     # ip
            pl.BlockSpec(memory_space=pltpu.SMEM),                     # cam
            table_spec,                                                # table
            pl.BlockSpec((_SUB * _NF, _LANE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),                     # f
            pl.BlockSpec((_SUB * _NI, _LANE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),                     # i
        ],
        out_specs=[
            pl.BlockSpec((_SUB * _NF, _LANE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUB * _NI, _LANE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((_SUB * _NF, n_cols), jnp.float32),
            jax.ShapeDtypeStruct((_SUB * _NI, n_cols), jnp.int32),
        ],
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )

    # ONE kernel launch renders the whole pass: each tile drains its own
    # lanes with an in-kernel while loop (persistent-wavefront design) —
    # no per-bounce HBM round trip, no global straggler barrier.
    f, i = call(kw, ip, cam_vec, table, f0, i0)
    # per-lane counts are small ints; sum in f32 so multi-billion-ray passes
    # don't wrap int32 (f32 is exact below 2^24 and magnitude-true above)
    rays = jnp.sum(
        jax.lax.dynamic_slice_in_dim(i, 8 * _I_RAYS, 8, axis=0)
        .astype(jnp.float32)
    )

    rad = jnp.stack(
        [
            f[8 * _F_RX:8 * _F_RX + 8].reshape(-1)[:G],
            f[8 * _F_RY:8 * _F_RY + 8].reshape(-1)[:G],
            f[8 * _F_RZ:8 * _F_RZ + 8].reshape(-1)[:G],
        ],
        axis=-1,
    ).astype(jnp.dtype(config.dtype))
    return rad.reshape(n_rows, config.width, 3), rays


@functools.partial(
    jax.jit,
    static_argnames=("config", "interpret", "n_rows", "k_samples"),
)
def render_record_megakernel(
    scene: SphereScene,
    camera,
    config: RenderConfig,
    key: jax.Array,
    ip_offset=0,
    row_offset=0,
    n_rows: int | None = None,
    k_samples: int | None = None,
    interpret: bool | None = None,
):
    """Forward pass at megakernel speed, recording per-(sample, depth)
    winner sphere ids — the fast recorder of the recorded-winner replay
    differentiator (grad/replay.py).

    Returns (SUMMED radiance image (n_rows, W, 3) over k_samples — the
    render_pass_megakernel convention, so sharded callers can psum partial
    sums exactly — winners (max_depth, L) int32 with -1 for miss/dead in
    FLAT lane order (lane = local_pixel * k_samples + s), rays traced).
    One fused launch per in-pixel sample index s: budget-1 keeps the
    kernel in depth lockstep (every live lane at iteration `it` is at
    depth `it` — see _mega_kernel's record_depths), and the kernel keying
    (sid = pixel * spp + ip with ip = ip_offset + s) makes launch s's
    streams exactly the FLAT scheduler's corresponding samples.

    Sharding hooks mirror render_pass_megakernel: row_offset/n_rows select
    a tile band, ip_offset/k_samples a slice of the in-pixel sample axis."""
    if config.split_budget != 1:
        raise ValueError("megakernel requires split_budget == 1")
    if config.mode != Mode.FULL:
        raise ValueError("megakernel renders Mode.FULL only")
    if scene.n_spheres > MAX_VMEM_SPHERES:
        raise ValueError(
            f"megakernel supports <= {MAX_VMEM_SPHERES} spheres"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    D = config.max_depth
    if n_rows is None:
        n_rows = config.height
    if k_samples is None:
        k_samples = config.spp
    G = n_rows * config.width
    n_tiles = -(-G // _TILE)
    g_pad = n_tiles * _TILE
    n_cols = g_pad // _SUB

    kw = jax.random.key_data(key).astype(jnp.uint32).reshape(1, -1)[:, :2]
    cam_vec = build_camera_vec(camera, config)
    table = build_scene_table(scene, config)
    table_in_smem = scene.n_spheres <= MAX_SMEM_SPHERES
    kernel = functools.partial(
        _mega_kernel,
        config=config,
        n_spheres=scene.n_spheres,
        n_cols=n_cols,
        streaming=False,
        table_in_smem=table_in_smem,
        record_depths=D,
    )
    table_spec = (
        pl.BlockSpec(memory_space=pltpu.SMEM)
        if table_in_smem
        else pl.BlockSpec((table.shape[0], 16), lambda t: (0, 0),
                          memory_space=pltpu.VMEM)
    )
    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                     # kw
            pl.BlockSpec(memory_space=pltpu.SMEM),                     # ip
            pl.BlockSpec(memory_space=pltpu.SMEM),                     # cam
            table_spec,                                                # table
            pl.BlockSpec((_SUB * _NF, _LANE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),                     # f
            pl.BlockSpec((_SUB * _NI, _LANE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),                     # i
        ],
        out_specs=[
            pl.BlockSpec((_SUB * _NF, _LANE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUB * _NI, _LANE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUB * D, _LANE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((_SUB * _NF, n_cols), jnp.float32),
            jax.ShapeDtypeStruct((_SUB * _NI, n_cols), jnp.int32),
            jax.ShapeDtypeStruct((_SUB * D, n_cols), jnp.int32),
        ],
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )

    rad_sum = jnp.zeros((G, 3), jnp.float32)
    rays = jnp.asarray(0.0, jnp.float32)
    recs = []
    for s in range(k_samples):
        f0, i0 = init_stream_state(config, n_rows)
        i0 = set_sample_budget(i0, 1, config, n_rows)
        ip = jnp.stack([
            jnp.asarray(ip_offset, jnp.int32) + s,
            jnp.asarray(row_offset, jnp.int32),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(D, jnp.int32),
        ]).reshape(1, 4)
        f, i, rec = call(kw, ip, cam_vec, table, f0, i0)
        rad_sum = rad_sum + jnp.stack(
            [
                f[8 * _F_RX:8 * _F_RX + 8].reshape(-1)[:G],
                f[8 * _F_RY:8 * _F_RY + 8].reshape(-1)[:G],
                f[8 * _F_RZ:8 * _F_RZ + 8].reshape(-1)[:G],
            ],
            axis=-1,
        )
        rays = rays + jnp.sum(
            jax.lax.dynamic_slice_in_dim(i, 8 * _I_RAYS, 8, axis=0)
            .astype(jnp.float32)
        )
        recs.append(rec.reshape(D, _SUB * n_cols)[:, :G])  # (D, G)
    # FLAT lane order: lane = local_pixel * k_samples + s
    winners = (
        jnp.stack(recs, axis=0)          # (k, D, G)
        .transpose(1, 2, 0)              # (D, G, k)
        .reshape(D, G * k_samples)
    )
    img = rad_sum.astype(jnp.dtype(config.dtype))
    return img.reshape(n_rows, config.width, 3), winners, rays


# ---------------------------------------------------------------------------
# Streaming mode: persistent path state ACROSS passes — lanes regenerate
# continuously at ~full occupancy; samples complete across step boundaries
# (no drain barrier per pass, unlike render_pass_megakernel). The display
# normalizes by per-pixel COMPLETED sample counts; after flush() the image is
# the exact MC estimate. See engine/streaming.py for the driver.
# ---------------------------------------------------------------------------


def _stream_geometry(config: RenderConfig, n_rows: int | None):
    if n_rows is None:
        n_rows = config.height
    G = n_rows * config.width
    n_tiles = -(-G // _TILE)
    n_cols = n_tiles * _TILE // _SUB
    return n_rows, G, n_tiles, n_cols


def init_stream_state(config: RenderConfig, n_rows: int | None = None):
    """Fresh (f, i) streaming state: all lanes dead, zero sample budget
    (padded lanes beyond the image keep budget 0 forever)."""
    n_rows, G, n_tiles, n_cols = _stream_geometry(config, n_rows)
    f0 = jnp.zeros((_SUB * _NF, n_cols), jnp.float32)
    i0 = jnp.concatenate(
        [
            jnp.zeros((_SUB, n_cols), jnp.int32),            # depth
            jnp.full((_SUB, n_cols), -1, jnp.int32),         # s_idx
            jnp.zeros((_SUB, n_cols), jnp.int32),            # alive
            jnp.zeros((_SUB, n_cols), jnp.int32),            # rays
            jnp.zeros((_SUB, n_cols), jnp.int32),            # budget
            jnp.zeros((_SUB, n_cols), jnp.int32),            # NEE suppress
        ],
        axis=0,
    )
    return f0, i0


def set_sample_budget(i, budgets, config: RenderConfig,
                      n_rows: int | None = None, accumulate_max: bool = True):
    """Write the per-lane sample-budget plane.

    budgets: scalar (uniform) or a (G,) int array (adaptive sampling: each
    pixel gets its own allowance). Padded lanes stay at 0. With
    accumulate_max (default) the plane only grows — budgets are monotone
    across a stream's life."""
    n_rows, G, n_tiles, n_cols = _stream_geometry(config, n_rows)
    lane = jnp.arange(_SUB)[:, None] * n_cols + jnp.arange(n_cols)[None, :]
    b = jnp.asarray(budgets, jnp.int32)
    if b.ndim == 0:
        plane = jnp.broadcast_to(b, (_SUB, n_cols))
    else:
        pad = _SUB * n_cols - G
        plane = jnp.concatenate(
            [b, jnp.zeros((pad,), jnp.int32)]
        ).reshape(_SUB, n_cols)
    plane = jnp.where(lane < G, plane, 0)
    old = jax.lax.dynamic_slice_in_dim(i, 8 * _I_BUDGET, 8, axis=0)
    if accumulate_max:
        plane = jnp.maximum(plane, old)
    return jax.lax.dynamic_update_slice_in_dim(i, plane, 8 * _I_BUDGET, axis=0)


@functools.partial(jax.jit, static_argnames=("has_nee",))
def _stream_pending_dev(i, has_nee: bool = False):
    s_idx = jax.lax.dynamic_slice_in_dim(i, 8 * _I_SIDX, 8, axis=0)
    alive = jax.lax.dynamic_slice_in_dim(i, 8 * _I_ALIVE, 8, axis=0)
    bud = jax.lax.dynamic_slice_in_dim(i, 8 * _I_BUDGET, 8, axis=0)
    live = alive != 0
    if has_nee:
        # a dead lane with unresolved deferred-shadow bits still owes work
        neep = jax.lax.dynamic_slice_in_dim(i, 8 * _I_NEEP, 8, axis=0)
        live = live | (neep != 0)
    return jnp.stack([
        jnp.sum(live),
        jnp.sum(jnp.logical_not(live) & (s_idx < bud - 1)),
    ])


def stream_pending(i):
    """(n_alive, n_can_regen) — drain is complete when both are zero.
    Packed into ONE device fetch: each host fetch pays a full axon-tunnel
    round trip (~30 ms), so two separate int() calls doubled the cost."""
    both = np.asarray(_stream_pending_dev(i))
    return (int(both[0]), int(both[1]))


@functools.partial(
    jax.jit, static_argnames=("config", "interpret", "n_rows")
)
def stream_step(
    scene: SphereScene,
    camera,
    config: RenderConfig,
    key: jax.Array,
    f: jnp.ndarray,
    i: jnp.ndarray,
    sample_budget,
    n_iters,
    ip_offset=0,
    row_offset=0,
    n_rows: int | None = None,
    interpret: bool | None = None,
):
    """Advance the streaming wavefront by up to n_iters bounce iterations.

    sample_budget: total per-lane sample allowance so far (monotone across
    steps); lanes regenerate while s_idx < budget-1. Pass None to leave the
    per-lane budget plane untouched (adaptive sampling sets it directly via
    set_sample_budget). Returns (f, i, rays). The keying is
    streaming-specific (v2: pixel and ip as separate PCG4D words,
    core/rng.py::stream_key_words — unique streams for any ip): one key serves the
    whole stream, so do NOT fold per-step keys."""
    if config.split_budget != 1:
        raise ValueError("streaming requires split_budget == 1")
    if config.mode != Mode.FULL:
        raise ValueError("streaming renders Mode.FULL only")
    if scene.n_spheres > MAX_VMEM_SPHERES:
        raise ValueError(
            f"megakernel supports <= {MAX_VMEM_SPHERES} spheres"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_rows, G, n_tiles, n_cols = _stream_geometry(config, n_rows)
    if sample_budget is not None:
        i = set_sample_budget(i, sample_budget, config, n_rows)

    kw = jax.random.key_data(key).astype(jnp.uint32).reshape(1, -1)[:, :2]
    ip = jnp.stack([
        jnp.asarray(ip_offset, jnp.int32),
        jnp.asarray(row_offset, jnp.int32),
        jnp.asarray(0, jnp.int32),  # (reserved; budget lives in its plane)
        jnp.asarray(n_iters, jnp.int32),
    ]).reshape(1, 4)
    cam_vec = build_camera_vec(camera, config)
    table = build_scene_table(scene, config)

    table_in_smem = scene.n_spheres <= MAX_SMEM_SPHERES
    kernel = functools.partial(
        _mega_kernel,
        config=config,
        n_spheres=scene.n_spheres,
        n_cols=n_cols,
        streaming=True,
        table_in_smem=table_in_smem,
    )
    table_spec = (
        pl.BlockSpec(memory_space=pltpu.SMEM)
        if table_in_smem
        else pl.BlockSpec((table.shape[0], 16), lambda t: (0, 0),
                          memory_space=pltpu.VMEM)
    )
    rays_plane_before = jax.lax.dynamic_slice_in_dim(
        i, 8 * _I_RAYS, 8, axis=0
    )
    f, i = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            table_spec,
            pl.BlockSpec((_SUB * _NF, _LANE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUB * _NI, _LANE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_SUB * _NF, _LANE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUB * _NI, _LANE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((_SUB * _NF, n_cols), jnp.float32),
            jax.ShapeDtypeStruct((_SUB * _NI, n_cols), jnp.int32),
        ],
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )(kw, ip, cam_vec, table, f, i)
    # rays THIS launch: per-lane int32 delta, summed exactly. Differencing
    # two f32 sums of the cumulative plane loses small deltas once the
    # cumulative count passes 2^24 (observed: a drain-progress check read 0
    # rays from a live tail at ~30M cumulative and aborted the flush).
    rays = jnp.sum(
        jax.lax.dynamic_slice_in_dim(i, 8 * _I_RAYS, 8, axis=0)
        - rays_plane_before
    )
    return f, i, rays


@functools.partial(jax.jit, static_argnames=("config", "n_rows"))
def stream_image(f, i, config: RenderConfig, n_rows: int | None = None):
    """(radiance (n_rows, W, 3), completed-sample weight (n_rows, W)).

    radiance includes the in-flight sample's partial contribution (live-view
    approximation); weight counts COMPLETED samples = s_idx + 1 - alive.
    After a drain (no live lanes) the pair is the exact sums for
    WeightedAccum-style normalization."""
    n_rows, G, _, _ = _stream_geometry(config, n_rows)
    rad = jnp.stack(
        [
            f[8 * _F_RX:8 * _F_RX + 8].reshape(-1)[:G],
            f[8 * _F_RY:8 * _F_RY + 8].reshape(-1)[:G],
            f[8 * _F_RZ:8 * _F_RZ + 8].reshape(-1)[:G],
        ],
        axis=-1,
    ).astype(jnp.dtype(config.dtype))
    s_idx = jax.lax.dynamic_slice_in_dim(i, 8 * _I_SIDX, 8, axis=0)
    alive = jax.lax.dynamic_slice_in_dim(i, 8 * _I_ALIVE, 8, axis=0)
    done = (s_idx + 1 - alive).reshape(-1)[:G].astype(jnp.dtype(config.dtype))
    return (
        rad.reshape(n_rows, config.width, 3),
        done.reshape(n_rows, config.width),
    )


@functools.partial(jax.jit, static_argnames=("config", "n_rows"))
def stream_variance(f, i, config: RenderConfig, n_rows: int | None = None):
    """Per-pixel (mean, variance, n) of completed-sample luminances — the
    signal driving adaptive sampling. The kernel records a sample's
    luminance at the NEXT regeneration; a lane that went idle with budget
    exhausted has its final sample completed here on the host side."""
    n_rows, G, _, _ = _stream_geometry(config, n_rows)

    def plane(buf, idx):
        return jax.lax.dynamic_slice_in_dim(buf, 8 * idx, 8, axis=0)

    m1 = plane(f, _F_M1)
    m2 = plane(f, _F_M2)
    rad_lum = (
        plane(f, _F_RX) + plane(f, _F_RY) + plane(f, _F_RZ)
    ) * jnp.float32(1.0 / 3.0)
    alive = plane(i, _I_ALIVE) != 0
    s_idx = plane(i, _I_SIDX)
    # idle lanes: fold the unrecorded final sample in
    delta = rad_lum - m1
    m2 = jnp.where(~alive & (s_idx >= 0), m2 + delta * delta, m2)
    m1 = jnp.where(~alive & (s_idx >= 0), rad_lum, m1)
    n = (s_idx + 1 - alive.astype(jnp.int32)).astype(jnp.float32)
    n_safe = jnp.maximum(n, 1.0)
    mean = m1 / n_safe
    var = jnp.maximum(m2 / n_safe - mean * mean, 0.0)
    shape = (n_rows, config.width)
    return (
        mean.reshape(-1)[:G].reshape(shape),
        var.reshape(-1)[:G].reshape(shape),
        n.reshape(-1)[:G].reshape(shape),
    )


# ---------------------------------------------------------------------------
# BINNED streaming: the culled-sweep bounce kernel for big scenes.
#
# One bounce per launch (chunk lists are computed per bounce outside —
# ops/accel.py::tile_chunk_lists — so an in-kernel multi-bounce loop would
# outrun its own lists). Tiles are 1024 lanes (accel.LANE_B columns) — the
# coherence granularity of the sort-binned scheduler. State carries an
# explicit pixel plane (_I_PIXEL): lanes are free to move between tiles
# (periodic bin sort), and sample streams stay placement-invariant because
# streaming keying v2 depends only on (pixel, ip).
#
# Sweep = global spheres (giant walls/light, always) + ONLY the tile's
# listed local chunks; the winner-select material pass walks the same short
# sequence, so the material-fold cost that capped the classic megakernel at
# MEGA_MAX_SPHERES scales down with culling too.
# ---------------------------------------------------------------------------

# lanes per binned tile column block — the coherence/culling granularity of
# the binned scheduler (smaller tiles -> tighter per-tile chunk lists but
# more grid steps). Env-overridable for tuning sweeps; ops/accel.py reads
# this value so the two modules always agree.
_LANE_B = int(os.environ.get("SMALLPT_TPU_BINNED_LANE", "1024"))
_I_PIXEL = 6           # extra int plane in binned state (after classic 6)
_I_PEND = 7            # bounce-in-progress flag (distance-ordered sweep:
                       # the near prefix didn't bound this lane's hit)
_NI_B = _NI + 2
# extra float planes: the carried closest-hit candidate of a pending lane
_F_BT = _NF            # best candidate t so far (_BIG when none)
_F_BID = _NF + 1       # winning table row id (float), -1 when none
_F_TS = _NF + 2        # resolved-frontier distance: every potential hit
                       # with t < ts has already been folded into (bt, bi).
                       # Pending lanes MARCH: ts += dcut each launch, and
                       # the list builders bin the lane by its frontier
                       # point o + ts*d — so a long free flight crosses the
                       # scene in O(span/prefix-radius) cheap prefix
                       # launches instead of forcing its whole tile to a
                       # full-reach sweep (196 ms vs 18 ms, measured r3)
_NF_B = _NF + 3
# NEE planes (allocated only when config.nee_lights — the binned state is
# sized by _nf_b/_ni_b so the non-NEE path pays nothing). The binned NEE
# is DEFERRED BY ONE LAUNCH: a diffuse vertex marks per-slot pending bits
# (_I_NEEP) and stores its shading normal; the next launch's XLA prep
# stage (ops/accel.py::nee_shadow_prep) draws the light-cone direction —
# ONCE, so bin keys and the kernel sweep see bit-identical rays — and the
# list builder unions the shadow rays' reach into the tile lists (forced
# bucket 0: occlusion must resolve in a single launch); the kernel then
# folds per-slot occluder minima through the SAME chunk walk as the main
# sweep and adds the direct term. This keeps the reference's accelerated
# backend feature-universal (smallpt.cpp:605 serves shadePaths' whole
# material set) without per-vertex full sweeps.
_F_NLX = _NF_B       # vertex shading normal (cosine term at resolve)
_F_NLY = _NF_B + 1
_F_NLZ = _NF_B + 2
_F_LD0 = _NF_B + 3   # + 3 planes PER LIGHT SLOT: the XLA-drawn shadow dir
_I_NEEP = _NI_B      # per-slot pending-shadow bits


def _nf_b(config) -> int:
    n = _NF_B
    if config.nee_lights:
        n += 3 + 3 * len(config.nee_lights)
    return n


def _ni_b(config) -> int:
    return _NI_B + (1 if config.nee_lights else 0)


# chunks swept in a NEAR pass (per tile, distance-ordered prefix); tiles
# holding pending lanes sweep their full list instead
K_NEAR = int(os.environ.get("SMALLPT_TPU_BINNED_KNEAR", "64"))

# Sample-index stride between a pixel's in-flight sub-lanes: with
# ``inflight`` = M > 1 the binned state carries M lanes per pixel (lane id
# q = pixel*M + sub), each drawing samples ip = sub*STRIDE + s_idx from
# the pixel's stream. Keying v2 is injective in ip, so sub-lanes never
# collide while per-sub budgets stay below the stride. Oversubscription
# amortizes the tunnel's fixed per-launch latency (~24 ms for the 3-hop
# bounce chain, measured round 3) over M× more rays per launch and cuts
# the drain tail (each sub-lane drains spp/M samples, and the max over
# G×M short queues is far below the max over G long ones).
_BINNED_SUB_STRIDE = 1 << 20


def _binned_kernel(
    stp_ref,     # (T,) int32 scalar-prefetch: list entries to sweep this
                 # launch; -1 => sweep every local chunk (list overflow)
    lst_ref,     # (T, l_max) int32 scalar-prefetch: chunk ids ordered
                 # near -> far from the tile's origin AABB
    dct_ref,     # (T,) f32 scalar-prefetch: finality bound — a lane whose
                 # best hit t is closer than frontier + dcut cannot be
                 # beaten by any unswept chunk (all chunks within dcut of
                 # the tile's frontier boxes are in the swept prefix)
    kw_ref,      # (1, 2) uint32 SMEM key words
    ipv_ref,     # (1, 4) int32 SMEM: [ip_offset, 0, 0, 0]
    tbl_ref,     # (S_pad, 16) f32 VMEM: global chunks then local chunks
    f_ref, i_ref, f_out, i_out,
    *,
    config: RenderConfig,
    n_glob_chunks: int,
    n_chunks: int,
    inflight: int = 1,
    geo_lo: tuple = (-3e38, -3e38, -3e38),
    geo_hi: tuple = (3e38, 3e38, 3e38),
    nee_rows: tuple = (),
):
    """One FRONTIER-MARCHING culled bounce step.

    The BVH-replacement insight for lock-step hardware: per-ray early-out
    is impossible (8x128 lanes retire together), but a TILE can sweep its
    reachable chunks nearest-first and then declare each lane FINAL whose
    closest hit is nearer than the distance bound of everything unswept.
    With the 10k-sphere scene's short mean free path most lanes finalize
    within a small prefix (K_NEAR chunks); the rest carry their partial
    (bt, bi) AND MARCH their resolved frontier ts += dcut — the list
    builders bin a pending lane by its frontier point o + ts*d, so the
    next launch sweeps the chunks just beyond the frontier instead of the
    whole reach list (the round-3 predecessor forced any tile holding one
    pending lane to a full-reach sweep: 196 ms vs 18 ms measured).
    Finality is per-lane, bt < ts + dcut: every unswept chunk is at least
    dcut from the lane's frontier point, so any unswept hit has
    t >= ts + dcut. Lanes whose frontier left the local-geometry AABB
    moving outward finalize unconditionally (no local hit can remain;
    globals are folded every launch) — open-scene miss lanes terminate in
    O(span/dcut) marches instead of pending forever. Pending lanes
    re-sweep idempotently (min-fold), so correctness never depends on
    which tile a lane lands in, and a finalizing lane's carried winner is
    always inside the swept prefix: its chunk is within bt - ts < dcut of
    the frontier (escape-finalized local winners satisfy gap == 0 and the
    builders always sweep every gap < d0 entry)."""
    t = pl.program_id(0)
    shp = (_SUB, _LANE_B)

    fplane = lambda idx: f_ref[pl.ds(8 * idx, 8), :]
    iplane = lambda idx: i_ref[pl.ds(8 * idx, 8), :]

    ox = fplane(_F_OX); oy = fplane(_F_OY); oz = fplane(_F_OZ)
    dx = fplane(_F_DX); dy = fplane(_F_DY); dz = fplane(_F_DZ)
    wx = fplane(_F_WX); wy = fplane(_F_WY); wz = fplane(_F_WZ)
    rx = fplane(_F_RX); ry = fplane(_F_RY); rz = fplane(_F_RZ)
    m1 = fplane(_F_M1); m2 = fplane(_F_M2)
    bt0 = fplane(_F_BT); bi0 = fplane(_F_BID)
    ts = fplane(_F_TS)
    depth = iplane(_I_DEPTH)
    s_idx = iplane(_I_SIDX)
    alive = iplane(_I_ALIVE) != 0
    nrays = iplane(_I_RAYS)
    budget = iplane(_I_BUDGET)
    pixel = iplane(_I_PIXEL)
    if nee_rows:
        sup = iplane(_I_SUP)       # suppression bits (vertex -> next hit)
        neep = iplane(_I_NEEP)     # pending shadow bits (vertex -> resolve)
        vnlx = fplane(_F_NLX)      # vertex shading normal
        vnly = fplane(_F_NLY)
        vnlz = fplane(_F_NLZ)
        lds = [
            (fplane(_F_LD0 + 3 * s), fplane(_F_LD0 + 3 * s + 1),
             fplane(_F_LD0 + 3 * s + 2))
            for s in range(len(nee_rows))
        ]

    k0 = kw_ref[0, 0]
    k1 = kw_ref[0, 1]
    ip_offset = ipv_ref[0, 0]

    # regeneration happens in XLA between launches (regen_binned): here
    # every lane that traces this bounce is already alive; the kernel only
    # derives the lane's RNG words from its (pixel, current sample) pair.
    # The pixel plane carries q = pixel*inflight + sub (lane id layout);
    # sub-lane samples live at ip = sub*_BINNED_SUB_STRIDE + s_idx.
    shift = inflight.bit_length() - 1
    pix = jax.lax.shift_right_logical(pixel, shift) if shift else pixel
    sub = pixel - jax.lax.shift_left(pix, shift) if shift else None
    ip = ip_offset + s_idx
    if shift:
        ip = ip + sub * jnp.int32(_BINNED_SUB_STRIDE)
    wa = pltpu.bitcast(pix, jnp.uint32) ^ k0
    wb = k1 ^ (pltpu.bitcast(ip, jnp.uint32) * jnp.uint32(_STREAM_IP_MULT))

    # ---- distance-ordered culled sweep -----------------------------------
    # With NEE: per-slot shadow-occluder minima fold through the SAME chunk
    # walk (the shadow rays' reach is unioned into this launch's lists by
    # nee_shadow_prep + the builder, so the swept set covers the full
    # segment; the light itself is in the global block, so equality with
    # t_light identifies visibility exactly as in the classic kernel).
    def chunk_fold(cid, carry):
        bt, bi = carry[0], carry[1]
        sbts = carry[2:]
        blk = tbl_ref[pl.ds(cid * 8, 8), :]
        for r in range(8):
            tt = _shadow_tt(ox, oy, oz, dx, dy, dz,
                            blk[r, 0], blk[r, 1], blk[r, 2],
                            blk[r, 3], blk[r, 4])
            better = tt < bt
            sid_f = (cid * 8 + r).astype(jnp.float32)
            bt = jnp.where(better, tt, bt)
            bi = jnp.where(better, sid_f, bi)
            if nee_rows:
                sbts = tuple(
                    jnp.minimum(
                        sbt,
                        _shadow_tt(ox, oy, oz, ldx_s, ldy_s, ldz_s,
                                   blk[r, 0], blk[r, 1], blk[r, 2],
                                   blk[r, 3], blk[r, 4]),
                    )
                    for sbt, (ldx_s, ldy_s, ldz_s) in zip(sbts, lds)
                )
        return (bt, bi) + tuple(sbts)

    stop = stp_ref[t]
    full_sweep = stop < 0
    n_eff = jnp.where(full_sweep, n_chunks, stop)

    l_max = lst_ref.shape[1]

    def local_cid(j):
        # jnp.where evaluates both branches: on a full sweep j runs to
        # n_chunks-1 which can exceed l_max, so the (discarded) list read
        # must be clamped — an unclamped SMEM read past the buffer is UB on
        # Mosaic even though the value never matters (ADVICE r2)
        return n_glob_chunks + jnp.where(
            full_sweep, j, lst_ref[t, jnp.minimum(j, l_max - 1)]
        )

    # carried candidates resume (fresh lanes hold (_BIG, -1)); globals are
    # re-swept every launch — idempotent for the min-fold, and they give
    # every lane a wall-hit bound immediately
    carry0 = (bt0, bi0) + tuple(
        jnp.full(shp, _BIG, jnp.float32) for _ in nee_rows
    )
    carry = jax.lax.fori_loop(
        0, n_glob_chunks, lambda c, cr: chunk_fold(c, cr), carry0
    )
    carry = jax.lax.fori_loop(
        0, n_eff, lambda j, c: chunk_fold(local_cid(j), c), carry
    )
    bt, bi = carry[0], carry[1]
    sbts = carry[2:]

    if nee_rows:
        # ---- deferred shadow resolution: bits were set at the PREVIOUS
        # vertex; the weight planes still equal w_vertex * f (weights
        # change only at shading events and the lane has had none since),
        # so the direct term is w * Le * cos * omega / pi — exactly the
        # classic kernel's contribution, one launch later. The resolve is
        # independent of `alive`: a lane that died AT its vertex (max
        # depth) still resolves here, and regen_binned refuses to recycle
        # it until its bits clear.
        for slot, row in enumerate(nee_rows):
            ldx_s, ldy_s, ldz_s = lds[slot]
            lcx, lcy, lcz = tbl_ref[row, 0], tbl_ref[row, 1], tbl_ref[row, 2]
            lrr = tbl_ref[row, 3]
            lex, ley, lez = tbl_ref[row, 5], tbl_ref[row, 6], tbl_ref[row, 7]
            pendb = ((neep >> slot) & 1) == 1
            t_light = _shadow_tt(ox, oy, oz, ldx_s, ldy_s, ldz_s,
                                 lcx, lcy, lcz, lrr, tbl_ref[row, 4])
            swx = lcx - ox
            swy = lcy - oy
            swz = lcz - oz
            d2 = swx * swx + swy * swy + swz * swz
            cos_a_max = jnp.sqrt(jnp.maximum(
                1.0 - (lrr * lrr) / jnp.maximum(d2, 1e-12), 0.0
            ))
            omega = jnp.float32(2.0 * np.pi) * (1.0 - cos_a_max)
            cosine = jnp.maximum(
                ldx_s * vnlx + ldy_s * vnly + ldz_s * vnlz, 0.0
            )
            lit = jnp.logical_and(t_light < _BIG, sbts[slot] >= t_light)
            active = jnp.logical_and(pendb, lit)
            scale = cosine * omega * jnp.float32(1.0 / np.pi)
            rx = rx + jnp.where(active, wx * lex * scale, 0.0)
            ry = ry + jnp.where(active, wy * ley * scale, 0.0)
            rz = rz + jnp.where(active, wz * lez * scale, 0.0)

    d_cut = dct_ref[t]
    # frontier escape: all LOCAL spheres live inside the static AABB
    # [geo_lo, geo_hi] (chunk-extent union, baked at trace time). Once the
    # resolved frontier ts passes the ray's box-exit distance — or the ray
    # never meets the box at all — no unfolded local hit can exist, and the
    # per-launch global fold makes bt the true minimum. Degenerate-equality
    # local winners have frontier gap 0 (their chunk contains the frontier
    # point) and the list builders always sweep every gap < d0 entry, so
    # the winner-select below still finds them.
    def _slab(o_, d_, lo_, hi_):
        inv = 1.0 / jnp.where(jnp.abs(d_) < 1e-20, jnp.float32(1e-20), d_)
        t1 = (lo_ - o_) * inv
        t2 = (hi_ - o_) * inv
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    e1, x1 = _slab(ox, dx, jnp.float32(geo_lo[0]), jnp.float32(geo_hi[0]))
    e2, x2 = _slab(oy, dy, jnp.float32(geo_lo[1]), jnp.float32(geo_hi[1]))
    e3, x3 = _slab(oz, dz, jnp.float32(geo_lo[2]), jnp.float32(geo_hi[2]))
    t_enter = jnp.maximum(e1, jnp.maximum(e2, e3))
    t_exit = jnp.minimum(x1, jnp.minimum(x2, x3))
    escaped = jnp.logical_or(ts >= t_exit, t_enter > t_exit)

    final = jnp.logical_and(
        alive, jnp.logical_or(bt < ts + d_cut, escaped)
    )
    pend_out = jnp.logical_and(alive, jnp.logical_not(final))
    nrays = nrays + final.astype(jnp.int32)

    # winner-select walks the same swept sequence; near tiles hold no
    # pending lanes (the list builder forces them to full sweeps), so a
    # final lane's winner is always among globals + the swept prefix
    # INST_ID additionally selects col 12 (the winner's ORIGINAL scene id)
    _sel_cols = (5, 6, 7, 8, 9, 10, 11, 0, 1, 2, 3) + (
        (12,) if config.mode == Mode.INST_ID else ()
    )

    def pick_chunk(cid, vals):
        blk = tbl_ref[pl.ds(cid * 8, 8), :]
        for r in range(8):
            m = bi == (cid * 8 + r).astype(jnp.float32)
            vals = [
                jnp.where(m, blk[r, col], v)
                for col, v in zip(_sel_cols, vals)
            ]
        return vals

    vals0 = [jnp.zeros(shp, jnp.float32)] * 10 + [jnp.ones(shp, jnp.float32)]
    if config.mode == Mode.INST_ID:
        vals0 = vals0 + [jnp.full(shp, -1.0, jnp.float32)]
    vals = jax.lax.fori_loop(
        0, n_glob_chunks, lambda c, v: pick_chunk(c, v), vals0
    )
    vals = jax.lax.fori_loop(
        0, n_eff, lambda j, v: pick_chunk(local_cid(j), v), vals
    )
    (em_x, em_y, em_z, al_x, al_y, al_z, refl, bcx, bcy, bcz, br) = vals[:11]

    hit = bt < _BIG
    live_hit = jnp.logical_and(final, hit)

    if config.has_env and config.mode == Mode.FULL:
        # environment pickup for lanes FINALIZING as misses this launch
        # (smallpt.cpp:168 hook; AOV modes skip misses). Pending lanes must
        # not collect: they may still find a hit on a later chunk sweep —
        # `final` already excludes them (escape-finalized lanes have swept
        # everything reachable, so bt == _BIG there is a true miss).
        miss_final = jnp.logical_and(final, jnp.logical_not(hit))
        env_x, env_y, env_z = (jnp.float32(c) for c in config.env_emission)
        rx = rx + jnp.where(miss_final, wx * env_x, 0.0)
        ry = ry + jnp.where(miss_final, wy * env_y, 0.0)
        rz = rz + jnp.where(miss_final, wz * env_z, 0.0)

    hx = ox + bt * dx
    hy = oy + bt * dy
    hz = oz + bt * dz
    nx0 = hx - bcx
    ny0 = hy - bcy
    nz0 = hz - bcz
    nx, ny, nz = _normalize3(
        jnp.where(hit, nx0, 1.0), jnp.where(hit, ny0, 0.0),
        jnp.where(hit, nz0, 0.0),
    )
    if config.flip_normals:
        ndot = nx * dx + ny * dy + nz * dz
        flip = ndot < 0.0
        nlx = jnp.where(flip, nx, -nx)
        nly = jnp.where(flip, ny, -ny)
        nlz = jnp.where(flip, nz, -nz)
    else:
        nlx, nly, nlz = nx, ny, nz

    if config.mode == Mode.FULL:
        # emission whose light was explicitly sampled at the previous vertex
        # is suppressed here (classic kernel semantics; sup bit per light
        # slot). bi is the winner's TABLE row, and nee_rows are table rows
        # too (the engine maps original scene indices through accel.order).
        if nee_rows:
            hit_sup = jnp.zeros(shp, jnp.bool_)
            for slot, row in enumerate(nee_rows):
                is_li = bi == jnp.float32(row)
                hit_sup = jnp.logical_or(
                    hit_sup,
                    jnp.logical_and(is_li, ((sup >> slot) & 1) == 1),
                )
            em_keep = jnp.logical_and(live_hit, jnp.logical_not(hit_sup))
        else:
            em_keep = live_hit
        rx = rx + jnp.where(em_keep, wx * em_x, 0.0)
        ry = ry + jnp.where(em_keep, wy * em_y, 0.0)
        rz = rz + jnp.where(em_keep, wz * em_z, 0.0)
    else:
        # AOV debug modes (smallpt.cpp:179-183): record at the lane's FIRST
        # final vertex and terminate (the lane never continues — parent is
        # forced off below); misses record nothing, matching the classic
        # schedulers' first-hit semantics (ops/wavefront.py::_aov_value).
        # In-kernel math restricted to Mosaic-proven ops (inverse trig for
        # UV is a polynomial atan2 — _atan2_poly above).
        if config.mode == Mode.NORMAL:
            avx, avy, avz = nlx, nly, nlz
        elif config.mode == Mode.EMISSION:
            avx, avy, avz = wx * em_x, wy * em_y, wz * em_z
        elif config.mode == Mode.INST_ID:
            # _int2color (smallpt.cpp:24-29): fract(sin((id+1)*v)*43758.5453)
            # with trunc-toward-zero fract via the proven f32->i32 cast
            oid1 = vals[11] + 1.0

            def _fract_sin(mult):
                x = jnp.sin(oid1 * jnp.float32(mult)) * jnp.float32(
                    43758.5453
                )
                return x - x.astype(jnp.int32).astype(jnp.float32)

            avx = _fract_sin(12.9898)
            avy = _fract_sin(78.233)
            avz = _fract_sin(56.128)
        elif config.mode == Mode.UV:
            # lat/long of the OUTWARD unit normal — the in-kernel analog of
            # ops/intersect.py::sphere_uv (reference smallpt.cpp:181 via
            # scene.cpp:3-48's tessellation grid); uv channel 2 is 0 like
            # the classic _aov_value's zero pad.
            two_pi = jnp.float32(2.0 * jnp.pi)
            phi = _atan2_poly(nx, nz)  # (-pi, pi]
            avx = jnp.where(phi < 0.0, phi + two_pi, phi) / two_pi
            avy = _asin_poly(ny) * jnp.float32(1.0 / jnp.pi) + jnp.float32(0.5)
            avz = jnp.zeros(shp, jnp.float32)
        else:  # pragma: no cover — engine validation rejects unknown modes
            raise ValueError(config.mode)
        rx = rx + jnp.where(live_hit, avx, 0.0)
        ry = ry + jnp.where(live_hit, avy, 0.0)
        rz = rz + jnp.where(live_hit, avz, 0.0)

    sa, sb, sc, sd_ = _pcg4d(
        wa, wb,
        pltpu.bitcast(depth, jnp.uint32) + jnp.uint32(_GOLDEN),
        jnp.broadcast_to(k0 + k1, shp),
    )
    u_rr = _to_unit(sa)
    u_b1 = _to_unit(sb)
    u_b2 = _to_unit(sc)
    u_ch = _to_unit(sd_)

    p_rr = jnp.maximum(al_x, jnp.maximum(al_y, al_z))
    rr_active = depth > config.rr_depth
    survive = jnp.logical_or(jnp.logical_not(rr_active), u_rr < p_rr)
    boost = jnp.where(
        jnp.logical_and(rr_active, survive),
        1.0 / jnp.maximum(p_rr, 1e-12), 1.0,
    )
    fx_ = al_x * boost
    fy_ = al_y * boost
    fz_ = al_z * boost

    r1 = jnp.float32(2.0 * np.pi) * u_b1
    r2s = jnp.sqrt(u_b2)
    bigx = jnp.abs(nlx) > 0.1
    upx = jnp.where(bigx, 0.0, 1.0)
    upy = jnp.where(bigx, 1.0, 0.0)
    tux = upy * nlz
    tuy = -upx * nlz
    tuz = upx * nly - upy * nlx
    tux, tuy, tuz = _normalize3(tux, tuy, tuz)
    tvx = nly * tuz - nlz * tuy
    tvy = nlz * tux - nlx * tuz
    tvz = nlx * tuy - nly * tux
    cr1 = jnp.cos(r1) * r2s
    sr1 = jnp.sin(r1) * r2s
    wzc = jnp.sqrt(jnp.maximum(1.0 - u_b2, 0.0))
    ddx = tux * cr1 + tvx * sr1 + nlx * wzc
    ddy = tuy * cr1 + tvy * sr1 + nly * wzc
    ddz = tuz * cr1 + tvz * sr1 + nlz * wzc
    ddx, ddy, ddz = _normalize3(ddx, ddy, ddz)

    nd = nx * dx + ny * dy + nz * dz
    msx = dx - nx * (2.0 * nd)
    msy = dy - ny * (2.0 * nd)
    msz = dz - nz * (2.0 * nd)

    into = (nx * nlx + ny * nly + nz * nlz) > 0.0
    nc = jnp.float32(1.0)
    nt = jnp.float32(config.ior)
    nnt = jnp.where(into, nc / nt, nt / nc)
    ddn = dx * nlx + dy * nly + dz * nlz
    cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
    tir = cos2t < 0.0
    sq = jnp.sqrt(jnp.maximum(cos2t, 0.0))
    sgn = jnp.where(into, 1.0, -1.0)
    tfac = sgn * (ddn * nnt + sq)
    tdx = dx * nnt - nx * tfac
    tdy = dy * nnt - ny * tfac
    tdz = dz * nnt - nz * tfac
    tdx, tdy, tdz = _normalize3(
        jnp.where(tir, 1.0, tdx), jnp.where(tir, 0.0, tdy),
        jnp.where(tir, 0.0, tdz),
    )
    a_ = nt - nc
    b2_ = nt + nc
    r0_ = (a_ * a_) / (b2_ * b2_)
    cterm = 1.0 - jnp.where(into, -ddn, tdx * nx + tdy * ny + tdz * nz)
    re = r0_ + (1.0 - r0_) * cterm * cterm * cterm * cterm * cterm
    tr_ = 1.0 - re
    p_refl = 0.25 + 0.5 * re
    choose_refl = u_ch < p_refl
    use_spec_dir = jnp.logical_or(tir, choose_refl)
    rfx = jnp.where(use_spec_dir, msx, tdx)
    rfy = jnp.where(use_spec_dir, msy, tdy)
    rfz = jnp.where(use_spec_dir, msz, tdz)
    refr_w = jnp.where(
        tir, 1.0, jnp.where(choose_refl, re / p_refl, tr_ / (1.0 - p_refl))
    )

    is_diff = refl < 0.5
    is_spec = jnp.logical_and(refl >= 0.5, refl < 1.5)
    is_refr = refl >= 1.5

    newdx = jnp.where(is_diff, ddx, jnp.where(is_spec, msx, rfx))
    newdy = jnp.where(is_diff, ddy, jnp.where(is_spec, msy, rfy))
    newdz = jnp.where(is_diff, ddz, jnp.where(is_spec, msz, rfz))
    wf = jnp.where(is_refr, refr_w, 1.0)
    wfx = fx_ * wf
    wfy = fy_ * wf
    wfz = fz_ * wf

    transmitted = jnp.logical_and(
        is_refr, jnp.logical_and(jnp.logical_not(tir),
                                 jnp.logical_not(choose_refl))
    )
    eps_off = jnp.where(transmitted, -config.shading_eps, config.shading_eps)
    nox = hx + eps_off * nlx
    noy = hy + eps_off * nly
    noz = hz + eps_off * nlz

    # ---- NEE vertex marking: surviving diffuse vertices outside the light
    # shell flag per-slot pending bits; the shadow itself is DEFERRED to
    # the next launch (nee_shadow_prep draws the cone direction from the
    # offset point nox — the same point the classic kernel samples from)
    if nee_rows:
        new_sup = jnp.zeros(shp, jnp.int32)
        for slot, row in enumerate(nee_rows):
            lcx, lcy, lcz = tbl_ref[row, 0], tbl_ref[row, 1], tbl_ref[row, 2]
            lrr = tbl_ref[row, 3]
            vswx = lcx - nox
            vswy = lcy - noy
            vswz = lcz - noz
            vd2 = vswx * vswx + vswy * vswy + vswz * vswz
            inside = vd2 <= lrr * lrr
            sampled = jnp.logical_and(
                jnp.logical_and(live_hit, survive),
                jnp.logical_and(is_diff, jnp.logical_not(inside)),
            )
            new_sup = new_sup | jnp.where(sampled, jnp.int32(1 << slot), 0)

    parent = jnp.logical_and(live_hit, survive)
    if config.mode != Mode.FULL:
        # AOV lanes record once and die; pending lanes (pend_out) keep
        # marching the frontier toward the true closest hit untouched
        parent = jnp.zeros(shp, jnp.bool_)
    ox = jnp.where(parent, nox, ox)
    oy = jnp.where(parent, noy, oy)
    oz = jnp.where(parent, noz, oz)
    dx = jnp.where(parent, newdx, dx)
    dy = jnp.where(parent, newdy, dy)
    dz = jnp.where(parent, newdz, dz)
    wx = jnp.where(parent, wx * wfx, wx)
    wy = jnp.where(parent, wy * wfy, wy)
    wz = jnp.where(parent, wz * wfz, wz)
    depth = jnp.where(final, depth + 1, depth)
    alive = jnp.logical_or(
        pend_out,
        jnp.logical_and(parent, depth < config.max_depth),
    )

    def wf_(idx, v):
        f_out[pl.ds(8 * idx, 8), :] = v

    def wi_(idx, v):
        i_out[pl.ds(8 * idx, 8), :] = v

    wf_(_F_OX, ox); wf_(_F_OY, oy); wf_(_F_OZ, oz)
    wf_(_F_DX, dx); wf_(_F_DY, dy); wf_(_F_DZ, dz)
    wf_(_F_WX, wx); wf_(_F_WY, wy); wf_(_F_WZ, wz)
    wf_(_F_RX, rx); wf_(_F_RY, ry); wf_(_F_RZ, rz)
    wf_(_F_M1, m1); wf_(_F_M2, m2)
    # pending lanes carry their partial candidate and MARCH the frontier
    # (not final => bt >= ts + d_cut, so ts never passes bt); everyone
    # else resets for their next ray
    wf_(_F_BT, jnp.where(pend_out, bt, _BIG))
    wf_(_F_BID, jnp.where(pend_out, bi, -1.0))
    wf_(_F_TS, jnp.where(pend_out, ts + d_cut, 0.0))
    wi_(_I_DEPTH, depth)
    wi_(_I_SIDX, s_idx)
    wi_(_I_ALIVE, alive.astype(jnp.int32))
    wi_(_I_RAYS, nrays)
    wi_(_I_BUDGET, budget)
    wi_(_I_PIXEL, pixel)
    wi_(_I_PEND, pend_out.astype(jnp.int32))
    if nee_rows:
        # sup persists to the next shading event (suppression there); neep
        # is consumed by the resolve above, so non-final lanes clear it
        wi_(_I_SUP, jnp.where(final, new_sup, sup))
        wi_(_I_NEEP, jnp.where(final, new_sup, jnp.int32(0)))
        wf_(_F_NLX, jnp.where(final, nlx, vnlx))
        wf_(_F_NLY, jnp.where(final, nly, vnly))
        wf_(_F_NLZ, jnp.where(final, nlz, vnlz))
        for s, (ldx_s, ldy_s, ldz_s) in enumerate(lds):
            wf_(_F_LD0 + 3 * s, ldx_s)
            wf_(_F_LD0 + 3 * s + 1, ldy_s)
            wf_(_F_LD0 + 3 * s + 2, ldz_s)
    else:
        wi_(_I_SUP, iplane(_I_SUP))


@functools.partial(jax.jit, static_argnames=("config", "inflight"))
def regen_binned(f, i, cam_vec, config: RenderConfig, key: jax.Array,
                 ip_offset=0, inflight: int = 1):
    """XLA-side lane regeneration for the binned scheduler: dead lanes with
    remaining budget take their pixel's next sample (camera ray, unit
    throughput, depth 0) BEFORE the bounce kernel launches.

    Mirrors the classic megakernel's in-kernel regen block (same streaming
    keying v2, same tent/box filter and cam_vec math) — moved to XLA so the
    chunk lists (ops/accel.py::tile_chunk_lists) see every ray that will
    trace this bounce with its TRUE (cell, direction) bin key. Regenerating
    inside the kernel forced every regen-capable tile's list to cover a
    conservative camera-key range, which reached most of the scene.

    One bounce per launch makes this split semantically identical to
    in-kernel regen. Also updates the per-sample luminance moments (m1/m2)
    at sample boundaries."""
    from smallpt_tpu.core.rng import _key_words

    def fplane(idx):
        return jax.lax.dynamic_slice_in_dim(f, 8 * idx, 8, axis=0)

    def iplane(idx):
        return jax.lax.dynamic_slice_in_dim(i, 8 * idx, 8, axis=0)

    s_idx = iplane(_I_SIDX)
    alive = iplane(_I_ALIVE) != 0
    budget = iplane(_I_BUDGET)
    pixel = iplane(_I_PIXEL)
    rx, ry, rz = fplane(_F_RX), fplane(_F_RY), fplane(_F_RZ)
    m1, m2 = fplane(_F_M1), fplane(_F_M2)

    need = jnp.logical_and(jnp.logical_not(alive), s_idx < budget - 1)
    if config.nee_lights:
        # a lane that died AT a diffuse vertex (max depth) still owes its
        # deferred shadow resolution — hold it one launch (the kernel's
        # resolve clears the bits regardless of aliveness)
        need = jnp.logical_and(need, iplane(_I_NEEP) == 0)
    cur_lum = (rx + ry + rz) * jnp.float32(1.0 / 3.0)
    delta = cur_lum - m1
    m2 = jnp.where(need, m2 + delta * delta, m2)
    m1 = jnp.where(need, cur_lum, m1)
    s_idx = jnp.where(need, s_idx + 1, s_idx)
    # pixel plane carries q = pixel*inflight + sub; keying and raster
    # position use the true pixel, sample ids stride by sub (must stay
    # bit-identical to _binned_kernel's derivation)
    shift = inflight.bit_length() - 1
    pix = jax.lax.shift_right_logical(pixel, shift) if shift else pixel
    ip = ip_offset + s_idx
    if shift:
        sub = pixel - jax.lax.shift_left(pix, shift)
        ip = ip + sub * jnp.int32(_BINNED_SUB_STRIDE)

    k0, k1 = _key_words(key)
    wa = pix.astype(jnp.uint32) ^ k0
    wb = k1 ^ (ip.astype(jnp.uint32) * jnp.uint32(_STREAM_IP_MULT))
    js = config.jitter_size
    group = (ip // config.spp_per_cell) % (js * js)
    cx_cell = (group % js).astype(jnp.float32)
    cy_cell = (group // js).astype(jnp.float32)
    ua, ub, _, _ = _pcg4d(
        wa, wb,
        jnp.full(wa.shape, jnp.uint32(_CAMERA_SALT)),
        jnp.broadcast_to(k0 + k1, wa.shape),
    )
    u0 = (ua >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 24)
    )
    u1 = (ub >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 24)
    )
    if config.filter == Filter.TENT:
        r0 = 2.0 * u0
        r1t = 2.0 * u1
        f0 = jnp.where(r0 < 1.0, jnp.sqrt(r0) - 1.0,
                       1.0 - jnp.sqrt(jnp.maximum(2.0 - r0, 0.0)))
        f1 = jnp.where(r1t < 1.0, jnp.sqrt(r1t) - 1.0,
                       1.0 - jnp.sqrt(jnp.maximum(2.0 - r1t, 0.0)))
        off0 = (cx_cell + 0.5 + f0) / js - 0.5
        off1 = (cy_cell + 0.5 + f1) / js - 0.5
    else:
        off0 = (cx_cell + u0) / js - 0.5
        off1 = (cy_cell + u1) / js - 0.5

    W, H = config.width, config.height
    pix_col = pix % W
    pix_row = pix // W
    sx = (pix_col.astype(jnp.float32) + 0.5 + off0) / W - 0.5
    sy = (pix_row.astype(jnp.float32) + 0.5 + off1) / H - 0.5
    if config.camera_model == CameraModel.MATRIX:
        sx = 2.0 * sx
        sy = 2.0 * sy
    ax, ay, az = cam_vec[0, 0], cam_vec[0, 1], cam_vec[0, 2]
    bx, by, bz = cam_vec[0, 3], cam_vec[0, 4], cam_vec[0, 5]
    cxv, cyv, czv = cam_vec[0, 6], cam_vec[0, 7], cam_vec[0, 8]
    o0x, o0y, o0z = cam_vec[0, 9], cam_vec[0, 10], cam_vec[0, 11]
    push = cam_vec[0, 12]
    gdx = sx * ax + sy * bx + cxv
    gdy = sx * ay + sy * by + cyv
    gdz = sx * az + sy * bz + czv
    gox = o0x + gdx * push
    goy = o0y + gdy * push
    goz = o0z + gdz * push
    ndx, ndy, ndz = _normalize3(gdx, gdy, gdz)
    if config.aperture > 0.0:
        # thin-lens DoF, bit-identical to the classic streaming kernel's
        # in-kernel lens block (same _LENS_SALT streams): jitter the origin
        # on the aperture disk, re-aim at the along-ray focus point
        la, lb, _, _ = _pcg4d(
            wa, wb,
            jnp.full(wa.shape, jnp.uint32(_LENS_SALT)),
            jnp.broadcast_to(k0 + k1, wa.shape),
        )
        lu0 = (la >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(
            1.0 / (1 << 24)
        )
        lu1 = (lb >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(
            1.0 / (1 << 24)
        )
        lrad = jnp.float32(config.aperture) * jnp.sqrt(lu0)
        lth = jnp.float32(2.0 * np.pi) * lu1
        lx_ = lrad * jnp.cos(lth)
        ly_ = lrad * jnp.sin(lth)
        rnx, rny, rnz = _normalize3(
            jnp.broadcast_to(ax, lx_.shape),
            jnp.broadcast_to(ay, lx_.shape),
            jnp.broadcast_to(az, lx_.shape),
        )
        unx, uny, unz = _normalize3(
            jnp.broadcast_to(bx, lx_.shape),
            jnp.broadcast_to(by, lx_.shape),
            jnp.broadcast_to(bz, lx_.shape),
        )
        fdist = jnp.float32(config.focal_distance)
        fpx = gox + ndx * fdist
        fpy = goy + ndy * fdist
        fpz = goz + ndz * fdist
        gox = gox + rnx * lx_ + unx * ly_
        goy = goy + rny * lx_ + uny * ly_
        goz = goz + rnz * lx_ + unz * ly_
        ndx, ndy, ndz = _normalize3(fpx - gox, fpy - goy, fpz - goz)

    one = jnp.ones_like(m1)

    def setf(buf, idx, new):
        old = jax.lax.dynamic_slice_in_dim(buf, 8 * idx, 8, axis=0)
        return jax.lax.dynamic_update_slice_in_dim(
            buf, jnp.where(need, new, old), 8 * idx, axis=0
        )

    f = setf(f, _F_OX, gox)
    f = setf(f, _F_OY, goy)
    f = setf(f, _F_OZ, goz)
    f = setf(f, _F_DX, ndx)
    f = setf(f, _F_DY, ndy)
    f = setf(f, _F_DZ, ndz)
    f = setf(f, _F_WX, one)
    f = setf(f, _F_WY, one)
    f = setf(f, _F_WZ, one)
    f = setf(f, _F_BT, jnp.full_like(one, _BIG))
    f = setf(f, _F_BID, jnp.full_like(one, -1.0))
    f = setf(f, _F_TS, jnp.zeros_like(one))
    f = jax.lax.dynamic_update_slice_in_dim(f, m1, 8 * _F_M1, axis=0)
    f = jax.lax.dynamic_update_slice_in_dim(f, m2, 8 * _F_M2, axis=0)

    depth = iplane(_I_DEPTH)
    i = jax.lax.dynamic_update_slice_in_dim(
        i, jnp.where(need, 0, depth), 8 * _I_DEPTH, axis=0
    )
    i = jax.lax.dynamic_update_slice_in_dim(i, s_idx, 8 * _I_SIDX, axis=0)
    i = jax.lax.dynamic_update_slice_in_dim(
        i, jnp.logical_or(alive, need).astype(jnp.int32), 8 * _I_ALIVE,
        axis=0,
    )
    pend = iplane(_I_PEND)
    i = jax.lax.dynamic_update_slice_in_dim(
        i, jnp.where(need, 0, pend), 8 * _I_PEND, axis=0
    )
    if config.nee_lights:
        # a fresh camera ray must not inherit the previous sample's
        # suppression bits (its first light hit would be wrongly dropped —
        # the classic kernel resets sup in its in-kernel regen block)
        sup = iplane(_I_SUP)
        i = jax.lax.dynamic_update_slice_in_dim(
            i, jnp.where(need, 0, sup), 8 * _I_SUP, axis=0
        )
    return f, i


def _binned_geometry(config: RenderConfig, inflight: int = 1,
                     n_pix: int | None = None):
    """State geometry for n_pix pixels (default: the whole image; sharded
    row bands pass their band size)."""
    g = (config.n_pixels if n_pix is None else n_pix) * inflight
    n_tiles = -(-g // (_SUB * _LANE_B))
    n_cols = n_tiles * _LANE_B
    return g, n_tiles, n_cols


def init_binned_state(config: RenderConfig, inflight: int = 1,
                      pixel_lo: int = 0, n_pix: int | None = None):
    """Fresh binned stream state: classic planes + a lane-identity plane
    q = pixel*inflight + sub (canonical order; a bin sort may permute
    lanes at any time). inflight must be a power of two.

    Sharded row bands (parallel/binned_shard.py) pass pixel_lo/n_pix: lane
    ids then cover the GLOBAL pixel range [pixel_lo, pixel_lo + n_pix) —
    regen/kernel keying and raster positions derive everything from the id
    plane, so a band state renders its band with streams bit-identical to
    the same pixels in a whole-image state."""
    if inflight & (inflight - 1):
        raise ValueError("inflight must be a power of two")
    g, n_tiles, n_cols = _binned_geometry(config, inflight, n_pix)
    f_parts = [
        jnp.zeros((_SUB * _NF, n_cols), jnp.float32),
        jnp.full((_SUB, n_cols), _BIG, jnp.float32),   # bt carry
        jnp.full((_SUB, n_cols), -1.0, jnp.float32),   # bi carry
        jnp.zeros((_SUB, n_cols), jnp.float32),        # ts frontier
    ]
    if config.nee_lights:
        # nl planes + one ld triple per light (read only under _I_NEEP
        # bits, so zero-init is safe)
        f_parts.append(jnp.zeros(
            (_SUB * (3 + 3 * len(config.nee_lights)), n_cols), jnp.float32
        ))
    f0 = jnp.concatenate(f_parts, axis=0)
    # COLUMN-major lane ids: lane[r, c] = c*8 + r. A kernel tile is a
    # LANE_B-column block, so this makes tile t hold the CONTIGUOUS id
    # range [t*8192, (t+1)*8192) — one compact image block (and, with
    # oversubscription, a pixel's sub-lanes sit in the same tile). The
    # row-major layout (r*n_cols + c) gave every tile 8 image strips
    # scattered across the frame, inflating each tile's reach set ~8-fold.
    # Placement is semantically free (streams key off the id plane), so
    # this is a pure locality change: images are bit-identical.
    lane = (
        jnp.arange(_SUB, dtype=jnp.int32)[:, None]
        + jnp.arange(n_cols, dtype=jnp.int32)[None, :] * _SUB
        + jnp.asarray(pixel_lo * inflight, jnp.int32)  # traced-ok (sharded
    )                                                  # bands pass axis_index)
    i_parts = [
        jnp.zeros((_SUB, n_cols), jnp.int32),      # depth
        jnp.full((_SUB, n_cols), -1, jnp.int32),   # s_idx
        jnp.zeros((_SUB, n_cols), jnp.int32),      # alive
        jnp.zeros((_SUB, n_cols), jnp.int32),      # rays
        jnp.zeros((_SUB, n_cols), jnp.int32),      # budget
        jnp.zeros((_SUB, n_cols), jnp.int32),      # sup (NEE suppression)
        lane,                                       # pixel identity
        jnp.zeros((_SUB, n_cols), jnp.int32),      # pending flag
    ]
    if config.nee_lights:
        i_parts.append(jnp.zeros((_SUB, n_cols), jnp.int32))  # neep bits
    i0 = jnp.concatenate(i_parts, axis=0)
    return f0, i0


def set_binned_budget(i, budget, config: RenderConfig, inflight: int = 1,
                      pixel_hi=None):
    """Raise the per-PIXEL sample budget. budget: scalar (uniform) or a
    (G,) int32 array (adaptive sampling). Lanes may be permuted by the bin
    sort, so budgets are GATHERED through the lane-id plane; with
    oversubscription a pixel's budget b splits across its ``inflight``
    sub-lanes as ceil/floor shares summing exactly to b. Padded lanes —
    pixel >= pixel_hi (default n_pixels; sharded row bands pass their band
    end, traced-ok) — stay at 0 regardless of lane placement."""
    g = config.n_pixels
    if pixel_hi is None:
        pixel_hi = g
    q = jax.lax.dynamic_slice_in_dim(i, 8 * _I_PIXEL, 8, axis=0)
    old = jax.lax.dynamic_slice_in_dim(i, 8 * _I_BUDGET, 8, axis=0)
    shift = inflight.bit_length() - 1
    pix = jax.lax.shift_right_logical(q, shift) if shift else q
    b = jnp.asarray(budget, jnp.int32)
    if b.ndim == 0:
        new = jnp.broadcast_to(b, q.shape)
    else:
        new = b[jnp.clip(pix, 0, g - 1)]
    if shift:
        sub = q - jax.lax.shift_left(pix, shift)
        new = (new + (inflight - 1) - sub) // inflight
    plane = jnp.where(pix < pixel_hi, jnp.maximum(new, old), old)
    return jax.lax.dynamic_update_slice_in_dim(i, plane, 8 * _I_BUDGET, axis=0)


@functools.partial(
    jax.jit, static_argnames=("config", "inflight", "n_pix")
)
def binned_variance(f, i, config: RenderConfig, inflight: int = 1,
                    n_pix: int | None = None):
    """Per-pixel (mean, variance, n) for the binned stream — the
    stream_variance analog with lanes keyed back to lane-id order (same
    single-sort trick as binned_image; sub-lane moments add). n_pix: row
    bands return (rows, W) planes (sharded path)."""
    g = config.n_pixels if n_pix is None else n_pix

    def fplane(idx):
        return jax.lax.dynamic_slice_in_dim(f, 8 * idx, 8, axis=0).reshape(-1)

    def iplane(idx):
        return jax.lax.dynamic_slice_in_dim(i, 8 * idx, 8, axis=0).reshape(-1)

    m1 = fplane(_F_M1)
    m2 = fplane(_F_M2)
    rad_lum = (
        fplane(_F_RX) + fplane(_F_RY) + fplane(_F_RZ)
    ) * jnp.float32(1.0 / 3.0)
    alive = iplane(_I_ALIVE) != 0
    s_idx = iplane(_I_SIDX)
    delta = rad_lum - m1
    m2 = jnp.where(~alive & (s_idx >= 0), m2 + delta * delta, m2)
    m1 = jnp.where(~alive & (s_idx >= 0), rad_lum, m1)
    n = (s_idx + 1 - alive.astype(jnp.int32)).astype(jnp.float32)
    pixel = iplane(_I_PIXEL)
    _, m1s, m2s, ns = jax.lax.sort((pixel, m1, m2, n), num_keys=1)
    nl = g * inflight

    def fold(v):
        return v[:nl].reshape(g, inflight).sum(axis=1)

    m1t, m2t, nt = fold(m1s), fold(m2s), fold(ns)
    n_safe = jnp.maximum(nt, 1.0)
    mean = m1t / n_safe
    var = jnp.maximum(m2t / n_safe - mean * mean, 0.0)
    shape = (g // config.width, config.width)
    return mean.reshape(shape), var.reshape(shape), nt.reshape(shape)


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "n_glob_chunks", "n_chunks", "interpret", "inflight",
        "geo_lo", "geo_hi", "nee_rows",
    ),
)
def stream_step_binned(
    table,        # (S_pad, 16) f32 — reordered scene table (accel.order)
    config: RenderConfig,
    key: jax.Array,
    f, i,
    lists,        # (T, l_max) int32 — ops/accel.py::tile_work_lists,
                  # chunk ids ordered near -> far per tile
    stops,        # (T,) int32: entries to sweep (-1 => all local chunks)
    dcut,         # (T,) f32: finality distance bound for the swept prefix
    ip_offset=0,
    n_glob_chunks: int = 2,
    n_chunks: int = 0,
    interpret: bool | None = None,
    inflight: int = 1,
    geo_lo: tuple = (-3e38, -3e38, -3e38),
    geo_hi: tuple = (3e38, 3e38, 3e38),
    nee_rows: tuple = (),
):
    """ONE culled bounce over the whole binned stream state.

    geo_lo/geo_hi: the LOCAL-geometry AABB (accel.geo_lo/geo_hi), baked
    static so frontier-escaped lanes finalize; the permissive default
    disables escape (safe: only dcut finality fires, as the pre-marching
    kernel did)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # geometry from the state itself (a sharded row band's state is smaller
    # than the whole-image _binned_geometry; the kernel is band-agnostic)
    n_cols = f.shape[1]
    n_tiles = n_cols // _LANE_B

    kw = jax.random.key_data(key).astype(jnp.uint32).reshape(1, -1)[:, :2]
    ipv = jnp.stack([
        jnp.asarray(ip_offset, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
    ]).reshape(1, 4)

    kernel = functools.partial(
        _binned_kernel,
        config=config,
        n_glob_chunks=n_glob_chunks,
        n_chunks=n_chunks,
        inflight=inflight,
        geo_lo=geo_lo,
        geo_hi=geo_hi,
        nee_rows=nee_rows,
    )
    s_pad = table.shape[0]
    nf_b, ni_b = _nf_b(config), _ni_b(config)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                   # kw
            pl.BlockSpec(memory_space=pltpu.SMEM),                   # ipv
            pl.BlockSpec((s_pad, 16), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),                   # table
            pl.BlockSpec((_SUB * nf_b, _LANE_B), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),                   # f
            pl.BlockSpec((_SUB * ni_b, _LANE_B), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),                   # i
        ],
        out_specs=[
            pl.BlockSpec((_SUB * nf_b, _LANE_B), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUB * ni_b, _LANE_B), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),
        ],
    )
    rays_plane_before = jax.lax.dynamic_slice_in_dim(
        i, 8 * _I_RAYS, 8, axis=0
    )
    f, i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((_SUB * nf_b, n_cols), jnp.float32),
            jax.ShapeDtypeStruct((_SUB * ni_b, n_cols), jnp.int32),
        ],
        # aliasing saves HBM but may constrain the pipeline; the env toggle
        # exists for perf experiments
        input_output_aliases=(
            {} if os.environ.get("SMALLPT_TPU_BINNED_NO_ALIAS") else {6: 0, 7: 1}
        ),
        interpret=interpret,
    )(stops, lists, dcut, kw, ipv, table, f, i)
    # exact per-launch count: per-lane int32 delta (one bounce finalizes at
    # most one ray per lane, so the sum is bounded by the lane count). The
    # previous f32 cumulative-sum difference lost <=8-ray deltas once the
    # render passed 2^24 total rays, reading a live drain tail as "no
    # progress" (observed at spp=16 on the 10k-sphere scene).
    rays = jnp.sum(
        jax.lax.dynamic_slice_in_dim(i, 8 * _I_RAYS, 8, axis=0)
        - rays_plane_before
    )
    return f, i, rays


@functools.partial(
    jax.jit, static_argnames=("config", "inflight", "n_pix")
)
def binned_image(f, i, config: RenderConfig, inflight: int = 1,
                 n_pix: int | None = None):
    """(radiance (H, W, 3), completed-sample weights (H, W)) regardless of
    current lane placement: lanes are keyed back to lane-id order with one
    small sort (lane ids are a permutation of the state's contiguous id
    range, so the sort IS the inverse placement); a pixel's ``inflight``
    sub-lanes land contiguously and are summed (disjoint sample ranges =>
    exact union). n_pix: a sharded row band returns its (rows, W) block
    (padded lanes carry the largest ids, so the sorted prefix is exactly
    the band)."""
    g = config.n_pixels if n_pix is None else n_pix
    pixel = jax.lax.dynamic_slice_in_dim(
        i, 8 * _I_PIXEL, 8, axis=0
    ).reshape(-1)
    s_idx = jax.lax.dynamic_slice_in_dim(
        i, 8 * _I_SIDX, 8, axis=0
    ).reshape(-1)
    alive = jax.lax.dynamic_slice_in_dim(
        i, 8 * _I_ALIVE, 8, axis=0
    ).reshape(-1)
    done = (s_idx + 1 - alive).astype(jnp.float32)

    def plane(idx):
        return jax.lax.dynamic_slice_in_dim(f, 8 * idx, 8, axis=0).reshape(-1)

    _, rxs, rys, rzs, dns = jax.lax.sort(
        (pixel, plane(_F_RX), plane(_F_RY), plane(_F_RZ), done), num_keys=1
    )
    n = g * inflight

    def fold(v):
        return v[:n].reshape(g, inflight).sum(axis=1)

    rad = jnp.stack([fold(rxs), fold(rys), fold(rzs)], axis=-1)
    rows = g // config.width
    return (
        rad.reshape(rows, config.width, 3),
        fold(dns).reshape(rows, config.width),
    )
