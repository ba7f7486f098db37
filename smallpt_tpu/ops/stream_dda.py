"""Streaming megakernel with per-RAY DDA traversal — the big-scene
flagship scheduler.

Why this exists (the r2-r4 measurement arc, BASELINE.md): on interior
scenes every per-TILE culling granularity loses — pixel tiles reach every
chunk — and the brute sweep is VPU-roofline-bound at O(S) pairs/ray. The
pair cut must be per-RAY (a BVH's defining property, OptiX Prime's role:
/root/reference/smallpt.cpp:489-530,578-582). ops/dda.py builds that cut
as a per-lane grid walk, but a PER-PASS launch is worst-lane bound: in a
uniform-density scene ~0.7% of rays traverse the whole grid, so nearly
every 1024-lane tile pays near-max walk steps while most lanes finish in
~3 cells and idle. The streaming scheduler already solves the identical
problem for sample regeneration — finished lanes restart IMMEDIATELY —
so this kernel fuses the DDA walk INTO the streaming loop: one loop
iteration advances every lane by one unit of its OWN work (a walk step,
a bounce resolve + shade, or a fresh-sample start), keeping every slot
useful at ~100% occupancy.

Per-lane state machine (_I_WALK plane):
  0 = has a fresh ray, needs walk INIT (always-sweep + grid clip)
  1 = mid-walk: one DDA cell step per iteration
  2 = walk finished: RESOLVE (winner payload, emission, BSDF/RR shade)
      -> next bounce ray (back to 0) or death (regen picks it up)
A bounce therefore costs (walk steps + 1) iterations; the +1 is the
resolve, whose winner-payload gather rides the SAME one-hot matmul as
the walk gathers (the one-hot column is the walk cell for walkers, the
winner's cell for resolvers).

Cell contents arrive via the exact bf16x3 one-hot MXU gather of
ops/dda.py (values pre-split into three bf16-representable f32 terms;
three DEFAULT-precision dots reconstruct exact f32). The gather runs
per sublane row (8 x (C, LANE) one-hots), mirroring the classic
kernel's 8-row VMEM chunk unroll.

Transport semantics are IDENTICAL to ops/megakernel.py streaming mode
(split_budget == 1, Mode.FULL, v2 streaming keying — the regen and shade
blocks mirror _mega_kernel line for line and are pinned by
tests/test_stream_dda.py against the classic streaming image; the sphere
test uses the same stable citardauq arithmetic, so images agree to
f32 op-ordering noise on razor-edge paths, the same floor as mega-vs-JAX
parity).

Next-event estimation (single light slot): where the classic kernel
fuses a FULL-table shadow sweep per diffuse vertex (the 40%-of-
throughput tax the r3/r4 verdicts flagged on the binned path), here the
shadow ray is just ANOTHER WALK: the vertex cone-samples the light with
the classic uniforms, then enters walk state 3 (or 4 when the path dies
at this vertex but still owes its direct sample — the lane stays alive
until the shadow resolves so drain accounting holds). The shadow walk
reuses the same fold, terminates as soon as occlusion is DECIDED
(found t <= cell exit, or cell entry beyond the light), and the lit
rule is the classic one (folded min >= t_light, both sides from the
same _shadow_tt arithmetic — the light rides the always sweep at
shadow init). Multi-light scenes route through the classic schedulers.

State layout: classic 14 f / 6 i planes (same indices — stream_image,
stream_pending, set_sample_budget work unchanged) plus walk planes:
  f: _F_TMX/_F_TMY/_F_TMZ (DDA next-crossing t per axis), _F_BT (best
     candidate t), _F_BID (best original id, f32)
  i: _I_CELL (packed walk cell (ix<<10)|(iy<<5)|iz, -1 idle),
     _I_WALK (state machine above),
     _I_WCELL (winner's packed cell; -1 = winner from the always-swept
     global/overflow table)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smallpt_tpu.config import RenderConfig, Filter, CameraModel, Mode
from smallpt_tpu.core.rng import (
    _CAMERA_SALT, _GOLDEN, _LENS_SALT, _NEE_SALT, _STREAM_IP_MULT, _pcg4d,
)
from smallpt_tpu.core.scene import SphereScene
from smallpt_tpu.ops.dda import _split_bf16x3
from smallpt_tpu.ops.intersect_pallas import STABLE_RADIUS
from smallpt_tpu.ops.megakernel import (
    _BIG, _F_OX, _F_OY, _F_OZ, _F_DX, _F_DY, _F_DZ, _F_WX, _F_WY, _F_WZ,
    _F_RX, _F_RY, _F_RZ, _F_M1, _F_M2, _NF, _I_DEPTH, _I_SIDX, _I_ALIVE,
    _I_RAYS, _I_BUDGET, _I_SUP, _NI, _SUB, _LANE, _to_unit,
    _normalize3, _shadow_tt, _stream_geometry, set_sample_budget,
    build_camera_vec,
)

_BIGID = 3.0e38

# extra plane indices (appended after the classic ones)
_F_TMX, _F_TMY, _F_TMZ = _NF, _NF + 1, _NF + 2
_F_BT, _F_BID = _NF + 3, _NF + 4
_NF_D = _NF + 5
# NEE-only planes (allocated when config.nee_lights is set): the sampled
# shadow direction, the pending direct-light contribution (added iff the
# shadow walk comes back unoccluded), and the light's candidate distance
_F_SDX, _F_SDY, _F_SDZ = _NF + 5, _NF + 6, _NF + 7
_F_PCX, _F_PCY, _F_PCZ = _NF + 8, _NF + 9, _NF + 10
_F_TLG = _NF + 11
_NF_D_NEE = _NF + 12
_I_CELL, _I_WALK, _I_WCELL = _NI, _NI + 1, _NI + 2
_NI_D = _NI + 3


def _nf_d(config) -> int:
    return _NF_D_NEE if config.nee_lights else _NF_D

# gathered fields per cell slot, in row-block order
_G_CX, _G_CY, _G_CZ, _G_R, _G_ID = 0, 1, 2, 3, 4
_G_EX, _G_EY, _G_EZ, _G_AX, _G_AY, _G_AZ, _G_RF = 5, 6, 7, 8, 9, 10, 11
_NGF = 12


class StreamDDATables:
    """Eager per-(scene, config) tables for the streaming DDA kernel.
    Host-side handle (not a pytree); build OUTSIDE jit."""

    def __init__(self, always_tbl, cells3, k, nb, lo, cell, eps_local,
                 n_always, n_local, n_overflow, light_rows=()):
        self.always_tbl = always_tbl   # (A_pad, 16) f32, scene-table rows
        self.cells3 = cells3           # (3, _NGF*K, C) f32 bf16x3 split
        self.k = k
        self.nb = nb
        self.lo = lo
        self.cell = cell
        self.eps_local = eps_local
        self.n_always = n_always
        self.n_local = n_local
        self.n_overflow = n_overflow
        self.light_rows = tuple(light_rows)  # always-table row per NEE slot

    @property
    def n_cells(self):
        nx, ny, nz = self.nb
        return nx * ny * nz


def build_stream_dda_tables(
    scene: SphereScene,
    config: RenderConfig,
    occ_target: float = 48.0,  # r5c sweep winner: 15.5 Mrays/s vs 11.8
                               # (occ 28) / 5.7 (occ 96, overflow-bound)
                               # at 512x384 @ 10k spheres
    k_max: int = 128,
    nb=None,
    stable_radius: float = STABLE_RADIUS,
    margin_rel: float = 1e-4,
) -> StreamDDATables:
    """Uniform grid + always-swept table for the streaming DDA kernel.

    The always table holds global (wall-class) spheres plus any cell
    overflow, as (A_pad, 16) rows with the EXACT column layout and values
    of ops/megakernel.py::build_scene_table (cols [cx cy cz r eps | em |
    albedo | refl | id]), so the stable sweep consumes them identically.
    """
    eps = float(config.intersect_eps)
    eps_rel = float(config.intersect_eps_rel)
    if eps_rel * stable_radius > eps:
        raise ValueError(
            "stream dda needs uniform local eps: eps_rel*stable_radius "
            f"= {eps_rel * stable_radius} > eps = {eps}"
        )
    c = np.asarray(scene.center, np.float64)
    r = np.asarray(scene.radius, np.float64)
    em = np.asarray(scene.material.emission, np.float32)
    al = np.asarray(scene.material.albedo, np.float32)
    rf = np.asarray(scene.material.refl, np.float32)
    s = c.shape[0]
    lids = np.nonzero(r < stable_radius)[0]
    gids = np.nonzero(r >= stable_radius)[0]
    if lids.size == 0:
        raise ValueError("scene has no local spheres — use classic streaming")

    lc = c[lids]
    lr = r[lids]
    ext_lo = (lc - lr[:, None]).min(axis=0)
    ext_hi = (lc + lr[:, None]).max(axis=0)
    span = np.maximum(ext_hi - ext_lo, 1e-6)
    margin = max(float(span.max()) * margin_rel, 1e-6)
    ext_lo -= margin
    ext_hi += margin
    span = ext_hi - ext_lo

    if nb is None:
        vol = float(span[0] * span[1] * span[2])
        h = (vol * occ_target / max(lids.size, 1)) ** (1.0 / 3.0)
        nb = tuple(int(np.clip(round(span[a] / h), 1, 32)) for a in range(3))
    nb = tuple(int(x) for x in nb)
    nx, ny, nz = nb
    n_cells = nx * ny * nz
    cell = span / np.asarray(nb, np.float64)

    s_lo = np.clip(((lc - lr[:, None] - margin - ext_lo) / cell), 0, None)
    s_hi = np.clip(((lc + lr[:, None] + margin - ext_lo) / cell), 0, None)
    s_lo = np.minimum(s_lo.astype(np.int64), np.asarray(nb) - 1)
    s_hi = np.minimum(s_hi.astype(np.int64), np.asarray(nb) - 1)

    lists: list[list[int]] = [[] for _ in range(n_cells)]
    overflow_ids: set[int] = set()
    for j, sid in enumerate(lids):
        for ix in range(s_lo[j, 0], s_hi[j, 0] + 1):
            for iy in range(s_lo[j, 1], s_hi[j, 1] + 1):
                base = (ix * ny + iy) * nz
                for iz in range(s_lo[j, 2], s_hi[j, 2] + 1):
                    cl = base + iz
                    if len(lists[cl]) < k_max:
                        lists[cl].append(int(sid))
                    else:
                        overflow_ids.add(int(sid))

    occ_max = max((len(l) for l in lists), default=0)
    k = max(8, -(-occ_max // 8) * 8)

    vals = np.zeros((_NGF, k, n_cells), np.float32)
    vals[_G_ID] = _BIGID
    for cl, lst in enumerate(lists):
        if not lst:
            continue
        ids = np.asarray(lst)
        n = len(lst)
        vals[_G_CX, :n, cl] = c[ids, 0]
        vals[_G_CY, :n, cl] = c[ids, 1]
        vals[_G_CZ, :n, cl] = c[ids, 2]
        vals[_G_R, :n, cl] = r[ids]
        vals[_G_ID, :n, cl] = ids
        vals[_G_EX, :n, cl] = em[ids, 0]
        vals[_G_EY, :n, cl] = em[ids, 1]
        vals[_G_EZ, :n, cl] = em[ids, 2]
        vals[_G_AX, :n, cl] = al[ids, 0]
        vals[_G_AY, :n, cl] = al[ids, 1]
        vals[_G_AZ, :n, cl] = al[ids, 2]
        vals[_G_RF, :n, cl] = rf[ids]
    cells3 = _split_bf16x3(vals.reshape(_NGF * k, n_cells))

    # NEE light spheres join the always set (they are normally wall-class
    # already; a small emissive sphere would otherwise live only in cells,
    # and the shadow-walk needs its candidate distance from the always
    # sweep — a duplicate cell entry is harmless under the min-fold)
    aids = sorted(set(gids.tolist()) | overflow_ids
                  | set(int(li) for li in (config.nee_lights or ())))
    a_pad = max(8, -(-len(aids) // 8) * 8)
    atbl = np.zeros((a_pad, 16), np.float32)
    if aids:
        ids = np.asarray(aids)
        atbl[: len(aids), 0:3] = c[ids]
        atbl[: len(aids), 3] = r[ids]
        atbl[: len(aids), 4] = np.maximum(eps, eps_rel * r[ids])
        atbl[: len(aids), 5:8] = em[ids]
        atbl[: len(aids), 8:11] = al[ids]
        atbl[: len(aids), 11] = rf[ids]
        atbl[: len(aids), 12] = ids
    atbl[len(aids):, 12] = _BIGID

    return StreamDDATables(
        always_tbl=jnp.asarray(atbl),
        cells3=jnp.asarray(cells3.reshape(3, _NGF * k, n_cells)),
        k=int(k),
        nb=nb,
        lo=tuple(float(v) for v in ext_lo),
        cell=tuple(float(v) for v in cell),
        eps_local=eps,
        n_always=int(len(aids)),
        n_local=int(lids.size),
        n_overflow=int(len(overflow_ids)),
        light_rows=tuple(aids.index(int(li))
                         for li in (config.nee_lights or ())),
    )


def _stream_dda_kernel(
    kw_ref,    # (1, 2) uint32 SMEM
    ip_ref,    # (1, 4) int32 SMEM: [ip_offset, row_offset, 0, max_it]
    cam_ref,   # (1, 16) f32 SMEM
    atbl_ref,  # (A_pad, 16) f32 VMEM — always-swept rows
    cells_ref, # (3, _NGF*K, C) f32 VMEM
    f_ref, i_ref, f_out, i_out,
    *,
    config: RenderConfig,
    n_cols: int,
    k: int,
    nb, lo, cell,
    eps_local: float,
    a_pad: int,
    light_row: int | None = None,  # always-table row of the single NEE
                                   # light (static); None = NEE off
):
    t = pl.program_id(0)
    f32 = jnp.float32
    nx, ny, nz = nb
    n_cells = nx * ny * nz
    nee = bool(config.nee_lights)

    fplane = lambda idx: f_ref[pl.ds(8 * idx, 8), :]
    iplane = lambda idx: i_ref[pl.ds(8 * idx, 8), :]

    ox0, oy0, oz0 = fplane(_F_OX), fplane(_F_OY), fplane(_F_OZ)
    dx0, dy0, dz0 = fplane(_F_DX), fplane(_F_DY), fplane(_F_DZ)
    wx0, wy0, wz0 = fplane(_F_WX), fplane(_F_WY), fplane(_F_WZ)
    rx0, ry0, rz0 = fplane(_F_RX), fplane(_F_RY), fplane(_F_RZ)
    m10, m20 = fplane(_F_M1), fplane(_F_M2)
    sup0 = iplane(_I_SUP)
    tmx0, tmy0, tmz0 = fplane(_F_TMX), fplane(_F_TMY), fplane(_F_TMZ)
    bt0, bid0 = fplane(_F_BT), fplane(_F_BID)
    if nee:
        sdx0, sdy0, sdz0 = fplane(_F_SDX), fplane(_F_SDY), fplane(_F_SDZ)
        pcx0, pcy0, pcz0 = fplane(_F_PCX), fplane(_F_PCY), fplane(_F_PCZ)
        tlg0 = fplane(_F_TLG)
    depth0 = iplane(_I_DEPTH)
    s_idx0 = iplane(_I_SIDX)
    alive0 = iplane(_I_ALIVE)
    nrays0 = iplane(_I_RAYS)
    budget = iplane(_I_BUDGET)
    cell0 = iplane(_I_CELL)
    walk0 = iplane(_I_WALK)
    wcell0 = iplane(_I_WCELL)

    k0 = kw_ref[0, 0]
    k1 = kw_ref[0, 1]
    ip_offset = ip_ref[0, 0]
    row_offset = ip_ref[0, 1]
    max_it = ip_ref[0, 3]

    row8 = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)
    col_l = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1)
    lane = row8 * n_cols + t * _LANE + col_l
    W, H = config.width, config.height
    pix_col = lane % W
    pix_row = lane // W + row_offset
    pixel = pix_row * W + pix_col

    glx, gly, glz = (f32(v) for v in lo)
    clx, cly, clz = (f32(v) for v in cell)
    ghx = glx + clx * nx
    ghy = gly + cly * ny
    ghz = glz + clz * nz
    tiny = f32(1e-20)
    eps_l = f32(eps_local)

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (n_cells, _LANE), 0)
    krow = jax.lax.broadcasted_iota(jnp.int32, (k, _LANE), 0)

    def loop_cond(carry):
        it = carry[0]
        s_idx = carry[14]
        alive_i = carry[15]
        more = jnp.logical_or(alive_i != 0, s_idx < budget - 1)
        return jnp.logical_and(it < max_it, jnp.any(more))

    def loop_body(carry):
        (it, ox, oy, oz, dx, dy, dz, wx, wy, wz, rx, ry, rz, depth,
         s_idx, alive_i, nrays, m1, m2, tmx, tmy, tmz, bt, bid,
         cellp, walk, wcell, sup, *extra) = carry
        if nee:
            sdx, sdy, sdz, pcx, pcy, pcz, tlg = extra
        alive = alive_i != 0
        # walk states: 0 fresh ray needs init, 1 main walk, 2 resolve,
        # 3 shadow walk (path continues after), 4 shadow walk then death
        # (the vertex owed a direct-light sample even though the path
        # ends — the lane stays "alive" until the shadow resolves so the
        # drain accounting sees its pending work)
        is_shadow = (walk == 3) | (walk == 4) if nee else (walk < 0)
        stepping = (walk == 1) | is_shadow
        resolving = jnp.logical_and(alive, walk == 2)
        if nee:
            wdx = jnp.where(is_shadow, sdx, dx)
            wdy = jnp.where(is_shadow, sdy, dy)
            wdz = jnp.where(is_shadow, sdz, dz)
        else:
            wdx, wdy, wdz = dx, dy, dz

        # ---- per-sublane-row: gather + walk-step fold + resolve payload
        # gather column: the walk cell for walkers, the winner's cell for
        # resolvers (wcell < 0 = always-table winner -> no gather needed,
        # the all-zero one-hot keeps rows at 0 and _G_ID at 0 != bid).
        # Cells are STORED packed ((ix<<10)|(iy<<5)|iz) but the one-hot
        # iota is LINEAR ((ix*ny+iy)*nz+iz) — unpack before comparing.
        ix = cellp >> 10
        iy = (cellp >> 5) & 31
        iz = cellp & 31
        lin_walk = (ix * ny + iy) * nz + iz
        wix = wcell >> 10
        wiy = (wcell >> 5) & 31
        wiz = wcell & 31
        lin_win = (wix * ny + wiy) * nz + wiz
        gcell = jnp.where(
            stepping, lin_walk,
            jnp.where(resolving & (wcell >= 0), lin_win, -1),
        )

        m_rows = []
        idc_rows = []
        pay_rows = [[] for _ in range(_NGF)]
        for rsub in range(_SUB):
            gc_r = gcell[rsub:rsub + 1, :]                  # (1, LANE)
            oh = (iota_c == gc_r).astype(f32)               # (C, LANE)
            g = None
            for term in range(3):
                d_ = jax.lax.dot_general(
                    cells_ref[term], oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                g = d_ if g is None else g + d_             # (_NGF*K, LANE)
            scx = g[_G_CX * k:(_G_CX + 1) * k, :]
            scy = g[_G_CY * k:(_G_CY + 1) * k, :]
            scz = g[_G_CZ * k:(_G_CZ + 1) * k, :]
            sr = g[_G_R * k:(_G_R + 1) * k, :]
            idf = g[_G_ID * k:(_G_ID + 1) * k, :]
            # stable citardauq candidates — same arithmetic as the classic
            # streaming sweep (_shadow_tt), per gathered row block; the
            # direction is the shadow dir for shadow-walking lanes
            tt = _shadow_tt(
                ox[rsub:rsub + 1, :], oy[rsub:rsub + 1, :],
                oz[rsub:rsub + 1, :], wdx[rsub:rsub + 1, :],
                wdy[rsub:rsub + 1, :], wdz[rsub:rsub + 1, :],
                scx, scy, scz, sr, eps_l,
            )
            tt = jnp.where(sr > 0.0, tt, _BIG)
            m_r = jnp.min(tt, axis=0, keepdims=True)        # (1, LANE)
            idc_r = jnp.min(
                jnp.where(tt <= m_r, idf, _BIGID), axis=0, keepdims=True
            )
            m_rows.append(m_r)
            idc_rows.append(idc_r)
            # resolve payload: winner row by id match (unique within cell)
            bid_r = bid[rsub:rsub + 1, :]
            rmask = (idf == bid_r).astype(f32)              # (K, LANE)
            for fi in range(_NGF):
                blk = g[fi * k:(fi + 1) * k, :]
                pay_rows[fi].append(
                    jnp.sum(rmask * blk, axis=0, keepdims=True)
                )
        m_all = jnp.concatenate(m_rows, axis=0)             # (8, LANE)
        idc_all = jnp.concatenate(idc_rows, axis=0)
        pay = [jnp.concatenate(pr, axis=0) for pr in pay_rows]

        # ---- walk step: fold candidates, early-exit test, DDA advance
        upd = stepping & (m_all < _BIG) & (
            (m_all < bt) | ((m_all == bt) & (idc_all < bid))
        )
        bt = jnp.where(upd, m_all, bt)
        bid = jnp.where(upd, idc_all, bid)
        wcell = jnp.where(upd, cellp, wcell)

        t_exit = jnp.minimum(jnp.minimum(tmx, tmy), tmz)
        sx_ = jnp.where(wdx >= 0.0, 1, -1)
        sy_ = jnp.where(wdy >= 0.0, 1, -1)
        sz_ = jnp.where(wdz >= 0.0, 1, -1)
        ax_ = (tmx <= tmy) & (tmx <= tmz)
        ay_ = jnp.logical_not(ax_) & (tmy <= tmz)
        az_ = jnp.logical_not(ax_) & jnp.logical_not(ay_)
        dtx = jnp.where(jnp.abs(wdx) < tiny, _BIG, clx / jnp.abs(wdx))
        dty = jnp.where(jnp.abs(wdy) < tiny, _BIG, cly / jnp.abs(wdy))
        dtz = jnp.where(jnp.abs(wdz) < tiny, _BIG, clz / jnp.abs(wdz))
        ix2 = jnp.where(ax_, ix + sx_, ix)
        iy2 = jnp.where(ay_, iy + sy_, iy)
        iz2 = jnp.where(az_, iz + sz_, iz)
        tmx2 = jnp.where(ax_, tmx + dtx, tmx)
        tmy2 = jnp.where(ay_, tmy + dty, tmy)
        tmz2 = jnp.where(az_, tmz + dtz, tmz)
        inside2 = ((ix2 >= 0) & (ix2 < nx) & (iy2 >= 0) & (iy2 < ny)
                   & (iz2 >= 0) & (iz2 < nz))
        walk_done = (walk == 1) & (
            (bt <= t_exit) | jnp.logical_not(inside2)
        )
        if nee:
            # shadow walk ends when occlusion is DECIDED: a confirmed
            # closest hit, or no later cell can produce t' < t_light
            # (t' >= t_enter(next) >= t_exit >= t_light), or off-grid
            sdone = is_shadow & (
                (bt <= t_exit) | (t_exit >= tlg)
                | jnp.logical_not(inside2)
            )
            lit = (bt >= tlg) & (tlg < _BIG)
            addl = sdone & lit
            rx = rx + jnp.where(addl, pcx, 0.0)
            ry = ry + jnp.where(addl, pcy, 0.0)
            rz = rz + jnp.where(addl, pcz, 0.0)
            # deferred death (walk 4): the vertex's direct sample is in;
            # the lane can now actually die and regenerate
            alive = alive & jnp.logical_not(sdone & (walk == 4))
            adv = stepping & jnp.logical_not(walk_done | sdone)
        else:
            sdone = walk_done & (walk < 0)  # never
            adv = stepping & jnp.logical_not(walk_done)
        cellp = jnp.where(
            adv, (ix2 << 10) | (iy2 << 5) | iz2, cellp
        )
        tmx = jnp.where(adv, tmx2, tmx)
        tmy = jnp.where(adv, tmy2, tmy)
        tmz = jnp.where(adv, tmz2, tmz)
        walk = jnp.where(walk_done, 2, walk)
        if nee:
            walk = jnp.where(sdone, 0, walk)

        # ---- resolve: winner payload -> emission, shade, next ray/death
        hit = resolving & (bt < _BIG)
        # always-table winner payload (wcell < 0): select by id match
        glob_win = resolving & (wcell < 0)
        zero = jnp.zeros((_SUB, _LANE), f32)
        a_em = [zero, zero, zero]
        a_al = [zero, zero, zero]
        a_rf = zero
        a_c = [zero, zero, zero]
        a_r = zero
        for ar in range(a_pad // 8):
            blk = atbl_ref[pl.ds(ar * 8, 8), :]
            for rr in range(8):
                is_w = glob_win & (bid == blk[rr, 12])
                a_c = [jnp.where(is_w, blk[rr, cc], v)
                       for cc, v in zip((0, 1, 2), a_c)]
                a_r = jnp.where(is_w, blk[rr, 3], a_r)
                a_em = [jnp.where(is_w, blk[rr, cc], v)
                        for cc, v in zip((5, 6, 7), a_em)]
                a_al = [jnp.where(is_w, blk[rr, cc], v)
                        for cc, v in zip((8, 9, 10), a_al)]
                a_rf = jnp.where(is_w, blk[rr, 11], a_rf)
        em_x = jnp.where(glob_win, a_em[0], pay[_G_EX])
        em_y = jnp.where(glob_win, a_em[1], pay[_G_EY])
        em_z = jnp.where(glob_win, a_em[2], pay[_G_EZ])
        al_x = jnp.where(glob_win, a_al[0], pay[_G_AX])
        al_y = jnp.where(glob_win, a_al[1], pay[_G_AY])
        al_z = jnp.where(glob_win, a_al[2], pay[_G_AZ])
        refl = jnp.where(glob_win, a_rf, pay[_G_RF])
        bcx = jnp.where(glob_win, a_c[0], pay[_G_CX])
        bcy = jnp.where(glob_win, a_c[1], pay[_G_CY])
        bcz = jnp.where(glob_win, a_c[2], pay[_G_CZ])

        # shade uniforms (identical keying to the classic kernel)
        ip = ip_offset + s_idx
        wa = pltpu.bitcast(pixel, jnp.uint32) ^ k0
        wb = k1 ^ (pltpu.bitcast(ip, jnp.uint32)
                   * jnp.uint32(_STREAM_IP_MULT))

        if config.has_env and config.mode == Mode.FULL:
            live_miss = resolving & jnp.logical_not(bt < _BIG)
            ex_, ey_, ez_ = (f32(cv) for cv in config.env_emission)
            rx = rx + jnp.where(live_miss, wx * ex_, 0.0)
            ry = ry + jnp.where(live_miss, wy * ey_, 0.0)
            rz = rz + jnp.where(live_miss, wz * ez_, 0.0)

        hx = ox + bt * dx
        hy = oy + bt * dy
        hz = oz + bt * dz
        nx0 = hx - bcx
        ny0 = hy - bcy
        nz0 = hz - bcz
        nrm_x, nrm_y, nrm_z = _normalize3(
            jnp.where(hit, nx0, 1.0), jnp.where(hit, ny0, 0.0),
            jnp.where(hit, nz0, 0.0),
        )
        if config.flip_normals:
            ndot = nrm_x * dx + nrm_y * dy + nrm_z * dz
            flip = ndot < 0.0
            nlx = jnp.where(flip, nrm_x, -nrm_x)
            nly = jnp.where(flip, nrm_y, -nrm_y)
            nlz = jnp.where(flip, nrm_z, -nrm_z)
        else:
            nlx, nly, nlz = nrm_x, nrm_y, nrm_z

        if nee:
            # emission pickup of the NEE-sampled light is suppressed when
            # the PREVIOUS vertex direct-sampled it (classic semantics:
            # ops/wavefront.py / _mega_kernel's per-slot bits; one slot)
            li_f = f32(float(config.nee_lights[0]))
            hit_sup = (bid == li_f) & ((sup & 1) == 1)
            keep = hit & jnp.logical_not(hit_sup)
        else:
            keep = hit
        rx = rx + jnp.where(keep, wx * em_x, 0.0)
        ry = ry + jnp.where(keep, wy * em_y, 0.0)
        rz = rz + jnp.where(keep, wz * em_z, 0.0)

        sa, sb, sc_, sd_ = _pcg4d(
            wa, wb,
            pltpu.bitcast(depth, jnp.uint32) + jnp.uint32(_GOLDEN),
            jnp.broadcast_to(k0 + k1, wa.shape),
        )
        u_rr = _to_unit(sa)
        u_b1 = _to_unit(sb)
        u_b2 = _to_unit(sc_)
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

        r1 = f32(2.0 * np.pi) * u_b1
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

        nd = nrm_x * dx + nrm_y * dy + nrm_z * dz
        msx = dx - nrm_x * (2.0 * nd)
        msy = dy - nrm_y * (2.0 * nd)
        msz = dz - nrm_z * (2.0 * nd)

        into = (nrm_x * nlx + nrm_y * nly + nrm_z * nlz) > 0.0
        nc = f32(1.0)
        nt = f32(config.ior)
        nnt = jnp.where(into, nc / nt, nt / nc)
        ddn = dx * nlx + dy * nly + dz * nlz
        cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
        tir = cos2t < 0.0
        sq = jnp.sqrt(jnp.maximum(cos2t, 0.0))
        sgn = jnp.where(into, 1.0, -1.0)
        tfac = sgn * (ddn * nnt + sq)
        tdx = dx * nnt - nrm_x * tfac
        tdy = dy * nnt - nrm_y * tfac
        tdz = dz * nnt - nrm_z * tfac
        tdx, tdy, tdz = _normalize3(
            jnp.where(tir, 1.0, tdx), jnp.where(tir, 0.0, tdy),
            jnp.where(tir, 0.0, tdz),
        )
        a_ = nt - nc
        b2_ = nt + nc
        r0_ = (a_ * a_) / (b2_ * b2_)
        cterm = 1.0 - jnp.where(into, -ddn, tdx * nrm_x + tdy * nrm_y
                                + tdz * nrm_z)
        re = r0_ + (1.0 - r0_) * cterm * cterm * cterm * cterm * cterm
        tr_ = 1.0 - re
        p_refl = 0.25 + 0.5 * re
        choose_refl = u_ch < p_refl
        use_spec_dir = jnp.logical_or(tir, choose_refl)
        rfx = jnp.where(use_spec_dir, msx, tdx)
        rfy = jnp.where(use_spec_dir, msy, tdy)
        rfz = jnp.where(use_spec_dir, msz, tdz)
        refr_w = jnp.where(
            tir, 1.0,
            jnp.where(choose_refl, re / p_refl, tr_ / (1.0 - p_refl)),
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
            is_refr,
            jnp.logical_and(jnp.logical_not(tir),
                            jnp.logical_not(choose_refl)),
        )
        eps_off = jnp.where(transmitted, -config.shading_eps,
                            config.shading_eps)
        nox = hx + eps_off * nlx
        noy = hy + eps_off * nly
        noz = hz + eps_off * nlz

        # ---- NEE: cone-sample the light at surviving diffuse vertices;
        # the occlusion test becomes a SHADOW GRID WALK (walk state 3/4)
        # instead of the classic full-table sweep — the same uniforms
        # (_NEE_SALT slot 0, keyed by pre-increment depth), the same cone
        # math, the same lit rule (sbt >= t_light with both sides from
        # identical _shadow_tt arithmetic; the light rides the always
        # sweep at shadow-walk init, so the fold carries its candidate)
        if nee:
            lcx = atbl_ref[light_row, 0]
            lcy = atbl_ref[light_row, 1]
            lcz = atbl_ref[light_row, 2]
            lrr = atbl_ref[light_row, 3]
            leps = atbl_ref[light_row, 4]
            lex = atbl_ref[light_row, 5]
            ley = atbl_ref[light_row, 6]
            lez = atbl_ref[light_row, 7]
            swx = lcx - nox
            swy = lcy - noy
            swz = lcz - noz
            d2 = swx * swx + swy * swy + swz * swz
            inside_sh = d2 <= lrr * lrr
            cos_a_max = jnp.sqrt(jnp.maximum(
                1.0 - (lrr * lrr) / jnp.maximum(d2, 1e-12), 0.0))
            na_, nb_, _, _ = _pcg4d(
                wa, wb,
                pltpu.bitcast(depth, jnp.uint32) + jnp.uint32(_NEE_SALT),
                jnp.broadcast_to(k0 + k1, wa.shape),
            )
            nu0 = _to_unit(na_)
            nu1 = _to_unit(nb_)
            cos_a = 1.0 - nu0 + nu0 * cos_a_max
            sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))
            nphi = f32(2.0 * np.pi) * nu1
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
            t_light = _shadow_tt(nox, noy, noz, ldx, ldy, ldz,
                                 lcx, lcy, lcz, lrr, leps)
            cosine = jnp.maximum(ldx * nlx + ldy * nly + ldz * nlz, 0.0)
            omega = f32(2.0 * np.pi) * (1.0 - cos_a_max)
            scale = cosine * omega * f32(1.0 / np.pi)
            sampled = (hit & survive & is_diff
                       & jnp.logical_not(inside_sh))
            samp = resolving & sampled
            sdx = jnp.where(samp, ldx, sdx)
            sdy = jnp.where(samp, ldy, sdy)
            sdz = jnp.where(samp, ldz, sdz)
            pcx = jnp.where(samp, wx * fx_ * lex * scale, pcx)
            pcy = jnp.where(samp, wy * fy_ * ley * scale, pcy)
            pcz = jnp.where(samp, wz * fz_ * lez * scale, pcz)
            tlg = jnp.where(samp, t_light, tlg)
            sup = jnp.where(resolving, jnp.where(samp, 1, 0), sup)
        else:
            samp = resolving & (walk < 0)  # never

        parent = jnp.logical_and(hit, survive)
        ox = jnp.where(parent, nox, ox)
        oy = jnp.where(parent, noy, oy)
        oz = jnp.where(parent, noz, oz)
        dx = jnp.where(parent, newdx, dx)
        dy = jnp.where(parent, newdy, dy)
        dz = jnp.where(parent, newdz, dz)
        wx = jnp.where(parent, wx * wfx, wx)
        wy = jnp.where(parent, wy * wfy, wy)
        wz = jnp.where(parent, wz * wfz, wz)
        depth = jnp.where(resolving, depth + 1, depth)
        bounce_alive = jnp.logical_and(parent, depth < config.max_depth)
        # resolving lanes: stay alive with a fresh ray (walk=0), enter a
        # shadow walk (3 = then continue, 4 = then die), or die. Logical
        # ops, not jnp.where — Mosaic rejects i1-valued selects.
        alive = (resolving & (bounce_alive | samp)) | (
            jnp.logical_not(resolving) & alive
        )
        if nee:
            walk = jnp.where(
                resolving,
                jnp.where(samp, jnp.where(bounce_alive, 3, 4), 0),
                walk,
            )
        else:
            walk = jnp.where(resolving, 0, walk)

        # ---- regen dead lanes (classic block, walk joins the reset)
        alive_i2 = alive.astype(jnp.int32)
        need = jnp.logical_and(
            jnp.logical_not(alive), s_idx < budget - 1
        )
        cur_lum = (rx + ry + rz) * f32(1.0 / 3.0)
        delta = cur_lum - m1
        m2 = jnp.where(need, m2 + delta * delta, m2)
        m1 = jnp.where(need, cur_lum, m1)
        s_new = jnp.where(need, s_idx + 1, s_idx)
        ip2 = ip_offset + s_new
        wa2 = pltpu.bitcast(pixel, jnp.uint32) ^ k0
        wb2 = k1 ^ (pltpu.bitcast(ip2, jnp.uint32)
                    * jnp.uint32(_STREAM_IP_MULT))
        js = config.jitter_size
        group = (ip2 // config.spp_per_cell) % (js * js)
        cx_cell = (group % js).astype(f32)
        cy_cell = (group // js).astype(f32)
        ua, ub, _, _ = _pcg4d(
            wa2, wb2,
            jnp.full(wa2.shape, jnp.uint32(_CAMERA_SALT)),
            jnp.broadcast_to(k0 + k1, wa2.shape),
        )
        u0 = _to_unit(ua)
        u1 = _to_unit(ub)
        if config.filter == Filter.TENT:
            r0t = 2.0 * u0
            r1t = 2.0 * u1
            f0 = jnp.where(r0t < 1.0, jnp.sqrt(r0t) - 1.0,
                           1.0 - jnp.sqrt(jnp.maximum(2.0 - r0t, 0.0)))
            f1 = jnp.where(r1t < 1.0, jnp.sqrt(r1t) - 1.0,
                           1.0 - jnp.sqrt(jnp.maximum(2.0 - r1t, 0.0)))
            off0 = (cx_cell + 0.5 + f0) / js - 0.5
            off1 = (cy_cell + 0.5 + f1) / js - 0.5
        else:
            off0 = (cx_cell + u0) / js - 0.5
            off1 = (cy_cell + u1) / js - 0.5
        sx2 = (pix_col.astype(f32) + 0.5 + off0) / W - 0.5
        sy2 = (pix_row.astype(f32) + 0.5 + off1) / H - 0.5
        if config.camera_model == CameraModel.MATRIX:
            sx2 = 2.0 * sx2
            sy2 = 2.0 * sy2
        axc, ayc, azc = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
        bxc, byc, bzc = cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5]
        cxv, cyv, czv = cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8]
        o0x, o0y, o0z = cam_ref[0, 9], cam_ref[0, 10], cam_ref[0, 11]
        push = cam_ref[0, 12]
        gdx = sx2 * axc + sy2 * bxc + cxv
        gdy = sx2 * ayc + sy2 * byc + cyv
        gdz = sx2 * azc + sy2 * bzc + czv
        gox = o0x + gdx * push
        goy = o0y + gdy * push
        goz = o0z + gdz * push
        ndx, ndy, ndz = _normalize3(gdx, gdy, gdz)
        if config.aperture > 0.0:
            la, lb, _, _ = _pcg4d(
                wa2, wb2,
                jnp.full(wa2.shape, jnp.uint32(_LENS_SALT)),
                jnp.broadcast_to(k0 + k1, wa2.shape),
            )
            lu0 = _to_unit(la)
            lu1 = _to_unit(lb)
            lrad = f32(config.aperture) * jnp.sqrt(lu0)
            lth = f32(2.0 * np.pi) * lu1
            lx_ = lrad * jnp.cos(lth)
            ly_ = lrad * jnp.sin(lth)
            rnx, rny, rnz = _normalize3(
                jnp.broadcast_to(axc, lx_.shape),
                jnp.broadcast_to(ayc, lx_.shape),
                jnp.broadcast_to(azc, lx_.shape),
            )
            unx, uny, unz = _normalize3(
                jnp.broadcast_to(bxc, lx_.shape),
                jnp.broadcast_to(byc, lx_.shape),
                jnp.broadcast_to(bzc, lx_.shape),
            )
            fdist = f32(config.focal_distance)
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
        one = f32(1.0)
        wx = jnp.where(need, one, wx)
        wy = jnp.where(need, one, wy)
        wz = jnp.where(need, one, wz)
        depth = jnp.where(need, 0, depth)
        alive = jnp.logical_or(alive, need)
        walk = jnp.where(need, 0, walk)
        sup = jnp.where(need, 0, sup)

        # ---- walk init: always sweep + grid clip, serving BOTH fresh
        # rays (main walks) and freshly-sampled shadow rays — each lane
        # is in at most one flavor, so one sweep with a per-lane
        # direction select covers both
        initm_main = jnp.logical_and(alive, walk == 0)
        if nee:
            initm = initm_main | samp
            idx_ = jnp.where(samp, sdx, dx)
            idy_ = jnp.where(samp, sdy, dy)
            idz_ = jnp.where(samp, sdz, dz)
        else:
            initm = initm_main
            idx_, idy_, idz_ = dx, dy, dz

        big0 = jnp.full((_SUB, _LANE), _BIG, f32)
        abt = big0
        abid = jnp.full((_SUB, _LANE), _BIGID, f32)
        for ar in range(a_pad // 8):
            blk = atbl_ref[pl.ds(ar * 8, 8), :]
            for rr in range(8):
                tt1 = _shadow_tt(ox, oy, oz, idx_, idy_, idz_,
                                 blk[rr, 0], blk[rr, 1], blk[rr, 2],
                                 blk[rr, 3], blk[rr, 4])
                sid_f = blk[rr, 12]
                upd1 = (tt1 < abt) | ((tt1 == abt) & (sid_f < abid))
                upd1 = upd1 & (tt1 < _BIG)
                abt = jnp.where(upd1, tt1, abt)
                abid = jnp.where(upd1, sid_f, abid)

        def axis_clip(o_, d_, g0, g1):
            dn = jnp.where(jnp.abs(d_) < tiny,
                           jnp.where(d_ >= 0.0, tiny, -tiny), d_)
            inv = 1.0 / dn
            ta = (g0 - o_) * inv
            tb = (g1 - o_) * inv
            return jnp.minimum(ta, tb), jnp.maximum(ta, tb)

        t0x, t1x = axis_clip(ox, idx_, glx, ghx)
        t0y, t1y = axis_clip(oy, idy_, gly, ghy)
        t0z, t1z = axis_clip(oz, idz_, glz, ghz)
        t_in = jnp.maximum(jnp.maximum(t0x, t0y), t0z)
        t_out = jnp.minimum(jnp.minimum(t1x, t1y), t1z)
        enter = jnp.maximum(t_in, 0.0)
        hits_grid = (enter <= t_out) & (t_out > 0.0)
        px = ox + idx_ * enter
        py = oy + idy_ * enter
        pz = oz + idz_ * enter

        def cell_of(p, g0, invc, n_):
            ci = ((p - g0) * invc).astype(jnp.int32)
            return jnp.clip(ci, 0, n_ - 1)

        ixn = cell_of(px, glx, f32(1.0) / clx, nx)
        iyn = cell_of(py, gly, f32(1.0) / cly, ny)
        izn = cell_of(pz, glz, f32(1.0) / clz, nz)

        def axis_tm(o_, d_, g0, cl_, ci):
            dn = jnp.where(jnp.abs(d_) < tiny,
                           jnp.where(d_ >= 0.0, tiny, -tiny), d_)
            nxt = g0 + (ci + jnp.where(d_ >= 0.0, 1, 0)).astype(f32) * cl_
            return jnp.where(jnp.abs(d_) < tiny, _BIG, (nxt - o_) / dn)

        tmxn = axis_tm(ox, idx_, glx, clx, ixn)
        tmyn = axis_tm(oy, idy_, gly, cly, iyn)
        tmzn = axis_tm(oz, idz_, glz, clz, izn)
        # rays missing the grid keep BIG t_max so a shadow walk that
        # never enters a cell resolves on its first step (t_exit >= tlg)
        tmxn = jnp.where(hits_grid, tmxn, _BIG)
        tmyn = jnp.where(hits_grid, tmyn, _BIG)
        tmzn = jnp.where(hits_grid, tmzn, _BIG)

        bt = jnp.where(initm, abt, bt)
        bid = jnp.where(initm, abid, bid)
        wcell = jnp.where(initm, -1, wcell)
        cellp = jnp.where(
            initm & hits_grid, (ixn << 10) | (iyn << 5) | izn, cellp
        )
        tmx = jnp.where(initm, tmxn, tmx)
        tmy = jnp.where(initm, tmyn, tmy)
        tmz = jnp.where(initm, tmzn, tmz)
        # main rays: walk (or resolve immediately if the grid is missed);
        # shadow lanes keep their walk state (3/4) set at resolve
        walk = jnp.where(initm_main, jnp.where(hits_grid, 1, 2), walk)
        # one traced ray per MAIN walk init (same rays/s semantics as
        # classic: every bounce launches exactly one ray; shadow walks
        # are part of the bounce, as in the classic fused NEE sweep)
        nrays = nrays + initm_main.astype(jnp.int32)

        out = [it + 1, ox, oy, oz, dx, dy, dz, wx, wy, wz, rx, ry, rz,
               depth, s_new, alive.astype(jnp.int32), nrays, m1, m2,
               tmx, tmy, tmz, bt, bid, cellp, walk, wcell, sup]
        if nee:
            out += [sdx, sdy, sdz, pcx, pcy, pcz, tlg]
        return tuple(out)

    carry = [jnp.asarray(0, jnp.int32), ox0, oy0, oz0, dx0, dy0, dz0,
             wx0, wy0, wz0, rx0, ry0, rz0, depth0, s_idx0, alive0,
             nrays0, m10, m20, tmx0, tmy0, tmz0, bt0, bid0, cell0,
             walk0, wcell0, sup0]
    if nee:
        carry += [sdx0, sdy0, sdz0, pcx0, pcy0, pcz0, tlg0]
    carry = jax.lax.while_loop(loop_cond, loop_body, tuple(carry))
    (_, ox, oy, oz, dx, dy, dz, wx, wy, wz, rx, ry, rz, depth, s_idx,
     alive_i, nrays, m1, m2, tmx, tmy, tmz, bt, bid, cellp, walk,
     wcell, sup, *extra) = carry

    def wf_(idx, v):
        f_out[pl.ds(8 * idx, 8), :] = v

    def wi_(idx, v):
        i_out[pl.ds(8 * idx, 8), :] = v

    wf_(_F_OX, ox); wf_(_F_OY, oy); wf_(_F_OZ, oz)
    wf_(_F_DX, dx); wf_(_F_DY, dy); wf_(_F_DZ, dz)
    wf_(_F_WX, wx); wf_(_F_WY, wy); wf_(_F_WZ, wz)
    wf_(_F_RX, rx); wf_(_F_RY, ry); wf_(_F_RZ, rz)
    wf_(_F_M1, m1); wf_(_F_M2, m2)
    wf_(_F_TMX, tmx); wf_(_F_TMY, tmy); wf_(_F_TMZ, tmz)
    wf_(_F_BT, bt); wf_(_F_BID, bid)
    wi_(_I_DEPTH, depth)
    wi_(_I_SIDX, s_idx)
    wi_(_I_ALIVE, alive_i)
    wi_(_I_RAYS, nrays)
    wi_(_I_SUP, sup)
    wi_(_I_CELL, cellp)
    wi_(_I_WALK, walk)
    wi_(_I_WCELL, wcell)
    i_out[pl.ds(8 * _I_BUDGET, 8), :] = budget
    if nee:
        sdx, sdy, sdz, pcx, pcy, pcz, tlg = extra
        wf_(_F_SDX, sdx); wf_(_F_SDY, sdy); wf_(_F_SDZ, sdz)
        wf_(_F_PCX, pcx); wf_(_F_PCY, pcy); wf_(_F_PCZ, pcz)
        wf_(_F_TLG, tlg)


def init_stream_dda_state(config: RenderConfig, n_rows: int | None = None):
    """Fresh (f, i) state with the DDA walk planes appended (+ the NEE
    shadow-walk planes when config.nee_lights is set)."""
    n_rows, G, n_tiles, n_cols = _stream_geometry(config, n_rows)
    f0 = jnp.zeros((_SUB * _nf_d(config), n_cols), jnp.float32)
    i0 = jnp.concatenate(
        [
            jnp.zeros((_SUB, n_cols), jnp.int32),        # depth
            jnp.full((_SUB, n_cols), -1, jnp.int32),     # s_idx
            jnp.zeros((_SUB, n_cols), jnp.int32),        # alive
            jnp.zeros((_SUB, n_cols), jnp.int32),        # rays
            jnp.zeros((_SUB, n_cols), jnp.int32),        # budget
            jnp.zeros((_SUB, n_cols), jnp.int32),        # NEE suppress
            jnp.full((_SUB, n_cols), -1, jnp.int32),     # walk cell
            jnp.zeros((_SUB, n_cols), jnp.int32),        # walk state
            jnp.full((_SUB, n_cols), -1, jnp.int32),     # winner cell
        ],
        axis=0,
    )
    return f0, i0


@functools.partial(
    jax.jit,
    static_argnames=("config", "k", "nb", "lo", "cell", "eps_local",
                     "light_row", "interpret", "n_rows"),
)
def _stream_step_dda_jit(
    always_tbl, cells3, cam_vec, key_words, f, i, n_iters,
    ip_offset, row_offset,
    config: RenderConfig, k, nb, lo, cell, eps_local,
    light_row=None, n_rows=None, interpret=False,
):
    n_rows, G, n_tiles, n_cols = _stream_geometry(config, n_rows)
    nf = _nf_d(config)
    ip = jnp.stack([
        jnp.asarray(ip_offset, jnp.int32),
        jnp.asarray(row_offset, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(n_iters, jnp.int32),
    ]).reshape(1, 4)
    kernel = functools.partial(
        _stream_dda_kernel,
        config=config, n_cols=n_cols, k=k, nb=nb, lo=lo, cell=cell,
        eps_local=eps_local, a_pad=always_tbl.shape[0],
        light_row=light_row,
    )
    n_cells = nb[0] * nb[1] * nb[2]
    rays_before = jax.lax.dynamic_slice_in_dim(i, 8 * _I_RAYS, 8, axis=0)
    f, i = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((always_tbl.shape[0], 16), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, _NGF * k, n_cells), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUB * nf, _LANE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUB * _NI_D, _LANE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_SUB * nf, _LANE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUB * _NI_D, _LANE), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((_SUB * nf, n_cols), jnp.float32),
            jax.ShapeDtypeStruct((_SUB * _NI_D, n_cols), jnp.int32),
        ],
        input_output_aliases={5: 0, 6: 1},
        # the per-row (C, LANE) one-hot + (NGF*K, LANE) gather temporaries
        # push the scoped-vmem stack past the 16 MB default at C ~ 400
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(key_words, ip, cam_vec, always_tbl, cells3, f, i)
    rays = jnp.sum(
        jax.lax.dynamic_slice_in_dim(i, 8 * _I_RAYS, 8, axis=0)
        - rays_before
    )
    return f, i, rays


def stream_step_dda(
    scene: SphereScene,
    camera,
    config: RenderConfig,
    key: jax.Array,
    f: jnp.ndarray,
    i: jnp.ndarray,
    sample_budget,
    n_iters,
    tables: StreamDDATables,
    ip_offset=0,
    row_offset=0,
    n_rows: int | None = None,
    interpret: bool | None = None,
):
    """Advance the DDA streaming wavefront by up to n_iters iterations
    (each iteration = one DDA step / resolve / init per lane — bounces
    cost ~walk_steps+1 iterations, so budget ~5x the classic n_iters).
    Same contract as ops/megakernel.py::stream_step otherwise."""
    if config.split_budget != 1:
        raise ValueError("streaming requires split_budget == 1")
    if config.mode != Mode.FULL:
        raise ValueError("streaming renders Mode.FULL only")
    light_row = None
    if config.nee_lights:
        if len(config.nee_lights) != 1:
            raise ValueError(
                "stream_step_dda supports exactly ONE NEE light slot "
                f"(got {len(config.nee_lights)}) — multi-light scenes "
                "route through the classic schedulers"
            )
        if len(tables.light_rows) != 1:
            raise ValueError(
                "tables were built without the NEE config — rebuild "
                "build_stream_dda_tables with the same config"
            )
        light_row = int(tables.light_rows[0])
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if sample_budget is not None:
        i = set_sample_budget(i, sample_budget, config, n_rows)
    kw = jax.random.key_data(key).astype(jnp.uint32).reshape(1, -1)[:, :2]
    cam_vec = build_camera_vec(camera, config)
    return _stream_step_dda_jit(
        tables.always_tbl, tables.cells3, cam_vec, kw, f, i, n_iters,
        ip_offset, row_offset,
        config=config, k=tables.k, nb=tables.nb, lo=tables.lo,
        cell=tables.cell, eps_local=tables.eps_local,
        light_row=light_row, n_rows=n_rows, interpret=interpret,
    )
