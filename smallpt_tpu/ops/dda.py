"""Per-RAY grid traversal (3D-DDA) intersect kernel — the acceleration that
actually accelerates.

The reference's native core is a GPU BVH whose defining property is a
per-ray pair-count cut (OptiX Prime model build /root/reference/
smallpt.cpp:489-530, closest-hit query :578-582 serving the whole engine
via :605). Rounds 2-4 measured that per-TILE culling cannot deliver that
cut on interior scenes (BASELINE.md "Why the binned scheduler loses":
every pixel tile reaches every chunk) and that ops/pair MXU offload has a
~2x ceiling. This module is the per-RAY structure both verdicts asked
for: each LANE walks its own ray through a uniform grid of sphere lists.

TPU mapping (the hard part — lanes cannot do divergent loads):

- Each lane carries DDA state (cell coords, per-axis next-crossing t) in
  vector registers; one kernel step advances every lane one cell.
- The lane's cell CONTENTS are fetched with an exact one-hot MXU gather:
  a (C, R) one-hot of lane cell ids against a (D, C) per-cell table.
  Exactness at bf16 speed: every f32 table value is pre-split into three
  bf16-REPRESENTABLE f32 terms (hi/mid/lo, non-overlapping mantissa
  windows); three DEFAULT-precision dots against the same one-hot then
  reconstruct the exact f32 (1.0 is exact in bf16, the per-cell column
  has a single nonzero, and the three partial sums carry disjoint
  mantissas). This sidesteps the r4 lesson that DEFAULT-precision
  gathers of raw f32 mangle values (commit c56fab0) without paying
  HIGHEST's 6-pass cost.
- Early exit is per-lane and conservative: a lane is done when its best
  hit distance (including the always-swept globals) is <= the exit
  distance of the cell just tested — every sphere whose true hit point
  lies in the visited prefix has then been tested, because spheres are
  binned into EVERY cell their (margin-expanded) AABB overlaps.

Exactness vs the brute kernel (ops/intersect_pallas.py), pinned in
tests/test_dda.py:

- Part A (the stable citardauq sweep of the first MAX_BIG big-first
  rows) is the IDENTICAL table, arithmetic, and fold as the brute
  kernel — including its duplication of the lowest-id small spheres.
- Local spheres use fast_body's exact op SEQUENCE, and the fold is
  lexicographic (t, original id), which equals the brute part-B "first
  chunk wins ties" rule because part B is laid out in original-id
  order. The one residual noise source is FMA contraction: XLA
  contracts mul+add chains independently per compiled program, so the
  same (ray, sphere) pair can differ by ~1 ulp between the two kernels
  (measured: ~0.3% of lanes, same winner, |dt|/t < 3e-6 — the same
  floor intersect_spheres_hybrid_diff documents). The gates therefore
  pin: hit/miss identical, winner ids identical, t within a few ulp.
- Cell overflow (occupancy beyond the per-cell capacity K) never drops
  a sphere: overflowed spheres join an always-swept fast list.

Worst-lane economics (why this kernel is only step one): in a per-pass
launch the tile's while_loop runs until its SLOWEST lane finishes, and in
a uniform-density scene ~0.7% of rays traverse the whole grid, so nearly
every 1024-lane tile pays near-max steps while most lanes idle after ~3
cells. The streaming scheduler already solves exactly this for sample
regeneration — lanes that finish restart immediately — so the flagship
integration is the DDA step fused into the streaming megakernel
(ops/megakernel.py), where every step is ~full-occupancy useful work.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smallpt_tpu.core.math import safe_normalize
from smallpt_tpu.core.scene import SphereScene
from smallpt_tpu.ops.intersect import Hit
from smallpt_tpu.ops.intersect_pallas import (
    _BIG,
    _RAY_TILE,
    _S_CHUNK,
    _chunk_minloc,
    MAX_BIG,
    STABLE_RADIUS,
    build_sphere_table,
)

_BIGID = 3.0e38  # id sentinel for empty slots (f32 ids are < 2^24)


def _split_bf16x3(v: np.ndarray) -> np.ndarray:
    """Split f32 values into three bf16-representable f32 terms whose sum
    reconstructs v exactly (disjoint mantissa windows: 8+8+8 >= 24 bits).

    Returns (3,) + v.shape f32. Each term round-trips bf16 exactly, so a
    DEFAULT-precision (single-bf16-pass) matmul against an exact one-hot
    gathers it without rounding."""
    v = np.asarray(v, np.float32)

    def to_bf16(x):
        # round-to-nearest-even bf16 via jnp (numpy has no bfloat16)
        return np.asarray(jnp.asarray(x, jnp.float32).astype(jnp.bfloat16)
                          .astype(jnp.float32))

    hi = to_bf16(v)
    r1 = (v - hi).astype(np.float32)
    mid = to_bf16(r1)
    lo = (r1 - mid).astype(np.float32)
    out = np.stack([hi, mid, lo])
    # paranoia: the decomposition must be exact (float32 bit identity)
    assert ((out[0] + out[1] + out[2]) == v).all(), "bf16x3 split not exact"
    return out


@dataclasses.dataclass(frozen=True)
class DDAGrid:
    """Static per-scene tables for the DDA kernel. Built eagerly with
    numpy (scenes are eager values; the renderer builds accel structures
    OUTSIDE jit — building under a tracer would silently no-op). Not a
    pytree: host-side handle only."""

    part_a: jnp.ndarray     # (MAX_BIG, 8) f32 — EXACT build_sphere_table
                            # part A rows (stable sweep)
    perm_a: jnp.ndarray     # (MAX_BIG,) int32 slot -> original id
    overflow: jnp.ndarray   # (F_pad, 8) f32 [cx cy cz r eps id 0 0];
                            # F_pad == 0 when nothing overflowed
    cells3: jnp.ndarray     # (3, D, C) f32 — hi/mid/lo split of the
                            # per-cell table; D = 5*K rows
                            # [cx*K, cy*K, cz*K, r*K, id*K]
    k: int                  # spheres per cell (capacity, multiple of 8)
    nb: tuple               # (nx, ny, nz)
    lo: tuple               # grid lower corner (3 floats, STATIC)
    cell: tuple             # cell size (3 floats, STATIC)
    eps_local: float        # uniform root-rejection eps of the local class
    n_local: int            # diagnostic: spheres in the grid
    n_overflow: int         # diagnostic: overflowed sphere-cell entries

    @property
    def n_cells(self) -> int:
        nx, ny, nz = self.nb
        return nx * ny * nz


def build_dda_grid(
    scene: SphereScene,
    occ_target: float = 24.0,
    k_max: int = 128,
    nb=None,
    eps: float = 1e-4,
    eps_rel: float = 5e-7,
    stable_radius: float = STABLE_RADIUS,
    margin_rel: float = 1e-4,
) -> DDAGrid:
    """Build the uniform-grid tables for an eager sphere scene.

    occ_target picks the cell size so a cell holds ~occ_target spheres
    (before overlap duplication); nb overrides with explicit per-axis
    counts. Spheres are binned into every cell their margin-expanded AABB
    overlaps; per-cell lists beyond k_max spill into the always-swept
    overflow table (correctness never depends on capacity)."""
    if eps_rel * stable_radius > eps:
        raise ValueError(
            "dda grid needs a uniform local-class eps: eps_rel*stable_radius"
            f" = {eps_rel * stable_radius} > eps = {eps}"
        )
    c = np.asarray(scene.center, np.float64)
    r = np.asarray(scene.radius, np.float64)
    lids = np.nonzero(r < stable_radius)[0]
    if lids.size == 0:
        raise ValueError("scene has no local spheres — use the brute sweep")

    table, perm, _, _ = build_sphere_table(
        scene, eps=eps, eps_rel=eps_rel, stable_radius=stable_radius
    )
    part_a = table[:MAX_BIG]
    perm_a = perm[:MAX_BIG]

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

    # bin: sphere -> every cell its margin-expanded AABB overlaps
    s_lo = np.clip(((lc - lr[:, None] - margin - ext_lo) / cell), 0, None)
    s_hi = np.clip(((lc + lr[:, None] + margin - ext_lo) / cell), 0, None)
    s_lo = np.minimum(s_lo.astype(np.int64), np.asarray(nb) - 1)
    s_hi = np.minimum(s_hi.astype(np.int64), np.asarray(nb) - 1)

    lists: list[list[int]] = [[] for _ in range(n_cells)]
    overflow_ids: set[int] = set()
    # original-id order (lids is sorted) => per-cell lists are id-sorted,
    # matching the brute part-B tie-break for free
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

    # per-cell value rows: [cx*K, cy*K, cz*K, r*K, id*K] x C
    vals = np.zeros((5, k, n_cells), np.float32)
    vals[4] = _BIGID  # empty-slot id sentinel
    for cl, l in enumerate(lists):
        if not l:
            continue
        ids = np.asarray(l)
        vals[0, : len(l), cl] = c[ids, 0]
        vals[1, : len(l), cl] = c[ids, 1]
        vals[2, : len(l), cl] = c[ids, 2]
        vals[3, : len(l), cl] = r[ids]
        vals[4, : len(l), cl] = ids
    cells3 = _split_bf16x3(vals.reshape(5 * k, n_cells))

    ovf = sorted(overflow_ids)
    f_pad = -(-len(ovf) // _S_CHUNK) * _S_CHUNK if ovf else 0
    of_tbl = np.zeros((f_pad, 8), np.float32)
    if ovf:
        ids = np.asarray(ovf)
        of_tbl[: len(ovf), 0:3] = c[ids]
        of_tbl[: len(ovf), 3] = r[ids]
        of_tbl[: len(ovf), 4] = eps
        of_tbl[: len(ovf), 5] = ids
    of_tbl[len(ovf):, 5] = _BIGID

    return DDAGrid(
        part_a=jnp.asarray(np.asarray(part_a)),
        perm_a=jnp.asarray(np.asarray(perm_a)),
        overflow=jnp.asarray(of_tbl),
        cells3=jnp.asarray(cells3.reshape(3, 5 * k, n_cells)),
        k=int(k),
        nb=nb,
        lo=tuple(float(v) for v in ext_lo),
        cell=tuple(float(v) for v in cell),
        eps_local=float(eps),
        n_local=int(lids.size),
        n_overflow=int(len(ovf)),
    )


def _dda_kernel(
    org_ref, dir_ref, pa_ref, of_ref, cells_ref, t_ref, i_ref,
    *, k, nb, lo, cell, eps_local, n_overflow_chunks,
):
    """One ray tile: stable part-A sweep + overflow fast sweep + per-lane
    DDA walk. Outputs (1, R) best t and an id encoding: >= 0 original
    sphere id (local/overflow winner), < 0 -(part-A slot + 1)."""
    f = jnp.float32
    nx, ny, nz = nb
    n_cells = nx * ny * nz
    max_steps = nx + ny + nz + 3

    ox = org_ref[0:1, :]
    oy = org_ref[1:2, :]
    oz = org_ref[2:3, :]
    dx = dir_ref[0:1, :]
    dy = dir_ref[1:2, :]
    dz = dir_ref[2:3, :]

    # ---- part A: stable citardauq sweep, byte-for-byte the brute kernel's
    def stable_body(c_, carry):
        bt, bi = carry
        tbl = pa_ref[pl.ds(c_ * _S_CHUNK, _S_CHUNK), :]
        scx, scy, scz, sr, seps = (tbl[:, 0:1], tbl[:, 1:2], tbl[:, 2:3],
                                   tbl[:, 3:4], tbl[:, 4:5])
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
        s = jnp.sqrt(jnp.maximum(det, 0.0))
        opn = jnp.sqrt(b * b + pp)
        cc = (opn - sr) * (opn + sr)
        denom = b + s
        t_near = jnp.where(
            denom > 0.0, cc / jnp.where(denom == 0.0, 1.0, denom), -_BIG
        )
        tt = jnp.where(t_near > seps, t_near,
                       jnp.where(denom > seps, denom, _BIG))
        tt = jnp.where((det >= 0.0) & (sr > 0.0), tt, _BIG)
        return _chunk_minloc(tt, c_, bt, bi, 0)

    init_a = (
        jnp.full((1, _RAY_TILE), _BIG, f),
        jnp.zeros((1, _RAY_TILE), jnp.int32),
    )
    bta, bia = jax.lax.fori_loop(0, MAX_BIG // _S_CHUNK, stable_body, init_a)

    # ---- fast quadratic shared by the overflow sweep and the cell tests:
    # EXACTLY ops/intersect_pallas.py::fast_body's op sequence
    def fast_tt(scx, scy, scz, sr, seps):
        opx = scx - ox
        opy = scy - oy
        opz = scz - oz
        b = opx * dx + opy * dy + opz * dz
        op2 = opx * opx + opy * opy + opz * opz
        det = b * b - op2 + sr * sr
        s = jnp.sqrt(jnp.maximum(det, 0.0))
        t0 = b - s
        t1 = b + s
        tt = jnp.where(t0 > seps, t0, jnp.where(t1 > seps, t1, _BIG))
        return jnp.where((det >= 0.0) & (sr > 0.0), tt, _BIG)

    def fold_b(tt, idf, btb, bidb, valid):
        """Lexicographic (t, original id) fold of a (K, R) candidate block
        into the running local/overflow best."""
        m = jnp.min(tt, axis=0, keepdims=True)
        idc = jnp.min(jnp.where(tt <= m, idf, _BIGID), axis=0, keepdims=True)
        upd = valid & (m < _BIG) & (
            (m < btb) | ((m == btb) & (idc < bidb))
        )
        return jnp.where(upd, m, btb), jnp.where(upd, idc, bidb)

    btb = jnp.full((1, _RAY_TILE), _BIG, f)
    bidb = jnp.full((1, _RAY_TILE), _BIGID, f)

    def overflow_body(c_, carry):
        bt, bi = carry
        tbl = of_ref[pl.ds(c_ * _S_CHUNK, _S_CHUNK), :]
        tt = fast_tt(tbl[:, 0:1], tbl[:, 1:2], tbl[:, 2:3], tbl[:, 3:4],
                     tbl[:, 4:5])
        true1 = jnp.ones((1, _RAY_TILE), bool)
        return fold_b(tt, tbl[:, 5:6], bt, bi, true1)

    if n_overflow_chunks:
        btb, bidb = jax.lax.fori_loop(
            0, n_overflow_chunks, overflow_body, (btb, bidb)
        )

    # ---- DDA setup: clip each lane's ray to the grid box -----------------
    glx, gly, glz = (f(v) for v in lo)
    clx, cly, clz = (f(v) for v in cell)
    ghx = glx + clx * nx
    ghy = gly + cly * ny
    ghz = glz + clz * nz
    tiny = f(1e-20)

    def axis_clip(o, d, g0, g1):
        dn = jnp.where(jnp.abs(d) < tiny, jnp.where(d >= 0.0, tiny, -tiny), d)
        inv = 1.0 / dn
        ta = (g0 - o) * inv
        tb = (g1 - o) * inv
        return jnp.minimum(ta, tb), jnp.maximum(ta, tb), inv

    t0x, t1x, invx = axis_clip(ox, dx, glx, ghx)
    t0y, t1y, invy = axis_clip(oy, dy, gly, ghy)
    t0z, t1z, invz = axis_clip(oz, dz, glz, ghz)
    t_in = jnp.maximum(jnp.maximum(t0x, t0y), t0z)
    t_out = jnp.minimum(jnp.minimum(t1x, t1y), t1z)
    enter = jnp.maximum(t_in, 0.0)
    hits_grid = (enter <= t_out) & (t_out > 0.0)

    def cell_of(p, g0, invc, n):
        ci = ((p - g0) * invc).astype(jnp.int32)  # f32->i32 trunc: proven
        return jnp.clip(ci, 0, n - 1)

    px = ox + dx * enter
    py = oy + dy * enter
    pz = oz + dz * enter
    ix = cell_of(px, glx, f(1.0) / clx, nx)
    iy = cell_of(py, gly, f(1.0) / cly, ny)
    iz = cell_of(pz, glz, f(1.0) / clz, nz)

    def axis_dda(o, d, inv, g0, cl, ci):
        stp = jnp.where(d >= 0.0, 1, -1)
        nxt = g0 + (ci + jnp.where(d >= 0.0, 1, 0)).astype(f) * cl
        tm = jnp.where(jnp.abs(d) < tiny, _BIG, (nxt - o) * inv)
        dt = jnp.where(jnp.abs(d) < tiny, _BIG, cl * jnp.abs(inv))
        return stp, tm, dt

    sx, tmx, dtx = axis_dda(ox, dx, invx, glx, clx, ix)
    sy, tmy, dty = axis_dda(oy, dy, invy, gly, cly, iy)
    sz, tmz, dtz = axis_dda(oz, dz, invz, glz, clz, iz)

    act0 = hits_grid.astype(jnp.int32)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (n_cells, _RAY_TILE), 0)

    def loop_cond(carry):
        it = carry[0]
        return jnp.logical_and(it < max_steps, jnp.any(carry[1] != 0))

    def loop_body(carry):
        (it, act, btb_, bidb_, ix_, iy_, iz_, tmx_, tmy_, tmz_) = carry
        active = act != 0
        cl = (ix_ * ny + iy_) * nz + iz_
        cl = jnp.where(active, cl, -1)
        oh = (iota_c == cl).astype(f)  # (C, R); inactive -> all-zero
        g = None
        for term in range(3):
            d_ = jax.lax.dot_general(
                cells_ref[term], oh, (((1,), (0,)), ((), ())),
                preferred_element_type=f,
                precision=jax.lax.Precision.DEFAULT,
            )
            g = d_ if g is None else g + d_
        scx = g[0 * k:1 * k, :]
        scy = g[1 * k:2 * k, :]
        scz = g[2 * k:3 * k, :]
        sr = g[3 * k:4 * k, :]
        idf = g[4 * k:5 * k, :]
        tt = fast_tt(scx, scy, scz, sr, f(eps_local))
        btb_, bidb_ = fold_b(tt, idf, btb_, bidb_, active)

        # conservative early exit: best-so-far (incl. globals) inside the
        # visited prefix
        t_exit = jnp.minimum(jnp.minimum(tmx_, tmy_), tmz_)
        done = jnp.minimum(bta, btb_) <= t_exit

        ax_ = (tmx_ <= tmy_) & (tmx_ <= tmz_)
        ay_ = jnp.logical_not(ax_) & (tmy_ <= tmz_)
        az_ = jnp.logical_not(ax_) & jnp.logical_not(ay_)
        ix_ = jnp.where(ax_, ix_ + sx, ix_)
        iy_ = jnp.where(ay_, iy_ + sy, iy_)
        iz_ = jnp.where(az_, iz_ + sz, iz_)
        tmx_ = jnp.where(ax_, tmx_ + dtx, tmx_)
        tmy_ = jnp.where(ay_, tmy_ + dty, tmy_)
        tmz_ = jnp.where(az_, tmz_ + dtz, tmz_)
        inside = (
            (ix_ >= 0) & (ix_ < nx) & (iy_ >= 0) & (iy_ < ny)
            & (iz_ >= 0) & (iz_ < nz)
        )
        act = (active & jnp.logical_not(done) & inside).astype(jnp.int32)
        return (it + 1, act, btb_, bidb_, ix_, iy_, iz_, tmx_, tmy_, tmz_)

    carry = (jnp.int32(0), act0, btb, bidb, ix, iy, iz, tmx, tmy, tmz)
    carry = jax.lax.while_loop(loop_cond, loop_body, carry)
    btb, bidb = carry[2], carry[3]

    # part A wins ties (brute: part B replaces only strictly)
    a_wins = bta <= btb
    best_t = jnp.where(a_wins, bta, btb)
    t_ref[:, :] = best_t
    # misses encode as 0 (deterministic; callers gate inst on finite t)
    i_ref[:, :] = jnp.where(
        best_t >= _BIG, 0,
        jnp.where(a_wins, -(bia + 1), bidb.astype(jnp.int32)),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "nb", "lo", "cell", "eps_local", "n_overflow_chunks", "interpret"
    ),
)
def _closest_hit_dda(org_t, dir_t, part_a, overflow, cells3,
                     k, nb, lo, cell, eps_local, n_overflow_chunks,
                     interpret=False):
    n_pad = org_t.shape[1]
    grid = (n_pad // _RAY_TILE,)
    kernel = functools.partial(
        _dda_kernel,
        k=k, nb=nb, lo=lo, cell=cell, eps_local=eps_local,
        n_overflow_chunks=n_overflow_chunks,
    )
    n_cells = nb[0] * nb[1] * nb[2]
    t, i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, _RAY_TILE), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, _RAY_TILE), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MAX_BIG, 8), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((overflow.shape[0], 8),
                         lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 5 * k, n_cells), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _RAY_TILE), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _RAY_TILE), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(org_t, dir_t, part_a, overflow, cells3)
    return t[0], i[0]


def intersect_spheres_dda(
    org: jnp.ndarray,
    dirs: jnp.ndarray,
    scene: SphereScene,
    grid: DDAGrid,
    interpret: bool | None = None,
    want_uv: bool = True,
) -> Hit:
    """Closest hit through the per-ray DDA grid — drop-in for
    intersect_spheres_pallas on big local-sphere scenes. ``grid`` must be
    built eagerly from the SAME scene (build_dda_grid)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = org.shape[0]

    n_pad = -(-n // _RAY_TILE) * _RAY_TILE
    org_t = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(
        org.astype(jnp.float32).T)
    dir_t = (
        jnp.zeros((3, n_pad), jnp.float32)
        .at[0, :].set(1.0)
        .at[:, :n].set(dirs.astype(jnp.float32).T)
    )
    overflow = grid.overflow
    n_ovf_chunks = overflow.shape[0] // _S_CHUNK
    if overflow.shape[0] == 0:
        # keep a valid (never-swept) operand shape when nothing overflowed
        overflow = jnp.zeros((_S_CHUNK, 8), jnp.float32)

    t, i = _closest_hit_dda(
        org_t, dir_t, grid.part_a, overflow, grid.cells3,
        k=grid.k, nb=grid.nb, lo=grid.lo, cell=grid.cell,
        eps_local=grid.eps_local, n_overflow_chunks=n_ovf_chunks,
        interpret=interpret,
    )
    t = t[:n]
    enc = i[:n]
    best_i = jnp.where(
        enc < 0,
        jnp.take(grid.perm_a, jnp.minimum(-enc - 1, MAX_BIG - 1)),
        jnp.minimum(enc, scene.n_spheres - 1),
    )

    t = jnp.where(t >= _BIG, jnp.inf, t).astype(org.dtype)
    ok = jnp.isfinite(t)[:, None]
    x = org + jnp.where(ok, t[:, None], 0.0) * dirs
    ctr = jnp.take(scene.center, best_i, axis=0)
    nrm = safe_normalize(jnp.where(ok, x - ctr, 1.0))
    if want_uv:
        from smallpt_tpu.ops.intersect import sphere_uv

        uv = jnp.where(ok, sphere_uv(nrm), 0.0).astype(org.dtype)
    else:
        uv = jnp.zeros((org.shape[0], 2), org.dtype)

    return Hit(t=t, inst=best_i, prim=best_i, x=jnp.where(ok, x, 0.0),
               n=nrm, uv=uv)
