"""Grid-binned ray acceleration for large sphere scenes — the BVH-role
component (OptiX Prime's acceleration structure, /root/reference/
smallpt.cpp:489-530 model build, :578-582 closest-hit query), redesigned for
the TPU's lock-step vector model.

A GPU BVH gives every ray an independent traversal; the TPU VPU executes
8x128 lanes in lock step, so per-ray divergent traversal buys nothing.
What works on TPU is restoring *coherence* and then culling at TILE
granularity:

1. **Scene preprocessing** (host, once per scene): spheres split into a
   GLOBAL set (giant wall/light spheres — always swept, they're hit from
   everywhere) and a LOCAL set, sorted by uniform-grid cell of their center
   and grouped into chunks of 8 consecutive table rows with chunk AABBs.
2. **Ray binning**: each ray maps to a bin = (origin grid cell) x (one of
   24 direction-sign cones: dominant axis x component-sign octant). A
   conservative reach table `masks[bin, chunk]` — can ANY ray in this bin
   hit this chunk's AABB? — is precomputed by interval arithmetic
   (displacement-box vs axis cone).
3. **Tile coherence via sort**: the streaming path state is periodically
   re-ordered by bin key with ONE multi-operand lax.sort (all state planes
   ride the same sort network — no post-hoc gathers, which measure ~10x
   slower on this chip). Lane identity is carried in a pixel plane, so
   sample streams stay placement-invariant (keying v2 depends only on
   (pixel, sample index)).
4. **Per-tile chunk lists**: each 1024-lane kernel tile takes the min/max
   RANGE of its lanes' bin keys (plus the range of camera-ray keys its
   lanes would regenerate into) and unions the reach masks over that range
   (one MXU matmul). Ranges make correctness independent of sort
   freshness: a stale sort only widens ranges (slower), never drops a
   reachable chunk (wrong).

The bounce kernel (ops/megakernel.py::stream_step_binned) then sweeps the
global spheres plus ONLY the listed chunks — the pair-count reduction that
a BVH provides, at tile granularity.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from smallpt_tpu.core.scene import SphereScene

# Lanes per binned-kernel tile (the coherence granularity) — single source
# of truth lives in ops/megakernel.py (_LANE_B, env-overridable).
from smallpt_tpu.ops.megakernel import _LANE_B as LANE_B  # noqa: E402

SUB = 8
TILE_B = SUB * LANE_B

N_DIR = 24  # dominant axis (3) x component-sign octant (8)

# Spheres with radius >= this are "global": swept unconditionally. smallpt's
# walls are r=1e5, its light r=600; procedural content is r ~ 1.
GLOBAL_RADIUS = 50.0

CHUNK = 8  # local spheres per chunk (matches the kernel's 8-row VMEM loads)


class AccelUnsupported(ValueError):
    """Scene shape the grid accel cannot index (no local or no global
    spheres) — callers fall back to the brute sweep."""


@dataclasses.dataclass(frozen=True)
class GridAccel:
    """Static acceleration tables for one (scene, binning) pair.

    Built eagerly with numpy (scenes are eager values); the jnp arrays are
    closed over by the jitted helpers below. NOT a pytree — pass the object
    around on the host side only.
    """

    order: jnp.ndarray        # (S_pad,) int32 — new table order: global
                              # spheres (padded to a CHUNK multiple by
                              # repeating the last one — duplicate closest-
                              # hit candidates are harmless), then
                              # cell-sorted local spheres (same padding)
    n_glob_chunks: int        # global chunks (always swept)
    n_chunks: int             # local chunks of CHUNK rows each
    lo: jnp.ndarray           # (3,) f32 — origin-grid lower corner
    inv_cell: jnp.ndarray     # (3,) f32 — 1 / cell size
    nb: tuple                 # (bx, by, bz) origin-grid dims
    masks: jnp.ndarray        # (B, C) f32 in {0, 1} — bin -> chunk reach
    k_lo: jnp.ndarray         # (C, 3) f32 — local chunk AABB mins
    k_hi: jnp.ndarray         # (C, 3) f32 — local chunk AABB maxs
    l_max: int                # per-tile chunk-list capacity
    geo_lo: tuple = (-3e38, -3e38, -3e38)  # local-geometry AABB (plain
    geo_hi: tuple = (3e38, 3e38, 3e38)     # floats: baked STATIC into the
                              # bounce kernel's frontier-escape test)

    @property
    def n_bins(self) -> int:
        bx, by, bz = self.nb
        return bx * by * bz * N_DIR


def _chunk_aabbs(centers: np.ndarray, radii: np.ndarray):
    """(C, 3) mins / maxs over CHUNK-sized groups of sphere extents."""
    c = centers.reshape(-1, CHUNK, 3)
    r = radii.reshape(-1, CHUNK, 1)
    return (c - r).min(axis=1), (c + r).max(axis=1)


def _reach_masks(cell_lo, cell_hi, k_lo, k_hi):
    """Conservative bin->chunk reachability.

    cell_lo/hi: (Bo, 3) origin-cell AABBs (border cells pre-extended to
    +-inf); k_lo/hi: (C, 3) chunk AABBs. Returns (Bo, N_DIR, C) bool.

    Test: does the displacement box D = [k_lo - cell_hi, k_hi - cell_lo]
    contain any vector v with the cone's sign pattern and |v_dom| maximal?
    Choosing v_dom at its largest feasible magnitude m relaxes the other
    components monotonically, so the test reduces to per-axis interval
    checks (conservative, never misses a reachable chunk)."""
    d_lo = k_lo[None, :, :] - cell_hi[:, None, :]  # (Bo, C, 3)
    d_hi = k_hi[None, :, :] - cell_lo[:, None, :]

    out = np.zeros((d_lo.shape[0], N_DIR, d_lo.shape[1]), dtype=bool)
    for dom in range(3):
        o1, o2 = [a for a in range(3) if a != dom]
        for bits in range(8):
            sg = [1 - 2 * ((bits >> (2 - a)) & 1) for a in range(3)]
            # dominant-axis magnitude bound m = max |v_dom| with the right sign
            if sg[dom] > 0:
                m = d_hi[..., dom]
                ok = m > 0
            else:
                m = -d_lo[..., dom]
                ok = m > 0
            for o in (o1, o2):
                if sg[o] > 0:
                    # need [d_lo, d_hi]_o to meet [0, m]
                    ok &= (d_hi[..., o] >= 0) & (d_lo[..., o] <= m)
                else:
                    ok &= (d_lo[..., o] <= 0) & (d_hi[..., o] >= -m)
            dbin = dom * 8 + bits
            out[:, dbin, :] = ok
    return out


def build_grid_accel(
    scene: SphereScene,
    nb=None,
    l_max: int = 512,
    global_radius: float = GLOBAL_RADIUS,
    extra_points=None,
    cell_target: float | None = None,
) -> GridAccel:
    """Build the acceleration tables for an (eager) sphere scene.

    The origin grid must cover where RAYS START, not just where the local
    spheres are: ray origins are camera points (pass via extra_points) and
    hit points — on local spheres (inside the local extents) or on the
    GLOBAL wall spheres, whose hittable surface runs along the scene
    boundary. Each global sphere therefore contributes its surface point
    nearest the local center to the bounds (for smallpt's 1e5-radius walls
    that is the wall plane; curvature across a 100-unit scene is < 0.1, so
    a 1-unit margin covers the sag). An origin that still lands outside
    clamps into a border cell whose extent is infinite on the outer faces —
    conservative (reaches everything in the cone) but now RARE instead of
    the common case for wall bounces.

    nb=None picks per-axis cell counts targeting ``cell_target`` units per
    cell (default: local-extent mean span / 7), clipped to [2, 16]."""
    c = np.asarray(scene.center, np.float64)
    r = np.asarray(scene.radius, np.float64)
    s = c.shape[0]
    is_global = r >= global_radius
    gids = np.nonzero(is_global)[0]
    lids = np.nonzero(~is_global)[0]

    if lids.size == 0:
        raise AccelUnsupported(
            "scene has no local spheres — use the plain sweep"
        )

    # grid bounds: local extents + wall tangent points + requested origins
    ext_lo = (c[lids] - r[lids, None]).min(axis=0)
    ext_hi = (c[lids] + r[lids, None]).max(axis=0)
    local_span = np.maximum(ext_hi - ext_lo, 1e-6)
    mid = 0.5 * (ext_lo + ext_hi)
    for g in gids:
        to_mid = mid - c[g]
        dist = np.linalg.norm(to_mid)
        if dist < 1e-9:
            continue
        surf = c[g] + to_mid * (r[g] / dist)
        ext_lo = np.minimum(ext_lo, surf - 1.0)
        ext_hi = np.maximum(ext_hi, surf + 1.0)
    if extra_points is not None:
        pts = np.asarray(extra_points, np.float64).reshape(-1, 3)
        ext_lo = np.minimum(ext_lo, pts.min(axis=0) - 1.0)
        ext_hi = np.maximum(ext_hi, pts.max(axis=0) + 1.0)
    span = np.maximum(ext_hi - ext_lo, 1e-6)
    if nb is None:
        if cell_target is None:
            cell_target = float(np.mean(local_span)) / 7.0
        nb = tuple(
            int(np.clip(round(span[a] / max(cell_target, 1e-6)), 2, 16))
            for a in range(3)
        )
    nb = tuple(int(x) for x in nb)
    cell = span / np.asarray(nb, np.float64)

    # sort local spheres by center cell id (z fastest, matching key packing)
    ci = np.clip(
        ((c[lids] - ext_lo) / cell).astype(np.int64), 0,
        np.asarray(nb) - 1,
    )
    cell_lin = (ci[:, 0] * nb[1] + ci[:, 1]) * nb[2] + ci[:, 2]
    lorder = lids[np.argsort(cell_lin, kind="stable")]

    # pad both sets to CHUNK multiples with copies of their last sphere
    # (duplicate closest-hit candidates are harmless: equal t, same
    # material; the strict '<' sweep keeps the first)
    if gids.size == 0:
        raise AccelUnsupported(
            "scene has no global spheres — binned mode expects wall-class "
            f"spheres (radius >= {global_radius}); lower global_radius"
        )
    gids_p = np.concatenate(
        [gids, np.repeat(gids[-1:], (-gids.size) % CHUNK)]
    )
    lorder_p = np.concatenate(
        [lorder, np.repeat(lorder[-1:], (-lorder.size) % CHUNK)]
    )
    order = np.concatenate([gids_p, lorder_p]).astype(np.int32)
    n_glob_chunks = gids_p.size // CHUNK
    n_chunks = lorder_p.size // CHUNK

    k_lo, k_hi = _chunk_aabbs(c[lorder_p], r[lorder_p])

    # origin-cell AABBs; border cells extend to +-inf so rays whose origin
    # clamps into them (e.g. the camera outside the volume) stay covered
    bx, by, bz = nb
    ii, jj, kk = np.meshgrid(
        np.arange(bx), np.arange(by), np.arange(bz), indexing="ij"
    )
    idx = np.stack([ii, jj, kk], axis=-1).reshape(-1, 3)
    cell_lo = ext_lo + idx * cell
    cell_hi = cell_lo + cell
    for a in range(3):
        cell_lo[:, a] = np.where(idx[:, a] == 0, -np.inf, cell_lo[:, a])
        cell_hi[:, a] = np.where(
            idx[:, a] == nb[a] - 1, np.inf, cell_hi[:, a]
        )

    reach = _reach_masks(cell_lo, cell_hi, k_lo, k_hi)  # (Bo, N_DIR, C)
    masks = reach.reshape(-1, n_chunks).astype(np.float32)

    return GridAccel(
        order=jnp.asarray(order),
        n_glob_chunks=int(n_glob_chunks),
        n_chunks=int(n_chunks),
        k_lo=jnp.asarray(k_lo, jnp.float32),
        k_hi=jnp.asarray(k_hi, jnp.float32),
        lo=jnp.asarray(ext_lo, jnp.float32),
        inv_cell=jnp.asarray(1.0 / cell, jnp.float32),
        nb=nb,
        masks=jnp.asarray(masks),
        l_max=int(l_max),
        geo_lo=tuple(float(v) for v in k_lo.min(axis=0)),
        geo_hi=tuple(float(v) for v in k_hi.max(axis=0)),
    )


# ---------------------------------------------------------------------------
# Bin keys, tile ranges, chunk lists (XLA, between kernel launches)
# ---------------------------------------------------------------------------


def _dir_bin(dx, dy, dz):
    ax, ay, az = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    dom = jnp.where(
        (ax >= ay) & (ax >= az), 0, jnp.where(ay >= az, 1, 2)
    )
    bits = (
        (dx < 0).astype(jnp.int32) * 4
        + (dy < 0).astype(jnp.int32) * 2
        + (dz < 0).astype(jnp.int32)
    )
    return dom * 8 + bits


def _cell_lin(px, py, pz, lo, inv_cell, nb):
    bx, by, bz = nb
    cx = jnp.clip(((px - lo[0]) * inv_cell[0]).astype(jnp.int32), 0, bx - 1)
    cy = jnp.clip(((py - lo[1]) * inv_cell[1]).astype(jnp.int32), 0, by - 1)
    cz = jnp.clip(((pz - lo[2]) * inv_cell[2]).astype(jnp.int32), 0, bz - 1)
    return (cx * by + cy) * bz + cz


def ray_bin_keys(ox, oy, oz, dx, dy, dz, accel: GridAccel):
    """Bin key per lane, any shape. key = cell_lin * N_DIR + dir_bin."""
    cl = _cell_lin(ox, oy, oz, accel.lo, accel.inv_cell, accel.nb)
    return cl * N_DIR + _dir_bin(dx, dy, dz)


def _bucket_d0(accel: GridAccel) -> float:
    """Bucket-0 radius (an eighth of the mean grid cell): the near-zero-gap
    band every launch sweeps ENTIRELY, making dcut >= d0 > 0 — the
    frontier march's progress floor and the escape-finalize winner
    guarantee (a gap-0 carried winner is always in the swept prefix)."""
    return float(np.mean(1.0 / np.asarray(accel.inv_cell))) * 0.125


def _masked_minmax(key, valid, n_bins):
    """Per-tile (lo, hi) over valid lanes; empty tiles give lo > hi.

    key/valid: (8, C) planes; tiles are LANE_B-column blocks."""
    c = key.shape[1]
    t = c // LANE_B
    k = key.reshape(SUB, t, LANE_B)
    v = valid.reshape(SUB, t, LANE_B)
    lo = jnp.min(jnp.where(v, k, n_bins + 1), axis=(0, 2))
    hi = jnp.max(jnp.where(v, k, -1), axis=(0, 2))
    return lo, hi


def tile_work_lists(f, i, config, accel: GridAccel, k_near: int | None = None):
    """Distance-ordered per-tile FRONTIER work lists for the CURRENT state
    (the lax.sort variant — exact sorted distances, must stay OUTSIDE the
    fused bounce program; see tile_work_lists_bucketed for the fused one).

    For each tile: union the reach masks over the tile's frontier-point
    bin-key range (frontier = o + ts*d — where each lane's march has
    resolved to, the origin for fresh lanes), order the reachable chunks
    by conservative distance (tile frontier-AABB to chunk AABB), and emit
      lists (T, l_max) int32  — chunk ids near -> far,
      stops (T,) int32        — entries to sweep this launch
                                (-1 => sweep ALL local chunks: > l_max
                                entries at gap < d0),
      dcut (T,) f32           — the finality bound: sorted distance of the
                                first UNSWEPT entry (+inf when everything
                                reachable is swept).
    Every tile sweeps max(k_near, |gap < d0 entries|) — covering every
    near-zero-gap entry keeps dcut >= d0 > 0, so pending lanes always
    march forward (ts += dcut) and any carried winner stays inside the
    swept prefix (its gap is < dcut when the lane finalizes).

    Correct for any sort staleness: ranges only widen; distances are lower
    bounds (tile AABB -> chunk AABB <= per-lane distance), so
    "bt < ts + dcut" can only under-claim finality, never over-claim."""
    from smallpt_tpu.ops import megakernel as mk

    if k_near is None:
        k_near = mk.K_NEAR
    k_near = jnp.asarray(k_near, jnp.int32)  # traced-ok: value not shape
    n_bins = accel.n_bins
    c_ = accel.n_chunks

    def plane(buf, idx):
        return jax.lax.dynamic_slice_in_dim(buf, 8 * idx, 8, axis=0)

    ox, oy, oz = plane(f, mk._F_OX), plane(f, mk._F_OY), plane(f, mk._F_OZ)
    dx, dy, dz = plane(f, mk._F_DX), plane(f, mk._F_DY), plane(f, mk._F_DZ)
    ts = plane(f, mk._F_TS)
    ox = ox + ts * dx
    oy = oy + ts * dy
    oz = oz + ts * dz
    alive = plane(i, mk._I_ALIVE) != 0
    key_live = ray_bin_keys(ox, oy, oz, dx, dy, dz, accel)
    lo1, hi1 = _masked_minmax(key_live, alive, n_bins)

    # per-tile frontier AABB over alive lanes
    def tile_minmax(p, valid, big):
        cc = p.shape[1]
        t = cc // LANE_B
        v = valid.reshape(SUB, t, LANE_B)
        pp = p.reshape(SUB, t, LANE_B)
        lo = jnp.min(jnp.where(v, pp, big), axis=(0, 2))
        hi = jnp.max(jnp.where(v, pp, -big), axis=(0, 2))
        return lo, hi

    big = jnp.float32(3e38)
    olo_x, ohi_x = tile_minmax(ox, alive, big)
    olo_y, ohi_y = tile_minmax(oy, alive, big)
    olo_z, ohi_z = tile_minmax(oz, alive, big)

    bins = jnp.arange(n_bins, dtype=jnp.int32)
    in1 = (bins[None, :] >= lo1[:, None]) & (bins[None, :] <= hi1[:, None])
    reach = (
        jax.lax.dot(
            in1.astype(jnp.bfloat16), accel.masks.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        > 0.0
    )  # (T, C)
    n_reach = jnp.sum(reach, axis=1).astype(jnp.int32)

    # conservative distance: tile origin AABB -> chunk AABB, per axis
    def axis_gap(olo, ohi, klo, khi):
        return jnp.maximum(
            jnp.maximum(klo[None, :] - ohi[:, None], olo[:, None] - khi[None, :]),
            0.0,
        )
    gx = axis_gap(olo_x, ohi_x, accel.k_lo[:, 0], accel.k_hi[:, 0])
    gy = axis_gap(olo_y, ohi_y, accel.k_lo[:, 1], accel.k_hi[:, 1])
    gz = axis_gap(olo_z, ohi_z, accel.k_lo[:, 2], accel.k_hi[:, 2])
    dist = jnp.sqrt(gx * gx + gy * gy + gz * gz)
    dist = jnp.where(reach, dist, big)

    order = jnp.argsort(dist, axis=1).astype(jnp.int32)      # (T, C)
    ds = jnp.take_along_axis(dist, order, axis=1)            # sorted dists
    l_max = accel.l_max
    lists = order[:, :l_max]

    # progress guarantee (mirrors tile_work_lists_bucketed): sweep every
    # gap < d0 entry so dcut >= d0 > 0 and pending lanes march forward
    d0 = _bucket_d0(accel)
    n_b0 = jnp.sum((dist < d0) & reach, axis=1).astype(jnp.int32)
    stop_full = jnp.minimum(n_reach, l_max)
    stops = jnp.where(
        n_b0 > l_max,
        -1,
        jnp.minimum(jnp.maximum(k_near, n_b0), stop_full),
    )
    # dcut = sorted distance at the stop position (+inf past the end or in
    # all-chunk sweeps — everything reachable gets swept, so lanes finalize)
    idx = jnp.clip(stops, 0, c_ - 1)
    dcut = jnp.take_along_axis(ds, idx[:, None], axis=1)[:, 0]
    # everything-reachable-swept => +inf, NOT the finite 3e38 sentinel: a
    # lane that misses all geometry carries bt == 3e38, and `bt < dcut`
    # must still finalize it as a miss (an open scene would otherwise pend
    # that lane forever and stall the drain)
    dcut = jnp.where(
        (stops < 0) | (stops >= n_reach), jnp.float32(jnp.inf), dcut
    )
    return lists, stops, dcut


def tile_work_lists_nosort(f, i, config, accel: GridAccel):
    """Sort-free work lists: the tile's FULL reachable chunk set in
    ascending chunk order, no distance prefix, dcut = +inf (every alive
    lane finalizes every bounce — no pending carry).

    Why this variant exists (measured round 3): the tunnel executes
    same-program dependent launches at pure compute cost but charges
    ~0.65 ms/MB of state per DISTINCT-program dependency hop, so the
    3-program bounce chain paid ~50 ms/bounce in hand-offs. Fusing
    regen + list building + the kernel into ONE re-launched program
    removes that cost — but the fused program must not contain lax.sort
    or argsort (multi-ten-minute remote-compile pathology, round-2/3
    notes), so the distance-ordered prefix is replaced by a cumsum +
    scatter compaction of the reach mask. Ascending order also makes the
    culled sweep ORDER-IDENTICAL to a full sweep, so culled == full stays
    bit-exact by construction.

    Returns (lists (T, l_max) int32, stops (T,) int32 with -1 = sweep all
    local chunks, dcut (T,) f32 = +inf)."""
    from smallpt_tpu.ops import megakernel as mk

    n_bins = accel.n_bins
    c_ = accel.n_chunks

    def plane(buf, idx):
        return jax.lax.dynamic_slice_in_dim(buf, 8 * idx, 8, axis=0)

    ox, oy, oz = plane(f, mk._F_OX), plane(f, mk._F_OY), plane(f, mk._F_OZ)
    dx, dy, dz = plane(f, mk._F_DX), plane(f, mk._F_DY), plane(f, mk._F_DZ)
    ts = plane(f, mk._F_TS)
    ox = ox + ts * dx
    oy = oy + ts * dy
    oz = oz + ts * dz
    alive = plane(i, mk._I_ALIVE) != 0
    key_live = ray_bin_keys(ox, oy, oz, dx, dy, dz, accel)
    lo1, hi1 = _masked_minmax(key_live, alive, n_bins)

    bins = jnp.arange(n_bins, dtype=jnp.int32)
    in1 = (bins[None, :] >= lo1[:, None]) & (bins[None, :] <= hi1[:, None])
    reach = (
        jax.lax.dot(
            in1.astype(jnp.bfloat16), accel.masks.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        > 0.0
    )  # (T, C)
    n_reach = jnp.sum(reach, axis=1).astype(jnp.int32)

    l_max = accel.l_max
    t_ = reach.shape[0]
    # compaction without sort OR scatter: XLA TPU scatter serializes (~3 us
    # per update — 30k updates ate ~90 ms/bounce, measured), so compact via
    # a one-hot reduction instead: position of each reachable chunk is its
    # rank among reachable chunks (ascending cid), and
    # lists[t, p] = sum_c cid * [pos[t, c] == p]. The (T, C, L) one-hot is
    # never materialized — XLA fuses the generator into the reduction.
    pos = jnp.cumsum(reach.astype(jnp.int32), axis=1) - 1       # (T, C)
    cid = jnp.arange(c_, dtype=jnp.int32)
    slot = jnp.arange(l_max, dtype=jnp.int32)
    onehot = jnp.logical_and(
        pos[:, :, None] == slot[None, None, :], reach[:, :, None]
    )
    lists = jnp.sum(
        jnp.where(onehot, cid[None, :, None], 0), axis=1, dtype=jnp.int32
    )
    stops = jnp.where(n_reach > l_max, -1, n_reach)
    dcut = jnp.full((t_,), jnp.inf, jnp.float32)
    return lists, stops, dcut


N_BUCKET = 32
SUBBLOCKS = 8  # per-tile key-range subdivision (union of 8 intervals)


def _masked_minmax_sub(key, valid, n_bins):
    """Per-(tile, subblock) key (lo, hi): each tile's LANE_B columns split
    into SUBBLOCKS column groups. The union of 8 tight intervals is a far
    better occupancy approximation than one tile-wide interval — a single
    outlier cell no longer drags in the whole linear span between cells
    (measured: tile-wide ranges made every tile's reach overflow l_max
    mid-render)."""
    c = key.shape[1]
    t = c // LANE_B
    w = LANE_B // SUBBLOCKS
    k = key.reshape(SUB, t, SUBBLOCKS, w)
    v = valid.reshape(SUB, t, SUBBLOCKS, w)
    lo = jnp.min(jnp.where(v, k, n_bins + 1), axis=(0, 3))  # (T, S)
    hi = jnp.max(jnp.where(v, k, -1), axis=(0, 3))
    return lo, hi


def tile_work_lists_bucketed(f, i, config, accel: GridAccel, k_near=None,
                             shadow_keys=None):
    """Distance-BUCKETED FRONTIER work lists, free of lax.sort/argsort/
    scatter — the fused-program companion of the frontier-marching kernel.

    Every lane is binned by its resolved-frontier point o + ts*d (fresh
    lanes: ts == 0, the origin; pending lanes: wherever their march got
    to), so the per-tile boxes track where rays ARE, not where they
    started. Chunks are ranked by (geometric distance bucket, chunk id)
    using one-hot cumsum arithmetic only; every tile sweeps a near prefix
    of max(k_near, |bucket 0|) entries — covering ALL gap < d0 entries
    guarantees dcut >= d0 > 0, so pending lanes always march forward —
    with the finality bound dcut = lower bucket edge of the first unswept
    entry (every unswept entry's frontier gap is >= that edge, hence any
    unswept hit has t >= ts + dcut per lane). No tile ever needs a
    full-reach sweep (the round-3 predecessor's has-pending tiles paid
    196 ms vs 18 ms, measured); the only fallback is bucket-0 overflow
    (> l_max gap-zero entries), which degrades to the all-chunks sweep.
    Bucket order only affects WHICH launch finalizes a lane, never the
    winner (idempotent min-fold + carried candidates)."""
    from smallpt_tpu.ops import megakernel as mk

    if k_near is None:
        k_near = mk.K_NEAR
    k_near = jnp.asarray(k_near, jnp.int32)
    n_bins = accel.n_bins
    c_ = accel.n_chunks

    def plane(buf, idx):
        return jax.lax.dynamic_slice_in_dim(buf, 8 * idx, 8, axis=0)

    ox, oy, oz = plane(f, mk._F_OX), plane(f, mk._F_OY), plane(f, mk._F_OZ)
    dx, dy, dz = plane(f, mk._F_DX), plane(f, mk._F_DY), plane(f, mk._F_DZ)
    ts = plane(f, mk._F_TS)
    ox = ox + ts * dx
    oy = oy + ts * dy
    oz = oz + ts * dz
    alive = plane(i, mk._I_ALIVE) != 0
    key_live = ray_bin_keys(ox, oy, oz, dx, dy, dz, accel)
    lo_s, hi_s = _masked_minmax_sub(key_live, alive, n_bins)  # (T, S)

    def sub_minmax(p, valid, big):
        cc = p.shape[1]
        t = cc // LANE_B
        w = LANE_B // SUBBLOCKS
        v = valid.reshape(SUB, t, SUBBLOCKS, w)
        pp = p.reshape(SUB, t, SUBBLOCKS, w)
        lo = jnp.min(jnp.where(v, pp, big), axis=(0, 3))   # (T, S)
        hi = jnp.max(jnp.where(v, pp, -big), axis=(0, 3))
        return lo, hi

    big = jnp.float32(3e38)
    olo_x, ohi_x = sub_minmax(ox, alive, big)
    olo_y, ohi_y = sub_minmax(oy, alive, big)
    olo_z, ohi_z = sub_minmax(oz, alive, big)

    bins = jnp.arange(n_bins, dtype=jnp.int32)
    # union of SUBBLOCKS intervals, generator fused into the reduction
    in1 = jnp.any(
        (bins[None, None, :] >= lo_s[:, :, None])
        & (bins[None, None, :] <= hi_s[:, :, None]),
        axis=1,
    )  # (T, B)
    reach = (
        jax.lax.dot(
            in1.astype(jnp.bfloat16), accel.masks.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        > 0.0
    )  # (T, C)

    # deferred-NEE shadow rays (ops/megakernel.py binned NEE): every chunk
    # any pending shadow ray can reach must be IN this launch's swept set
    # (occlusion resolves in one launch — shadow rays have no pending/
    # marching machinery), so their reach is unioned in and FORCED into
    # bucket 0. dcut stays a valid finality bound for the main rays:
    # forcing chunks into the swept prefix only shrinks the unswept set,
    # and the bound is the min bucket edge over what remains.
    reach_sh = None
    if shadow_keys:
        in1_sh = jnp.zeros_like(in1)
        for k_s, v_s in shadow_keys:
            lo2, hi2 = _masked_minmax_sub(k_s, v_s, n_bins)
            in1_sh = in1_sh | jnp.any(
                (bins[None, None, :] >= lo2[:, :, None])
                & (bins[None, None, :] <= hi2[:, :, None]),
                axis=1,
            )
        reach_sh = (
            jax.lax.dot(
                in1_sh.astype(jnp.bfloat16), accel.masks.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            > 0.0
        )
        reach = reach | reach_sh
    n_reach = jnp.sum(reach, axis=1).astype(jnp.int32)

    def axis_gap(olo, ohi, klo, khi):
        # (T, S, C): per-subblock origin box vs chunk AABB
        return jnp.maximum(
            jnp.maximum(
                klo[None, None, :] - ohi[:, :, None],
                olo[:, :, None] - khi[None, None, :],
            ),
            0.0,
        )

    gx = axis_gap(olo_x, ohi_x, accel.k_lo[:, 0], accel.k_hi[:, 0])
    gy = axis_gap(olo_y, ohi_y, accel.k_lo[:, 1], accel.k_hi[:, 1])
    gz = axis_gap(olo_z, ohi_z, accel.k_lo[:, 2], accel.k_hi[:, 2])
    # a lane lives in SOME subblock, whose box is inside the tile box, so
    # min over subblocks is a valid lower bound for every lane and tighter
    # than the tile-wide AABB gap
    dist = jnp.min(
        jnp.sqrt(gx * gx + gy * gy + gz * gz), axis=1
    )  # (T, C)

    # geometric buckets (quarter-octave): 0 covers [0, d0), b >= 1 covers
    # [d0*2^((b-1)/4), d0*2^(b/4)); lower edges are the finality bounds
    # (a ~19% down-rounding of the exact sorted distance, vs the 41% of
    # half-octave buckets that left most lanes un-finalized)
    d0 = _bucket_d0(accel)
    nb_ = N_BUCKET
    bucket = jnp.where(
        dist < d0,
        0,
        jnp.clip(
            1 + jnp.floor(4.0 * jnp.log2(jnp.maximum(dist, d0) / d0)),
            0, nb_ - 1,
        ).astype(jnp.int32),
    )
    if reach_sh is not None:
        bucket = jnp.where(reach_sh, 0, bucket)
    edges = jnp.asarray(
        [0.0] + [d0 * 2.0 ** ((b - 1) / 4.0) for b in range(1, nb_)],
        jnp.float32,
    )

    # rank by (bucket, cid) with cumsums only
    oh = jnp.logical_and(
        bucket[:, :, None] == jnp.arange(nb_, dtype=jnp.int32)[None, None, :],
        reach[:, :, None],
    )  # (T, C, NB)
    counts = jnp.sum(oh, axis=1).astype(jnp.int32)              # (T, NB)
    offset = jnp.cumsum(counts, axis=1) - counts                # exclusive
    cum3 = jnp.cumsum(oh.astype(jnp.int32), axis=1)             # (T, C, NB)
    within = jnp.sum(jnp.where(oh, cum3, 0), axis=2)            # (T, C) >=1
    off_g = jnp.sum(jnp.where(oh, offset[:, None, :], 0), axis=2)
    pos = off_g + within - 1                                    # (T, C)

    l_max = accel.l_max
    slot = jnp.arange(l_max, dtype=jnp.int32)
    oh_pos = jnp.logical_and(
        pos[:, :, None] == slot[None, None, :], reach[:, :, None]
    )
    cid = jnp.arange(c_, dtype=jnp.int32)
    lists = jnp.sum(
        jnp.where(oh_pos, cid[None, :, None], 0), axis=1, dtype=jnp.int32
    )

    # progress guarantee: sweep at least every bucket-0 (gap < d0) entry,
    # so dcut >= d0 > 0 and pending lanes always march; if bucket 0 alone
    # overflows the list, fall back to the all-chunks sweep (stops = -1)
    n_b0 = counts[:, 0]
    stop_full = jnp.minimum(n_reach, l_max)
    stops = jnp.where(
        n_b0 > l_max,
        -1,
        jnp.minimum(jnp.maximum(k_near, n_b0), stop_full),
    )
    # bucket of the entry AT the stop position (first unswept) -> its
    # lower edge bounds every unswept entry's distance
    b_at = jnp.sum(
        jnp.where(pos == stops[:, None], bucket, 0) * reach, axis=1
    )
    dcut = edges[jnp.clip(b_at, 0, nb_ - 1)]
    dcut = jnp.where(
        (stops < 0) | (stops >= n_reach), jnp.float32(jnp.inf), dcut
    )
    return lists, stops, dcut


# ---------------------------------------------------------------------------
# Deferred-NEE shadow prep (binned NEE, ops/megakernel.py::_binned_kernel)
# ---------------------------------------------------------------------------


def nee_shadow_prep(f, i, table, config, accel: GridAccel, key,
                    ip_offset=0, inflight: int = 1, nee_rows: tuple = ()):
    """Draw the light-cone shadow directions for lanes with pending NEE
    bits and bin the resulting shadow rays.

    Runs in XLA between the regen and list stages of the fused bounce: the
    direction is drawn HERE, once, written into the state's ld planes and
    used for BOTH the bin keys (list builder union) and the kernel's
    occluder sweep — so the swept set is conservative for exactly the ray
    the kernel traces (recomputing the f32 cone in two compilers could
    disagree in ulps and flip a direction bucket at its boundary, silently
    dropping an occluder's chunk).

    The draw mirrors the classic streaming kernel's in-kernel NEE block
    (same stream_nee_uniforms streams, same cone construction,
    megakernel.py classic kernel NEE) at the vertex depth (= depth - 1:
    the kernel increments depth when a vertex finalizes; pending-shadow
    lanes have had no shading event since).

    Returns (f with ld planes written, [(key_plane, valid_plane), ...])."""
    from smallpt_tpu.core import rng as prng
    from smallpt_tpu.ops import megakernel as mk

    def fplane(idx):
        return jax.lax.dynamic_slice_in_dim(f, 8 * idx, 8, axis=0)

    def iplane(idx):
        return jax.lax.dynamic_slice_in_dim(i, 8 * idx, 8, axis=0)

    ox, oy, oz = fplane(mk._F_OX), fplane(mk._F_OY), fplane(mk._F_OZ)
    neep = iplane(mk._I_NEEP)
    pixel = iplane(mk._I_PIXEL)
    s_idx = iplane(mk._I_SIDX)
    depth = iplane(mk._I_DEPTH)

    shift = inflight.bit_length() - 1
    pix = jax.lax.shift_right_logical(pixel, shift) if shift else pixel
    ip = ip_offset + s_idx
    if shift:
        sub = pixel - jax.lax.shift_left(pix, shift)
        ip = ip + sub * jnp.int32(mk._BINNED_SUB_STRIDE)
    depth_v = jnp.maximum(depth - 1, 0)

    shadow_keys = []
    for slot, row in enumerate(nee_rows):
        valid = ((neep >> slot) & 1) == 1
        lcx, lcy, lcz = table[row, 0], table[row, 1], table[row, 2]
        lrr = table[row, 3]
        u = prng.stream_nee_uniforms(key, pix, ip, depth_v, slot)
        nu0, nu1 = u[..., 0], u[..., 1]
        swx = lcx - ox
        swy = lcy - oy
        swz = lcz - oz
        d2 = swx * swx + swy * swy + swz * swz
        cos_a_max = jnp.sqrt(jnp.maximum(
            1.0 - (lrr * lrr) / jnp.maximum(d2, 1e-12), 0.0
        ))
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
        inv_su = jax.lax.rsqrt(sux * sux + suy * suy + suz * suz)
        sux, suy, suz = sux * inv_su, suy * inv_su, suz * inv_su
        svx = swny * suz - swnz * suy
        svy = swnz * sux - swnx * suz
        svz = swnx * suy - swny * sux
        cphi = jnp.cos(nphi) * sin_a
        sphi = jnp.sin(nphi) * sin_a
        ldx = sux * cphi + svx * sphi + swnx * cos_a
        ldy = suy * cphi + svy * sphi + swny * cos_a
        ldz = suz * cphi + svz * sphi + swnz * cos_a
        inv_ld = jax.lax.rsqrt(ldx * ldx + ldy * ldy + ldz * ldz)
        ldx, ldy, ldz = ldx * inv_ld, ldy * inv_ld, ldz * inv_ld
        # unit dummy for non-pending lanes: _shadow_tt stays well-behaved
        ldx = jnp.where(valid, ldx, 0.0)
        ldy = jnp.where(valid, ldy, 0.0)
        ldz = jnp.where(valid, ldz, 1.0)
        for off, plane in ((0, ldx), (1, ldy), (2, ldz)):
            f = jax.lax.dynamic_update_slice_in_dim(
                f, plane, 8 * (mk._F_LD0 + 3 * slot + off), axis=0
            )
        shadow_keys.append(
            (ray_bin_keys(ox, oy, oz, ldx, ldy, ldz, accel), valid)
        )
    return f, shadow_keys


# ---------------------------------------------------------------------------
# State shuffle (periodic re-sort for tile coherence)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_planes",))
def _sort_group(keys, planes, n_planes):
    """One stable row-wise sort of up to n_planes payload planes."""
    out = jax.lax.sort(
        (keys,) + tuple(planes), dimension=1, is_stable=True, num_keys=1
    )
    return out[1:]


def shuffle_state(f, i, keys, group=8):
    """Re-order lanes by bin key for tile coherence: stable multi-operand
    row-wise sorts (each of the 8 sublane rows sorts independently along
    the column axis, payload planes riding the same network).

    Why row-wise: a globally-sorted order needs (8, T, L) transposes to
    make sorted ranks tile-contiguous, and fusing (or even just compiling)
    those 25 transposes wedges the remote compiler for 40+ minutes. Rows
    receive statistically identical key populations, so each tile's 8
    row-segments cover nearly the same key quantiles — per-tile ranges are
    within noise of the global sort's — at zero relayout cost (and 8 sorts
    of C elements are cheaper than one of 8C). Placement is semantically
    free: streams are keyed by the pixel plane, not the lane (bit-exact
    tests pin this).

    Why SPLIT into ``group``-plane sorts: the monolithic 25-operand
    lax.sort is a pathological remote compile on this toolchain (>20 min,
    vs minutes for ~9 operands — same class as the round-2 sort+transpose
    wedge). lax.sort is STABLE here, so identical key planes give every
    group the identical permutation; runtime cost is key-network-bound and
    payload count is nearly free (BASELINE.md), so k small sorts cost ~k
    key networks — acceptable at (8, C) row scale and hundreds of times
    cheaper to compile.

    keys: (8, C) int32 plane; dead-unregenerable lanes should carry a
    past-the-end key so they sink to each row's tail."""
    nf = f.shape[0] // 8
    ni = i.shape[0] // 8
    fplanes = [f[8 * n:8 * n + 8] for n in range(nf)]
    iplanes = [i[8 * n:8 * n + 8] for n in range(ni)]
    out_f: list = []
    out_i: list = []
    for planes, out in ((fplanes, out_f), (iplanes, out_i)):
        for s in range(0, len(planes), group):
            sub = planes[s:s + group]
            out.extend(_sort_group(keys, tuple(sub), len(sub)))
    return jnp.concatenate(out_f, axis=0), jnp.concatenate(out_i, axis=0)


def state_bin_keys(f, i, accel: GridAccel):
    """Sort keys for the current state: live rays use their bin; exhausted
    lanes (dead, no budget left) sink past the end so their tiles drain to
    empty chunk lists. Dead-but-regenerable lanes keep their stale ray's
    bin — only a coherence (perf) approximation, never a correctness one
    (tile_chunk_lists folds the exact regen range in separately)."""
    from smallpt_tpu.ops import megakernel as mk

    def plane(buf, idx):
        return jax.lax.dynamic_slice_in_dim(buf, 8 * idx, 8, axis=0)

    ts = plane(f, mk._F_TS)
    dx_, dy_, dz_ = (
        plane(f, mk._F_DX), plane(f, mk._F_DY), plane(f, mk._F_DZ),
    )
    key = ray_bin_keys(
        plane(f, mk._F_OX) + ts * dx_,
        plane(f, mk._F_OY) + ts * dy_,
        plane(f, mk._F_OZ) + ts * dz_,
        dx_, dy_, dz_, accel,
    )
    alive = plane(i, mk._I_ALIVE) != 0
    pend = (plane(i, mk._I_PEND) != 0) & alive
    s_idx = plane(i, mk._I_SIDX)
    budget_plane = plane(i, mk._I_BUDGET)
    exhausted = (~alive) & (s_idx >= budget_plane - 1)
    # pending lanes sort into their own (still bin-ordered) block so the
    # full-list sweeps they force are concentrated in few tiles
    key = jnp.where(pend, key + accel.n_bins, key)
    return jnp.where(exhausted, 2 * accel.n_bins, key)
