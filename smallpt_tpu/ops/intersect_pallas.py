"""Pallas TPU closest-hit intersect kernel — the OptiX Prime analog.

The reference offloads ray queries to a native GPU library
(OptixIntersector::traceRays, smallpt.cpp:553-583: pack rays -> rtpQueryExecute
closest-hit -> unpack). The TPU-native equivalent is this Mosaic kernel: each
grid step owns a tile of rays (lane dimension, 128-wide vregs) and sweeps the
sphere table in sublane chunks, carrying the running closest (t, id) in
vector registers — the (rays x spheres) candidate matrix never exists in HBM,
unlike the pure-JAX path (ops/intersect.py) where XLA materializes chunked
intermediates.

Numerical split (measured at the VPU roofline):
- spheres with radius >= ``stable_radius``: the cancellation-stable citardauq
  form (~45 VPU ops/pair) — required for smallpt's 1e5-radius wall spheres,
  where the textbook quadratic loses ~4 digits in f32
  (ops/intersect.py::sphere_hit_t docstring);
- smaller spheres: the direct quadratic (~23 ops/pair) — b and |op|^2 are
  O(scene scale), so f32 cancellation is harmless below ``stable_radius``.
The scene table is permuted big-first on the host; the kernel runs one sweep
per class and the winner's permuted id maps back through the permutation.

Layout: rays live in the LANE dimension (every vreg row is 128 rays — 100%
occupancy regardless of scene size), spheres in the SUBLANE dimension, walked
64 at a time from a VMEM-resident table.

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
# Spheres per sublane chunk.
_S_CHUNK = 64
_BIG = 3.0e38  # finite inf stand-in inside the kernel (avoids inf-inf NaNs)

# Radius above which the cancellation-stable form is required in f32.
STABLE_RADIUS = 100.0


def _chunk_minloc(tt, c, bt, bi, base):
    """Fold one chunk's (SC, R) candidate ts into the running (1, R) best."""
    tmin = jnp.min(tt, axis=0, keepdims=True)
    srow = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 0)
    idx = jnp.min(
        jnp.where(tt <= tmin, srow, jnp.int32(0x7FFFFFFF)), axis=0, keepdims=True
    ) + (c * _S_CHUNK + base)
    better = tmin < bt
    return jnp.where(better, tmin, bt), jnp.where(better, idx, bi)


def _intersect_kernel(
    org_ref, dir_ref, tbl_ref, t_ref, i_ref, *, n_big_chunks, n_small_chunks
):
    """One ray tile vs the whole (permuted, big-first) sphere table.

    org_ref/dir_ref: (3, R) ray components; tbl_ref: (S_pad, 8) columns
    [cx, cy, cz, r, eps, 0, 0, 0]; outputs (1, R) best t and permuted id.
    """
    ox = org_ref[0:1, :]  # (1, R)
    oy = org_ref[1:2, :]
    oz = org_ref[2:3, :]
    dx = dir_ref[0:1, :]
    dy = dir_ref[1:2, :]
    dz = dir_ref[2:3, :]

    def load(c, base):
        tbl = tbl_ref[pl.ds(base + c * _S_CHUNK, _S_CHUNK), :]  # (SC, 8)
        return tbl[:, 0:1], tbl[:, 1:2], tbl[:, 2:3], tbl[:, 3:4], tbl[:, 4:5]

    def stable_body(c, carry):
        bt, bi = carry
        cx, cy, cz, r, eps = load(c, 0)
        opx = cx - ox  # (SC, R)
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
        s = jnp.sqrt(jnp.maximum(det, 0.0))
        opn = jnp.sqrt(b * b + pp)  # |op| via exact identity
        cc = (opn - r) * (opn + r)  # |op|^2 - r^2, stably
        denom = b + s
        # citardauq near root; denom <= 0 means both roots behind/absent
        t_near = jnp.where(
            denom > 0.0, cc / jnp.where(denom == 0.0, 1.0, denom), -_BIG
        )
        tt = jnp.where(t_near > eps, t_near, jnp.where(denom > eps, denom, _BIG))
        tt = jnp.where((det >= 0.0) & (r > 0.0), tt, _BIG)
        return _chunk_minloc(tt, c, bt, bi, 0)

    small_base = n_big_chunks * _S_CHUNK

    def fast_body(c, carry):
        bt, bi = carry
        cx, cy, cz, r, eps = load(c, small_base)
        opx = cx - ox
        opy = cy - oy
        opz = cz - oz
        b = opx * dx + opy * dy + opz * dz
        op2 = opx * opx + opy * opy + opz * opz
        det = b * b - op2 + r * r  # fine in f32 for r < STABLE_RADIUS
        s = jnp.sqrt(jnp.maximum(det, 0.0))
        t0 = b - s
        t1 = b + s
        tt = jnp.where(t0 > eps, t0, jnp.where(t1 > eps, t1, _BIG))
        tt = jnp.where((det >= 0.0) & (r > 0.0), tt, _BIG)
        return _chunk_minloc(tt, c, bt, bi, small_base)

    init = (
        jnp.full((1, _RAY_TILE), _BIG, jnp.float32),
        jnp.zeros((1, _RAY_TILE), jnp.int32),
    )
    carry = jax.lax.fori_loop(0, n_big_chunks, stable_body, init)
    best_t, best_i = jax.lax.fori_loop(0, n_small_chunks, fast_body, carry)
    t_ref[:, :] = best_t
    i_ref[:, :] = best_i


@functools.partial(
    jax.jit, static_argnames=("n_big_chunks", "n_small_chunks", "interpret")
)
def _closest_hit(org_t, dir_t, table, n_big_chunks, n_small_chunks,
                 interpret: bool = False):
    """org_t/dir_t: (3, N_pad) f32; table: (S_pad, 8) permuted big-first.
    Returns (t, permuted_i) of shape (N_pad,)."""
    n_pad = org_t.shape[1]
    s_pad = table.shape[0]
    grid = (n_pad // _RAY_TILE,)
    kernel = functools.partial(
        _intersect_kernel,
        n_big_chunks=n_big_chunks,
        n_small_chunks=n_small_chunks,
    )
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


def _intersect_kernel_mxu(
    org_ref, dir_ref, stbl_ref, mtbl_ref, t_ref, i_ref,
    *, n_big_chunks, n_small_chunks, eps_small, precision,
):
    """MXU-assisted sweep: same contract as _intersect_kernel, but the
    small-sphere class's per-pair quadratic coefficients come off the MXU.

    The sweep is VPU-roofline-bound (BASELINE.md: ~27 elem-ops/pair caps 10k
    spheres at ~3.5 Mrays/s while the MXU sits idle). Both quadratic
    coefficients are bilinear in (sphere constants, ray features):

        b   = c.d - o.d          -> row [cx cy cz 0 0 0 0 0]   . F
        m2  = 2 c.o - q - |o|^2  -> row [0 0 0 2cx 2cy 2cz -q -1] . F
        det = b^2 + m2,   q := |c|^2 - r^2   (per-scene constant)

    with F = [dx dy dz ox oy oz 1 oo] the 8-row ray-feature matrix, so ONE
    (128, 8) x (8, R) matmul per 64-sphere chunk (both coefficient blocks
    stacked) replaces ~14 VPU ops/pair. Remaining VPU work per pair: one
    subtract (b), det fma, sqrt, two roots, the eps-select chain, and the
    chunk min-fold (~13 ops). Validity folds into IEEE NaN propagation:
    det < 0 -> sqrt NaN -> both root compares false -> BIG (masked rows are
    built with q = 1e30 so they always take this path — no r > 0 check).

    Numerics: det here is algebraically the fast_body quadratic but with a
    different f32 summation order (and the matmul's own rounding), so hits
    match the classic kernel to fp noise, NOT bit-exactly — razor-edge
    winner flips are possible and the tolerance gates live in
    tests/test_intersect_pallas.py. Wall-class spheres keep the explicit
    citardauq VPU sweep (pp = |oc - b d|^2 cannot be recovered from |oc|^2
    and b^2 at 1e5 scale in f32)."""
    ox = org_ref[0:1, :]
    oy = org_ref[1:2, :]
    oz = org_ref[2:3, :]
    dx = dir_ref[0:1, :]
    dy = dir_ref[1:2, :]
    dz = dir_ref[2:3, :]

    def stable_body(c, carry):
        bt, bi = carry
        tbl = stbl_ref[pl.ds(c * _S_CHUNK, _S_CHUNK), :]
        cx, cy, cz, r, eps = (tbl[:, 0:1], tbl[:, 1:2], tbl[:, 2:3],
                              tbl[:, 3:4], tbl[:, 4:5])
        opx = cx - ox
        opy = cy - oy
        opz = cz - oz
        b = opx * dx + opy * dy + opz * dz
        fx = opx - b * dx
        fy = opy - b * dy
        fz = opz - b * dz
        pp = fx * fx + fy * fy + fz * fz
        sp = jnp.sqrt(pp)
        det = (r - sp) * (r + sp)
        s = jnp.sqrt(jnp.maximum(det, 0.0))
        opn = jnp.sqrt(b * b + pp)
        cc = (opn - r) * (opn + r)
        denom = b + s
        t_near = jnp.where(
            denom > 0.0, cc / jnp.where(denom == 0.0, 1.0, denom), -_BIG
        )
        tt = jnp.where(t_near > eps, t_near, jnp.where(denom > eps, denom, _BIG))
        tt = jnp.where((det >= 0.0) & (r > 0.0), tt, _BIG)
        return _chunk_minloc(tt, c, bt, bi, 0)

    small_base = n_big_chunks * _S_CHUNK
    od = ox * dx + oy * dy + oz * dz      # (1, R) per-ray, hoisted
    oo = ox * ox + oy * oy + oz * oz
    ones = jnp.ones_like(od)
    feats = jnp.concatenate([dx, dy, dz, ox, oy, oz, ones, oo], axis=0)

    def mxu_body(c, carry):
        bt, bi = carry
        blk = mtbl_ref[pl.ds(c * 2 * _S_CHUNK, 2 * _S_CHUNK), :]  # (128, 8)
        p = jax.lax.dot_general(
            blk, feats, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (128, R): rows 0:64 = c.d, rows 64:128 = 2c.o - q - oo
        b = p[0:_S_CHUNK, :] - od
        det = b * b + p[_S_CHUNK:2 * _S_CHUNK, :]
        s = jnp.sqrt(det)  # NaN iff det < 0 (incl. masked rows' -1e30)
        t0 = b - s
        t1 = b + s
        tt = jnp.where(t0 > eps_small, t0,
                       jnp.where(t1 > eps_small, t1, _BIG))
        return _chunk_minloc(tt, c, bt, bi, small_base)

    init = (
        jnp.full((1, _RAY_TILE), _BIG, jnp.float32),
        jnp.zeros((1, _RAY_TILE), jnp.int32),
    )
    carry = jax.lax.fori_loop(0, n_big_chunks, stable_body, init)
    best_t, best_i = jax.lax.fori_loop(0, n_small_chunks, mxu_body, carry)
    t_ref[:, :] = best_t
    i_ref[:, :] = best_i


@functools.partial(
    jax.jit, static_argnames=("n_big_chunks", "n_small_chunks", "eps_small",
                              "precision", "interpret")
)
def _closest_hit_mxu(org_t, dir_t, stable_tbl, mxu_tbl, n_big_chunks,
                     n_small_chunks, eps_small,
                     precision=jax.lax.Precision.HIGHEST,
                     interpret: bool = False):
    n_pad = org_t.shape[1]
    grid = (n_pad // _RAY_TILE,)
    kernel = functools.partial(
        _intersect_kernel_mxu,
        n_big_chunks=n_big_chunks,
        n_small_chunks=n_small_chunks,
        eps_small=eps_small,
        precision=precision,
    )
    t, i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, _RAY_TILE), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, _RAY_TILE), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (stable_tbl.shape[0], 8), lambda g: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (mxu_tbl.shape[0], 8), lambda g: (0, 0),
                memory_space=pltpu.VMEM,
            ),
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
    )(org_t, dir_t, stable_tbl, mxu_tbl)
    return t[0], i[0]


def build_sphere_table_mxu(
    scene: SphereScene,
    eps: float = 1e-4,
    eps_rel: float = 5e-7,
    stable_radius: float = STABLE_RADIUS,
):
    """MXU-sweep tables. Returns (stable_tbl (MAX_BIG, 8), mxu_tbl
    (2*S_pad, 8), perm, n_big_chunks, n_small_chunks, eps_small, shift).

    Same big/small split + perm semantics as build_sphere_table; the small
    class additionally gets the chunk-interleaved coefficient matrix: chunk
    c occupies rows [c*128, (c+1)*128) — first 64 rows the b coefficients
    [cx cy cz 0 0 0 0 0], next 64 the det ones [0 0 0 2cx 2cy 2cz -q -1]
    (q = |c|^2 - r^2). Rows masked out of the small class (big spheres,
    padding) carry q = 1e30 so det < 0 poisons them to NaN -> miss.

    ``shift`` (3,) recenters the coordinate frame at the small-class
    centroid: the expanded quadratic's det is built from O(|c||o|) matmul
    terms, so its f32 absolute error scales with the SQUARE of coordinate
    magnitude — recentring (callers must subtract ``shift`` from ray
    origins; t is translation-invariant) shrinks the cancellation noise
    ~(coord/extent)^2, measured ~25x on the camera-at-z=295 procedural
    scene. Residual razor-edge winner flips are why intersect_spheres_mxu
    refines the winner's t with an exact per-lane replay.

    The kernel compares both roots against ONE scalar eps: valid because
    every small sphere's eps_i = max(eps, eps_rel*r) == eps whenever
    eps_rel * stable_radius <= eps (true for the defaults); asserted here.
    """
    if eps_rel * stable_radius > eps:
        raise ValueError(
            f"mxu sweep needs uniform small-class eps: eps_rel*stable_radius"
            f" = {eps_rel * stable_radius} > eps = {eps}"
        )
    s = scene.n_spheres
    c = jnp.asarray(scene.center, jnp.float32)
    r = jnp.asarray(scene.radius, jnp.float32)
    big_f = (r >= stable_radius).astype(jnp.float32)
    n_small = jnp.maximum(jnp.sum(1.0 - big_f), 1.0)
    shift = jnp.sum(c * (1.0 - big_f)[:, None], axis=0) / n_small
    c = c - shift
    eps_i = jnp.maximum(jnp.asarray(eps, jnp.float32), eps_rel * r)
    rows = jnp.concatenate(
        [c, r[:, None], eps_i[:, None], jnp.zeros((s, 3), jnp.float32)], axis=1
    )
    big = r >= stable_radius

    order = jnp.argsort(jnp.where(big, 0, 1), stable=True).astype(jnp.int32)
    n_a = min(MAX_BIG, s)
    ids_a = order[:n_a]
    rows_a = jnp.take(rows, ids_a, axis=0)
    pad_a = MAX_BIG - n_a
    if pad_a:
        rows_a = jnp.concatenate([rows_a, jnp.zeros((pad_a, 8), jnp.float32)])
        ids_a = jnp.concatenate([ids_a, jnp.zeros((pad_a,), jnp.int32)])

    pad_b = (-s) % _S_CHUNK
    s_pad = s + pad_b
    cb = jnp.zeros((s_pad, 3), jnp.float32).at[:s].set(
        jnp.where(big[:, None], 0.0, c)
    )
    rb = jnp.zeros((s_pad,), jnp.float32).at[:s].set(jnp.where(big, 0.0, r))
    masked = jnp.ones((s_pad,), bool).at[:s].set(big)
    q = jnp.where(masked, 1.0e30, jnp.sum(cb * cb, axis=1) - rb * rb)
    zeros3 = jnp.zeros((s_pad, 3), jnp.float32)
    zeros1 = jnp.zeros((s_pad, 1), jnp.float32)
    rows_b1 = jnp.concatenate(  # b coefficients
        [cb, zeros3, zeros1, zeros1], axis=1
    )
    rows_b2 = jnp.concatenate(  # det coefficients
        [zeros3, 2.0 * cb, -q[:, None],
         jnp.where(masked, 0.0, -1.0)[:, None]], axis=1
    )
    # interleave by 64-sphere chunk: (n_chunks, 2, 64, 8) -> (2*s_pad, 8)
    n_sc = s_pad // _S_CHUNK
    mxu_tbl = jnp.stack(
        [rows_b1.reshape(n_sc, _S_CHUNK, 8), rows_b2.reshape(n_sc, _S_CHUNK, 8)],
        axis=1,
    ).reshape(2 * s_pad, 8)
    ids_b = jnp.concatenate(
        [jnp.arange(s, dtype=jnp.int32), jnp.zeros((pad_b,), jnp.int32)]
    ) if pad_b else jnp.arange(s, dtype=jnp.int32)
    perm = jnp.concatenate([ids_a, ids_b])
    return (rows_a, mxu_tbl, perm, MAX_BIG // _S_CHUNK, n_sc,
            float(eps), shift)


# Static capacity of the stable-swept class: scenes are traced values under
# jit, so the big/small split cannot depend on a concrete count. Up to
# MAX_BIG spheres (big ones first) go through the stable sweep; every sphere
# additionally appears in the fast part with big ones zeroed out — a small
# sphere landing in both parts yields duplicate identical candidates, which
# closest-hit min-reduction absorbs. Scenes with > MAX_BIG giant spheres are
# out of contract (smallpt-class scenes have ~7).
MAX_BIG = 128


def build_sphere_table(
    scene: SphereScene,
    eps: float = 1e-4,
    eps_rel: float = 5e-7,
    stable_radius: float = STABLE_RADIUS,
):
    """Two-part sphere table, jit-traceable (no value-dependent shapes).

    Returns (table (S_pad, 8) f32 [cx cy cz r eps 0 0 0], perm (S_pad,) int32
    mapping table slot -> original sphere id, n_big_chunks, n_small_chunks).
    Part A (MAX_BIG rows, stable sweep): spheres ordered big-first. Part B
    (all S rows, fast sweep): original order with radius >= stable_radius
    rows zeroed (radius-0 rows never hit and are masked in-kernel).

    eps_i = max(eps, eps_rel * r) per sphere — the same per-sphere root
    rejection as the pure-JAX path (RenderConfig.intersect_eps_rel)."""
    s = scene.n_spheres
    c = jnp.asarray(scene.center, jnp.float32)
    r = jnp.asarray(scene.radius, jnp.float32)
    eps_i = jnp.maximum(jnp.asarray(eps, jnp.float32), eps_rel * r)
    rows = jnp.concatenate(
        [c, r[:, None], eps_i[:, None], jnp.zeros((s, 3), jnp.float32)], axis=1
    )
    big = r >= stable_radius

    # part A: big-first order, truncated/padded to MAX_BIG rows
    order = jnp.argsort(jnp.where(big, 0, 1), stable=True).astype(jnp.int32)
    n_a = min(MAX_BIG, s)
    ids_a = order[:n_a]
    rows_a = jnp.take(rows, ids_a, axis=0)
    pad_a = MAX_BIG - n_a
    if pad_a:
        rows_a = jnp.concatenate([rows_a, jnp.zeros((pad_a, 8), jnp.float32)])
        ids_a = jnp.concatenate([ids_a, jnp.zeros((pad_a,), jnp.int32)])

    # part B: original order, big spheres (already covered by part A) zeroed
    rows_b = jnp.where(big[:, None], 0.0, rows)
    # spheres beyond part A's capacity that were NOT big stay in part B; small
    # spheres inside part A are duplicated there — harmless for closest-hit
    ids_b = jnp.arange(s, dtype=jnp.int32)
    pad_b = (-s) % _S_CHUNK
    if pad_b:
        rows_b = jnp.concatenate([rows_b, jnp.zeros((pad_b, 8), jnp.float32)])
        ids_b = jnp.concatenate([ids_b, jnp.zeros((pad_b,), jnp.int32)])

    table = jnp.concatenate([rows_a, rows_b])
    perm = jnp.concatenate([ids_a, ids_b])
    return table, perm, MAX_BIG // _S_CHUNK, rows_b.shape[0] // _S_CHUNK


def intersect_spheres_pallas(
    org: jnp.ndarray,
    dirs: jnp.ndarray,
    scene: SphereScene,
    eps: float = 1e-4,
    eps_rel: float = 5e-7,
    interpret: bool | None = None,
    want_uv: bool = True,
) -> Hit:
    """Closest analytic sphere hit via the Pallas kernel. Drop-in for
    ops.intersect.intersect_spheres (the traceRays backend contract,
    smallpt.cpp:427-605). interpret=None auto-selects the Pallas interpreter
    on non-TPU backends (the CPU test platform).

    want_uv=False skips sphere_uv's lat/long atan2+asin per lane (the
    transport consumes uv only in Mode.UV; the transcendentals cost real
    per-bounce wall on the forward schedulers) — Hit.uv is zeros."""
    if interpret is None:
        # real Mosaic lowering on TPU (incl. the axon tunnel platform, which
        # reports backend "tpu"); interpreter on every other backend (CPU
        # tests, and e.g. jax[cuda] where Mosaic TPU lowering would crash)
        interpret = jax.default_backend() != "tpu"
    n = org.shape[0]
    s = scene.n_spheres
    if not isinstance(scene.radius, jax.core.Tracer):
        # eagerly-valued scenes: reject what the static MAX_BIG capacity
        # would silently drop (under jit the count is unknowable; scenes are
        # normally constructed eagerly, so this catches it at first use)
        n_big = int(jnp.sum(jnp.asarray(scene.radius) >= STABLE_RADIUS))
        if n_big > MAX_BIG:
            raise ValueError(
                f"{n_big} spheres with radius >= {STABLE_RADIUS} exceed the "
                f"stable-sweep capacity MAX_BIG={MAX_BIG}"
            )
    table, perm, n_big_chunks, n_small_chunks = build_sphere_table(
        scene, eps=eps, eps_rel=eps_rel
    )

    n_pad = -(-n // _RAY_TILE) * _RAY_TILE
    org_t = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(org.astype(jnp.float32).T)
    # pad dirs with a unit vector so padded lanes stay finite
    dir_t = (
        jnp.zeros((3, n_pad), jnp.float32)
        .at[0, :].set(1.0)
        .at[:, :n].set(dirs.astype(jnp.float32).T)
    )

    t, i = _closest_hit(org_t, dir_t, table, n_big_chunks, n_small_chunks,
                        interpret=interpret)
    t = t[:n]
    best_i = jnp.take(perm, jnp.minimum(i[:n], perm.shape[0] - 1))

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

    return Hit(
        t=t,
        inst=best_i,
        prim=best_i,
        x=jnp.where(ok, x, 0.0),
        n=nrm,
        uv=uv,
    )


def _replay_winner(org, dirs, c, r, kernel_hit, eps, eps_rel):
    """Exact per-lane re-evaluation of the kernel-chosen winner's hit.

    c (N,3) / r (N,) are the winners' PRE-GATHERED center/radius rows —
    callers choose the gather op (jnp.take for forward-only use; one-hot
    matmul for the differentiable path, whose take-backward would be a TPU
    scatter-add). Recomputes t with the cancellation-stable citardauq form
    in ORIGINAL (unshifted) coordinates — op = c - org is an exact f32
    subtraction of nearby values, so the result carries none of the
    expanded-quadratic noise the MXU sweep tolerates for winner SELECTION.
    O(lanes) cost (~20 VPU ops/ray vs ~13/pair for the sweep). Returns
    (t, x, n, ok) with lanes the kernel called a miss (or whose exact det
    says miss — grazing reclassification) set to t=inf.
    """
    from smallpt_tpu.core.math import safe_sqrt

    eps_i = jnp.maximum(jnp.asarray(eps, org.dtype), eps_rel * r)

    op = c - org
    b = jnp.sum(op * dirs, axis=-1)
    fp = op - b[:, None] * dirs
    pp = jnp.sum(fp * fp, axis=-1)
    sp = safe_sqrt(pp)
    det = (r - sp) * (r + sp)
    s = safe_sqrt(jnp.maximum(det, 0.0))
    opn = safe_sqrt(b * b + pp)
    cc = (opn - r) * (opn + r)
    denom = b + s
    t_near = jnp.where(
        denom > 0.0, cc / jnp.where(denom == 0.0, 1.0, denom), -jnp.inf
    )
    t = jnp.where(t_near > eps_i, t_near,
                  jnp.where(denom > eps_i, denom, jnp.inf))
    t = jnp.where(kernel_hit & (det >= 0.0), t, jnp.inf)
    ok = jnp.isfinite(t)[:, None]
    x = org + jnp.where(ok, t[:, None], 0.0) * dirs
    nrm = safe_normalize(jnp.where(ok, x - c, 1.0))
    return t, jnp.where(ok, x, 0.0), nrm, ok


def intersect_spheres_mxu(
    org: jnp.ndarray,
    dirs: jnp.ndarray,
    scene: SphereScene,
    eps: float = 1e-4,
    eps_rel: float = 5e-7,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool | None = None,
) -> Hit:
    """Closest hit via the MXU-assisted sweep (_intersect_kernel_mxu) —
    drop-in for intersect_spheres_pallas on big small-sphere scenes, where
    the classic kernel is VPU-roofline-bound. The kernel selects the winner
    with expanded-quadratic arithmetic (recentered at the small-class
    centroid, build_sphere_table_mxu); the winner's t/x/n are then refined
    by an exact O(lanes) stable replay (_replay_winner), so reported hits
    carry classic-kernel accuracy — only razor-edge winner CHOICES (near-tie
    t within the det noise) and grazing hit/miss calls can differ, gated
    statistically in tests/test_intersect_pallas.py."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = org.shape[0]
    if not isinstance(scene.radius, jax.core.Tracer):
        n_big = int(jnp.sum(jnp.asarray(scene.radius) >= STABLE_RADIUS))
        if n_big > MAX_BIG:
            raise ValueError(
                f"{n_big} spheres with radius >= {STABLE_RADIUS} exceed the "
                f"stable-sweep capacity MAX_BIG={MAX_BIG}"
            )
    (stable_tbl, mxu_tbl, perm, n_big_chunks, n_small_chunks, eps_small,
     shift) = build_sphere_table_mxu(scene, eps=eps, eps_rel=eps_rel)

    org_c = org.astype(jnp.float32) - shift[None, :]
    n_pad = -(-n // _RAY_TILE) * _RAY_TILE
    org_t = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(org_c.T)
    dir_t = (
        jnp.zeros((3, n_pad), jnp.float32)
        .at[0, :].set(1.0)
        .at[:, :n].set(dirs.astype(jnp.float32).T)
    )

    t, i = _closest_hit_mxu(org_t, dir_t, stable_tbl, mxu_tbl,
                            n_big_chunks, n_small_chunks, eps_small,
                            precision=precision, interpret=interpret)
    kernel_hit = t[:n] < _BIG
    best_i = jnp.take(perm, jnp.minimum(i[:n], perm.shape[0] - 1))

    t, x, nrm, ok = _replay_winner(
        org, dirs,
        jnp.take(scene.center, best_i, axis=0), jnp.take(scene.radius, best_i),
        kernel_hit, eps, eps_rel,
    )
    from smallpt_tpu.ops.intersect import sphere_uv

    return Hit(
        t=t.astype(org.dtype),
        inst=best_i,
        prim=best_i,
        x=x,
        n=nrm,
        uv=jnp.where(ok, sphere_uv(nrm), 0.0).astype(org.dtype),
    )


def intersect_spheres_hybrid_diff(
    org: jnp.ndarray,
    dirs: jnp.ndarray,
    scene: SphereScene,
    eps: float = 1e-4,
    eps_rel: float = 5e-7,
    interpret: bool | None = None,
) -> Hit:
    """Differentiable closest hit at Pallas speed: non-differentiable winner
    search through the Mosaic kernel, then a differentiable single-sphere
    replay of the stable hit equation for each lane's winner only.

    The pure-JAX differentiable path (ops/intersect.py::intersect_spheres)
    differentiates the FULL chunked (lanes x spheres) sweep — correct but
    ~the whole sweep again on the backward pass. Here the discrete argmin
    (which sphere is closest) is detached — exactly the detached-sampling
    estimator's semantics (RenderConfig.detach_sampling docstring): the
    winner choice is a discrete event whose flip is a visibility
    discontinuity, already outside the documented bias envelope — while
    t(center, radius), the hit point, and the normal stay differentiable
    through a per-lane replay that costs O(lanes), not O(lanes x spheres).

    The replay uses the same cancellation-stable citardauq arithmetic as the
    kernel (_replay_winner — a lane is a hit iff the KERNEL said so, keeping
    the forward image identical to the forward-only path), so primal values
    match the kernel's up to compilation-level FMA noise (razor-edge paths
    only — the same floor as mega-vs-JAX parity).

    The winner search calls the KERNEL directly (not the
    intersect_spheres_pallas wrapper): the wrapper's hit completion
    (center gather, normalize, sphere_uv's atan2/asin) is recomputed
    differentiably by the replay anyway, and per-lane takes of small
    tables are pathologically slow on TPU (material_lookup docstring:
    32 ms take vs 2 ms one-hot at 3.1M lanes x 9 rows).
    """
    sg = jax.lax.stop_gradient
    nd_scene = jax.tree.map(sg, scene)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = org.shape[0]
    table, perm, n_big_chunks, n_small_chunks = build_sphere_table(
        nd_scene, eps=eps, eps_rel=eps_rel
    )
    n_pad = -(-n // _RAY_TILE) * _RAY_TILE
    org_nd, dirs_nd = sg(org), sg(dirs)
    org_t = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(
        org_nd.astype(jnp.float32).T)
    dir_t = (
        jnp.zeros((3, n_pad), jnp.float32)
        .at[0, :].set(1.0)
        .at[:, :n].set(dirs_nd.astype(jnp.float32).T)
    )
    t_k, i_k = _closest_hit(org_t, dir_t, table, n_big_chunks,
                            n_small_chunks, interpret=interpret)
    kernel_hit = t_k[:n] < _BIG
    slot = jnp.minimum(i_k[:n], perm.shape[0] - 1)

    # winner gathers as one-hot matmuls, NOT jnp.take — besides the slow
    # forward take, the take's reverse-mode transpose is a scatter-add
    # over all lanes into the (S,) param rows, which TPUs execute (nearly)
    # serially; the one-hot transpose is a (S, lanes) x (lanes, 3) matmul
    # on the MXU. Gated on table size: the one-hot matrix is lanes x S_pad
    # (a 512x512 render vs 2048 spheres = ~2.3 GB transient — above that,
    # keep takes and accept the scatter).
    s_pad = perm.shape[0]
    if s_pad <= 2304:
        oh_slot = jax.nn.one_hot(slot, s_pad, dtype=jnp.float32)  # (N,S_pad)
        # precision='highest' on BOTH matmuls: the TPU default is a bf16
        # pass, which mangles smallpt's 1e5-scale wall centers (~3
        # significant digits) — the replay then reports det<0 misses and
        # paths die wholesale (measured: 54k vs 152k rays/step, TPU only;
        # interpret mode hides it). Same trap material_lookup documents.
        # slot -> original id (perm), exact in f32 below 2^24
        idx = jnp.round(
            jnp.matmul(oh_slot, perm.astype(jnp.float32),
                       precision="highest")
        ).astype(jnp.int32)
        # fold the slot->id->row double gather into ONE matmul: rows of
        # (center | radius) pre-permuted into table-slot order
        cr = jnp.concatenate(
            [scene.center.astype(org.dtype),
             scene.radius.astype(org.dtype)[:, None]], axis=1,
        )
        cr_slots = jnp.take(cr, perm, axis=0)  # (S_pad,4): S-sized, cheap
        crw = jnp.matmul(oh_slot.astype(org.dtype), cr_slots,
                         precision="highest")
        c, r = crw[:, 0:3], crw[:, 3]
    else:
        idx = jnp.take(perm, slot)
        c = jnp.take(scene.center, idx, axis=0)
        r = jnp.take(scene.radius, idx)

    # per-lane stable replay (sphere_hit_t math, S==1 specialization)
    t, x, nrm, ok = _replay_winner(
        org, dirs, c, r, kernel_hit, eps, eps_rel
    )
    return Hit(
        t=t,
        inst=idx,
        prim=idx,
        x=x,
        n=nrm,
        uv=jnp.zeros((org.shape[0], 2), org.dtype),
    )
