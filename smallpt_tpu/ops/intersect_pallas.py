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
) -> Hit:
    """Closest analytic sphere hit via the Pallas kernel. Drop-in for
    ops.intersect.intersect_spheres (the traceRays backend contract,
    smallpt.cpp:427-605). interpret=None auto-selects the Pallas interpreter
    on non-TPU backends (the CPU test platform)."""
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
    from smallpt_tpu.ops.intersect import sphere_uv

    return Hit(
        t=t,
        inst=best_i,
        prim=best_i,
        x=jnp.where(ok, x, 0.0),
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
    kernel, so primal values match the kernel's up to compilation-level FMA
    noise (razor-edge paths only — the same floor as mega-vs-JAX parity).
    """
    from smallpt_tpu.core.math import safe_sqrt

    sg = jax.lax.stop_gradient
    nd_scene = jax.tree.map(sg, scene)
    hit_nd = intersect_spheres_pallas(
        sg(org), sg(dirs), nd_scene, eps=eps, eps_rel=eps_rel,
        interpret=interpret,
    )
    idx = hit_nd.inst
    kernel_hit = jnp.isfinite(hit_nd.t)

    c = jnp.take(scene.center, idx, axis=0)  # (N,3) differentiable gather
    r = jnp.take(scene.radius, idx)          # (N,)
    eps_i = jnp.maximum(jnp.asarray(eps, org.dtype), eps_rel * r)

    # per-lane stable replay (sphere_hit_t math, S==1 specialization)
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
    # a lane is a hit iff the KERNEL said so (primal/replay disagreement is
    # confined to razor-edge roots; the kernel's verdict keeps the forward
    # image identical to the forward-only path)
    t = jnp.where(kernel_hit & (det >= 0.0), t, jnp.inf)
    ok = jnp.isfinite(t)[:, None]
    x = org + jnp.where(ok, t[:, None], 0.0) * dirs
    nrm = safe_normalize(jnp.where(ok, x - c, 1.0))
    return Hit(
        t=t,
        inst=idx,
        prim=idx,
        x=jnp.where(ok, x, 0.0),
        n=nrm,
        uv=jnp.zeros((org.shape[0], 2), org.dtype),
    )
