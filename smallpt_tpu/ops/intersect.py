"""Pure-JAX intersection backends (the CPUIntersector analog, and the
differentiable path).

- ``intersect_spheres``: analytic ray-sphere closest hit, the math of
  Sphere::intersectAnalytic (scene.cpp:129-140): solve
  t^2 - 2 b t + (|op|^2 - r^2) = 0 with b = dot(op, d), reject roots <= eps.
  Formulated MXU-first: b and |op|^2 reduce to two (N,3)x(3,S) matmuls plus
  rowwise terms, so XLA tiles the sphere axis onto the MXU — no (N,S,3)
  intermediate is ever materialized.
- ``intersect_mesh``: brute-force closest hit over triangles, the math of
  triIntersect (scene.cpp:52-70, iq's formulation) + the brute loop
  (scene.cpp:95-116), vectorized over (rays x tri-chunk) with a lax.scan over
  triangle chunks to bound memory.

Both return a Hit SoA; "no hit" is dist == INF (maths.h:16 uses 1e20 as the
inf sentinel; we use jnp.inf since XLA handles it natively).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from smallpt_tpu.core.math import safe_sqrt, safe_normalize, safe_div
from smallpt_tpu.core.scene import SphereScene, MeshScene


class Hit(NamedTuple):
    """Hit SoA over lanes (scene.h:31-43 without the stored x/n — position and
    normal are recomputed from (t, inst) where needed, keeping the wavefront
    state minimal)."""

    t: jnp.ndarray  # (N,) distance, inf on miss
    inst: jnp.ndarray  # (N,) int32 instance id (undefined on miss)
    prim: jnp.ndarray  # (N,) int32 primitive id (triId for meshes, scene.h:36)
    x: jnp.ndarray  # (N,3) hit position
    n: jnp.ndarray  # (N,3) geometric/shading normal (unit)
    uv: jnp.ndarray  # (N,2) barycentric uv (0 for spheres, scene.cpp:125)

    @property
    def valid(self):
        return jnp.isfinite(self.t)


def _chunked_min(n_prims: int, chunk: int, body, init):
    """Scan `body(carry, start)` over prim chunks of size `chunk`."""
    n_chunks = -(-n_prims // chunk)
    if n_chunks <= 1:
        return body(init, 0)
    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk

    def step(carry, start):
        return body(carry, start), None

    carry, _ = jax.lax.scan(step, init, starts)
    return carry


def _pad_spheres(scene: SphereScene, chunk: int) -> SphereScene:
    """Pad sphere tables to a multiple of chunk with radius-0 dummies."""
    s = scene.n_spheres
    pad = (-s) % chunk
    if pad == 0:
        return scene
    c = jnp.concatenate([scene.center, jnp.zeros((pad, 3), scene.center.dtype)])
    r = jnp.concatenate([scene.radius, jnp.zeros((pad,), scene.radius.dtype)])
    m = scene.material
    mat = m._replace(
        emission=jnp.concatenate([m.emission, jnp.zeros((pad, 3), m.emission.dtype)]),
        albedo=jnp.concatenate([m.albedo, jnp.zeros((pad, 3), m.albedo.dtype)]),
        refl=jnp.concatenate([m.refl, jnp.zeros((pad,), m.refl.dtype)]),
    )
    return SphereScene(c, r, mat)


def sphere_uv(n):
    """Spherical (u, v) of a unit normal, matching the lat/long grid of the
    reference's sphere tessellation (makeSphereTriMesh, scene.cpp:3-48:
    vertex = (sin(phi)cos(th), sin(th), cos(phi)cos(th)), phi in [0, 2pi),
    th in [-pi/2, pi/2]) — so Mode.UV on an analytic sphere shows the same
    parameterization the reference's mesh-sphere uv AOV (smallpt.cpp:181)
    wraps per-quad. n: (..., 3) unit; returns (..., 2) in [0, 1)."""
    two_pi = 2.0 * float(jnp.pi)
    phi = jnp.arctan2(n[..., 0], n[..., 2])  # [-pi, pi]
    u = jnp.mod(phi, two_pi) / two_pi
    v = jnp.arcsin(jnp.clip(n[..., 1], -1.0, 1.0)) / float(jnp.pi) + 0.5
    return jnp.stack([u, v], axis=-1)


def sphere_hit_t(org, dirs, center, radius, eps, stable: bool = True):
    """Per (lane, sphere) hit distance; inf on miss.

    org/dirs: (N,3) with unit dirs; center: (S,3); radius: (S,);
    eps: scalar or per-sphere (S,) root-rejection threshold. Returns (N,S).

    The textbook quadratic (scene.cpp:132-135, det = b^2 - |op|^2 + r^2) is
    catastrophically cancellative in float32 on smallpt's 1e5-radius wall
    spheres — original smallpt runs in double for exactly this reason. The
    stable form decomposes op against the ray: with fp = op - (op.d) d,
    det = r^2 - |fp|^2 (the big b^2 terms never meet), and the near root uses
    citardauq t = (|op|-r)(|op|+r) / (b + sqrt(det)) with |op| recovered from
    the exact identity |op|^2 = b^2 + |fp|^2. Error at scene scale 1e5 drops
    from ~1e-1 to ~5e-3.

    stable=False keeps the matmul-only formulation (b and |op|^2 via two
    (N,3)x(3,S) MXU matmuls, no (N,S,3) intermediate) for perf comparison on
    huge sphere counts.
    """
    f32 = org.dtype
    eps = jnp.asarray(eps, f32)
    if eps.ndim == 1:
        eps = eps[None, :]
    if stable:
        op = center[None, :, :] - org[:, None, :]  # (N,S,3) — fused by XLA
        b = jnp.einsum("nsk,nk->ns", op, dirs)
        fp = op - b[:, :, None] * dirs[:, None, :]
        pp = jnp.sum(fp * fp, axis=-1)  # (N,S)
        r = radius[None, :]
        sp = safe_sqrt(pp)
        det = (r - sp) * (r + sp)  # r^2 - pp, stably
        valid = det >= 0.0
        s = safe_sqrt(det)
        opn = safe_sqrt(b * b + pp)  # |op|
        cc = (opn - r) * (opn + r)  # |op|^2 - r^2, stably
        t_near = safe_div(cc, b + s, fallback=-jnp.inf)
        t_near = jnp.where(b + s > 0, t_near, -jnp.inf)
        t_far = b + s
        t = jnp.where(t_near > eps, t_near, jnp.where(t_far > eps, t_far, jnp.inf))
        return jnp.where(valid, t, jnp.asarray(jnp.inf, f32))
    cd = dirs @ center.T  # (N,S) matmul — MXU
    od = jnp.sum(org * dirs, axis=-1, keepdims=True)  # (N,1)
    b = cd - od
    oc = org @ center.T  # (N,S) matmul — MXU
    c2 = jnp.sum(center * center, axis=-1)[None, :]  # (1,S)
    o2 = jnp.sum(org * org, axis=-1, keepdims=True)  # (N,1)
    op2 = c2 - 2.0 * oc + o2
    det = b * b - op2 + (radius * radius)[None, :]
    sq = jnp.sqrt(jnp.maximum(det, 0.0))
    t0 = b - sq
    t1 = b + sq
    t = jnp.where(t0 > eps, t0, jnp.where(t1 > eps, t1, jnp.inf))
    return jnp.where(det >= 0.0, t, jnp.asarray(jnp.inf, f32))


def intersect_spheres(
    org: jnp.ndarray,
    dirs: jnp.ndarray,
    scene: SphereScene,
    eps: float = 1e-4,
    eps_rel: float = 5e-7,
    chunk: int = 512,
) -> Hit:
    """Closest analytic sphere hit for a flat ray batch.

    Chunked over the sphere axis so lanes x chunk stays bounded for large
    scenes; inst/t carried as a running min (the TPU replacement for the
    OptiX Prime closest-hit query, smallpt.cpp:578-582). Root rejection uses
    max(eps, eps_rel * radius) per sphere — see RenderConfig.intersect_eps_rel.
    """
    n = org.shape[0]
    s = scene.n_spheres
    chunk = min(chunk, s)
    padded = _pad_spheres(scene, chunk)

    init = (
        jnp.full((n,), jnp.inf, org.dtype),
        jnp.zeros((n,), jnp.int32),
    )

    center = padded.center
    radius = padded.radius

    def body(carry, start):
        best_t, best_i = carry
        c = jax.lax.dynamic_slice_in_dim(center, start, chunk, axis=0)
        r = jax.lax.dynamic_slice_in_dim(radius, start, chunk, axis=0)
        t = sphere_hit_t(org, dirs, c, r, jnp.maximum(eps, eps_rel * r))
        # mask padded dummy spheres (radius 0 never hits with eps>0, but be
        # explicit for eps<=0 configs)
        t = jnp.where((r > 0.0)[None, :], t, jnp.inf)
        tmin = jnp.min(t, axis=-1)
        imin = jnp.argmin(t, axis=-1).astype(jnp.int32) + start
        better = tmin < best_t
        return (jnp.where(better, tmin, best_t), jnp.where(better, imin, best_i))

    best_t, best_i = _chunked_min(padded.n_spheres, chunk, body, init)

    ok = jnp.isfinite(best_t)[:, None]
    x = org + jnp.where(ok, best_t[:, None], 0.0) * dirs
    ctr = jnp.take(scene.center, jnp.clip(best_i, 0, s - 1), axis=0)
    # guard miss lanes to keep primal and gradients finite
    nrm = safe_normalize(jnp.where(ok, x - ctr, 1.0))
    x = jnp.where(ok, x, 0.0)
    inst = jnp.clip(best_i, 0, s - 1)
    return Hit(
        t=best_t,
        inst=inst,
        prim=inst,
        x=x,
        n=nrm,
        uv=jnp.where(ok, sphere_uv(nrm), 0.0).astype(org.dtype),
    )


def tri_hit_tuv(org, dirs, v0, v1, v2):
    """Per (lane, tri) (t,u,v) via iq's formulation (scene.cpp:52-70);
    t=inf outside barycentric bounds. org/dirs (N,3), v* (T,3). Returns
    (N,T) t, u, v."""
    v1v0 = v1 - v0  # (T,3)
    v2v0 = v2 - v0
    n = jnp.cross(v1v0, v2v0)  # (T,3)
    # rov0 = ro - v0 per (lane, tri); expand via matmuls where possible
    # q = cross(rov0, rd): depends on both -> need (N,T,3); keep chunk small.
    rov0 = org[:, None, :] - v0[None, :, :]  # (N,T,3)
    q = jnp.cross(rov0, dirs[:, None, :])  # (N,T,3)
    d = 1.0 / (dirs @ n.T)  # (N,T)
    u = d * jnp.einsum("ntk,tk->nt", -q, v2v0)
    v = d * jnp.einsum("ntk,tk->nt", q, v1v0)
    t = d * jnp.einsum("tk,ntk->nt", -n, rov0)
    inside = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & ((u + v) <= 1.0)
    t = jnp.where(inside, t, jnp.inf)
    return t, u, v


def intersect_mesh(
    org: jnp.ndarray,
    dirs: jnp.ndarray,
    scene: MeshScene,
    eps: float = 0.0,
    chunk: int = 256,
) -> Hit:
    """Brute-force closest triangle hit (CPUIntersector analog,
    smallpt.cpp:443-458 + scene.cpp:95-116). Rejects t <= eps (the reference
    rejects t <= 0, scene.cpp:105).

    Hit position/normal are barycentric interpolations with the reference's
    convention P = wA + uB + vC, w = 1-u-v (scene.cpp:80-89)."""
    n = org.shape[0]
    tcount = scene.n_triangles
    chunk = min(chunk, tcount)
    pad = (-tcount) % chunk
    idx = scene.indices
    tri_inst = scene.tri_inst
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad, 3), idx.dtype)])
        tri_inst = jnp.concatenate([tri_inst, jnp.zeros((pad,), tri_inst.dtype)])
    degenerate_pad = jnp.arange(tcount + pad) >= tcount

    pos = scene.positions

    init = (
        jnp.full((n,), jnp.inf, org.dtype),
        jnp.zeros((n,), jnp.int32),  # tri id
        jnp.zeros((n,), org.dtype),  # u
        jnp.zeros((n,), org.dtype),  # v
    )

    def body(carry, start):
        bt, bi, bu, bv = carry
        tri = jax.lax.dynamic_slice_in_dim(idx, start, chunk, axis=0)
        padmask = jax.lax.dynamic_slice_in_dim(degenerate_pad, start, chunk, axis=0)
        v0 = jnp.take(pos, tri[:, 0], axis=0)
        v1 = jnp.take(pos, tri[:, 1], axis=0)
        v2 = jnp.take(pos, tri[:, 2], axis=0)
        t, u, v = tri_hit_tuv(org, dirs, v0, v1, v2)
        t = jnp.where((t > eps) & ~padmask[None, :], t, jnp.inf)
        tmin = jnp.min(t, axis=-1)
        j = jnp.argmin(t, axis=-1)
        lane = jnp.arange(n)
        better = tmin < bt
        return (
            jnp.where(better, tmin, bt),
            jnp.where(better, (j + start).astype(jnp.int32), bi),
            jnp.where(better, u[lane, j], bu),
            jnp.where(better, v[lane, j], bv),
        )

    bt, bi, bu, bv = _chunked_min(tcount + pad, chunk, body, init)
    return complete_mesh_hit(scene, bt, bi, bu, bv)


def complete_mesh_hit(scene: MeshScene, bt, bi, bu, bv) -> Hit:
    """Hit construction from (t, triId, u, v) — makeHit's barycentric
    interpolation with the reference's convention P = wA + uB + vC,
    w = 1-u-v (scene.cpp:73-93). Shared by the pure-JAX and Pallas mesh
    backends (the OptixIntersector::convertHits slot, smallpt.cpp:532-549)."""
    tcount = scene.n_triangles
    pos = scene.positions
    tri = jnp.take(scene.indices, jnp.clip(bi, 0, tcount - 1), axis=0)  # (N,3)
    p0 = jnp.take(pos, tri[:, 0], axis=0)
    p1 = jnp.take(pos, tri[:, 1], axis=0)
    p2 = jnp.take(pos, tri[:, 2], axis=0)
    n0 = jnp.take(scene.normals, tri[:, 0], axis=0)
    n1 = jnp.take(scene.normals, tri[:, 1], axis=0)
    n2 = jnp.take(scene.normals, tri[:, 2], axis=0)
    w = 1.0 - bu - bv
    x = w[:, None] * p0 + bu[:, None] * p1 + bv[:, None] * p2
    nrm = w[:, None] * n0 + bu[:, None] * n1 + bv[:, None] * n2
    inst = jnp.take(scene.tri_inst, jnp.clip(bi, 0, tcount - 1))
    ok = jnp.isfinite(bt)[:, None]
    return Hit(
        t=bt,
        inst=inst,
        prim=jnp.clip(bi, 0, tcount - 1),
        x=jnp.where(ok, x, 0.0),
        n=jnp.where(ok, nrm, 1.0),
        uv=jnp.stack([bu, bv], axis=-1),
    )
