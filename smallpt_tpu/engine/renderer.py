"""The render engine: camera sampling + wavefront loop + per-pixel reduction.

This is the Renderer::render analog (smallpt.cpp:692-814), but the whole
generate→trace→shade loop is one jitted device program — the reference crosses
host↔GPU on every bounce through OptiX host buffers (smallpt.cpp:570-582);
here the host only receives the finished pass image.

Like the reference, ``render`` returns *summed* (unnormalized) per-pixel
radiance for the pass (smallpt.cpp:813) — progressive accumulation divides by
the total sample count only at display/save time (smallpt.cpp:957,995-1001),
which keeps accumulation exact.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from smallpt_tpu.config import RenderConfig, Intersector, Scheduler
from smallpt_tpu.core import camera as cam
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.scene import SphereScene, MeshScene
from smallpt_tpu.ops import intersect as isect
from smallpt_tpu.ops import wavefront


def make_intersect_fn(scene, config: RenderConfig, differentiable: bool = False,
                      mesh_accel=None):
    """Backend selection — the ``using Intersector = ...`` switch
    (smallpt.cpp:605), at runtime instead of compile time.

    differentiable + PALLAS selects the hybrid: Mosaic kernel winner search
    (non-differentiable, fast) + per-lane differentiable replay of the hit
    equation (ops/intersect_pallas.py::intersect_spheres_hybrid_diff).

    ``mesh_accel``: a pre-built MeshGridAccel for big mesh scenes. Under a
    jit trace the scene arrays are tracers and the accel cannot be built
    here — render()/render_with_stats() build it eagerly and thread it
    through (it is a registered pytree); eager callers may omit it."""
    if isinstance(scene, SphereScene):
        if config.intersector == Intersector.PALLAS:
            if differentiable:
                from smallpt_tpu.ops.intersect_pallas import (
                    intersect_spheres_hybrid_diff,
                )

                return lambda o, d: intersect_spheres_hybrid_diff(
                    o, d, scene, eps=config.intersect_eps,
                    eps_rel=config.intersect_eps_rel,
                )
            from smallpt_tpu.config import Mode
            from smallpt_tpu.ops.intersect_pallas import intersect_spheres_pallas

            # uv (sphere lat/long atan2+asin per lane) only when the
            # transport reads it — Mode.UV's AOV; every other mode pays
            # the transcendentals for nothing
            want_uv = config.mode == Mode.UV
            return lambda o, d: intersect_spheres_pallas(
                o, d, scene, eps=config.intersect_eps, want_uv=want_uv
            )
        return lambda o, d: isect.intersect_spheres(
            o,
            d,
            scene,
            eps=config.intersect_eps,
            eps_rel=config.intersect_eps_rel,
            chunk=config.prim_chunk,
        )
    elif isinstance(scene, MeshScene):
        if config.intersector == Intersector.PALLAS:
            accel = mesh_accel if mesh_accel is not None else _mesh_accel_for(scene)
            if accel is not None:
                from smallpt_tpu.ops.mesh_pallas import intersect_mesh_culled

                return lambda o, d: intersect_mesh_culled(
                    o, d, scene, accel, eps=0.0
                )
            from smallpt_tpu.ops.mesh_pallas import intersect_mesh_pallas

            return lambda o, d: intersect_mesh_pallas(o, d, scene, eps=0.0)
        return lambda o, d: isect.intersect_mesh(
            o, d, scene, eps=0.0, chunk=config.prim_chunk
        )
    raise TypeError(f"unknown scene type {type(scene)}")


# Triangle count above which mesh scenes route through the grid-culled
# sweep (ops/mesh_accel.py). Measured on TPU (r3b session, 2026-08-19,
# bench_logs/r3b_20260819_002046.log): at 32k tris the culled path runs
# 0.72/0.74 Mrays/s vs the brute chunked sweep's 1.10/1.12 (sparse/dense
# occlusion, 256x192 depth-12, interleaved one-process A/B) — the
# tile-level early exit is worst-lane bound and the per-tile lists cull
# too little at this granularity, exactly like the sphere-path finding
# (BASELINE.md "Why the binned scheduler loses"). The culled route is
# therefore OPT-IN (env override or the test/bench forcings); the brute
# sweep is the measured default at every size tried on hardware.
MESH_ACCEL_MIN_TRIS = int(
    os.environ.get("SMALLPT_TPU_MESH_ACCEL_MIN", str(1 << 31))
)
_MESH_ACCEL_CACHE: dict = {}
_MESH_ACCEL_CACHE_MAX = 8


def _mesh_accel_for(scene: MeshScene):
    """MeshGridAccel for big concrete mesh scenes, else None (brute).

    Mirrors the sphere-path _RENDERER_CACHE discipline: keyed by the identity
    of BOTH geometry arrays via weakrefs (ADVICE r2: a same-id reuse with
    different geometry would make reach masks non-conservative), LRU
    capped, tracers and unsupported shapes fall through to the brute
    sweep."""
    import weakref

    if isinstance(scene.positions, jax.core.Tracer) or isinstance(
        scene.indices, jax.core.Tracer
    ):
        return None
    if scene.n_triangles < MESH_ACCEL_MIN_TRIS:
        return None
    cache_key = (id(scene.positions), id(scene.indices))
    cached = _MESH_ACCEL_CACHE.get(cache_key)
    if cached is not None:
        ref_p, ref_i, acc_obj = cached
        if ref_p() is scene.positions and ref_i() is scene.indices:
            _MESH_ACCEL_CACHE[cache_key] = _MESH_ACCEL_CACHE.pop(cache_key)
            return acc_obj
    from smallpt_tpu.ops.mesh_accel import build_mesh_grid_accel

    try:
        accel = build_mesh_grid_accel(scene)
    except ValueError:
        return None
    try:
        _MESH_ACCEL_CACHE[cache_key] = (
            weakref.ref(scene.positions), weakref.ref(scene.indices), accel,
        )
        while len(_MESH_ACCEL_CACHE) > _MESH_ACCEL_CACHE_MAX:
            _MESH_ACCEL_CACHE.pop(next(iter(_MESH_ACCEL_CACHE)))
    except TypeError:
        pass
    return accel


def render_samples(
    scene,
    camera,
    config: RenderConfig,
    key: jax.Array,
    sample_ids: jnp.ndarray,
    pixel_cols: jnp.ndarray,
    pixel_rows: jnp.ndarray,
    cell_x: jnp.ndarray,
    cell_y: jnp.ndarray,
    differentiable: bool = False,
    return_stats: bool = False,
    mesh_accel=None,
    mesh_nee=None,
):
    """Render an arbitrary flat batch of camera samples.

    Returns per-sample radiance (N,3) (summed over the sample's split-budget
    lanes), or (radiance, rays_traced) with return_stats=True. This is the
    sharding-friendly core: callers shard the sample axis.
    """
    dtype = jnp.dtype(config.dtype)
    u_cam = prng.camera_uniforms(key, sample_ids, dtype)
    u_lens = (
        prng.lens_uniforms(key, sample_ids, dtype)
        if config.aperture > 0.0 else None
    )
    org, dirs = cam.generate_rays(
        camera, u_cam, config, pixel_cols, pixel_rows, cell_x, cell_y,
        u_lens=u_lens,
    )
    state = wavefront.initial_state(org, dirs, config.split_budget, dtype)
    lane_sample_ids = (
        sample_ids
        if config.split_budget == 1
        else jnp.repeat(sample_ids, config.split_budget, axis=0)
    )
    intersect_fn = make_intersect_fn(scene, config, differentiable,
                                     mesh_accel=mesh_accel)
    nee_scene = _nee_scene_for(scene, config, mesh_nee)
    final, rays = wavefront.run_wavefront(
        state,
        intersect_fn,
        scene.material,
        config,
        key,
        lane_sample_ids,
        differentiable=differentiable,
        nee_scene=nee_scene,
    )
    rad = final.radiance
    if config.split_budget > 1:
        rad = rad.reshape(-1, config.split_budget, 3).sum(axis=1)
    if return_stats:
        return rad, rays
    return rad


def render_pixels(
    scene,
    camera,
    config: RenderConfig,
    key: jax.Array,
    pixel: jnp.ndarray,
    col: jnp.ndarray,
    row: jnp.ndarray,
    ip_offset,
    k_samples: int,
    mesh_accel=None,
    mesh_nee=None,
):
    """Regenerative-scheduler core: one lane per pixel consuming k_samples
    sequentially. Returns (per-pixel radiance (G,3), rays_traced)."""
    intersect_fn = make_intersect_fn(scene, config, mesh_accel=mesh_accel)
    nee_scene = _nee_scene_for(scene, config, mesh_nee)
    return wavefront.run_wavefront_regen(
        camera, intersect_fn, scene.material, config, key,
        pixel, col, row, ip_offset, k_samples, nee_scene=nee_scene,
    )


def _nee_scene_for(scene, config: RenderConfig, mesh_nee=None):
    """Light-sampling data for bounce_step's NEE block: the scene itself
    for sphere emitters (cone sampling reads centers/radii in-trace), or
    the eagerly-built TriLightData tuple for mesh area lights."""
    if not config.nee_lights:
        return None
    if isinstance(scene, SphereScene):
        return scene
    if mesh_nee is None:
        raise ValueError(
            "config.nee_lights on a mesh scene requires CONCRETE geometry "
            "(the per-light triangle tables are compacted outside jit — "
            "_mesh_nee_for); call render()/render_sharded with a concrete "
            "scene, or pass mesh_nee through"
        )
    return mesh_nee


def _mesh_nee_for(scene, config: RenderConfig):
    """Eagerly build per-light TriLightData for mesh area lights
    (config.nee_lights holds INSTANCE ids for mesh scenes). Compacting an
    instance's triangles is a dynamic-shape op, so this runs outside jit
    on concrete arrays — the _mesh_accel_for pattern. Returns None when
    not applicable (sphere scenes, no NEE, traced geometry)."""
    import numpy as np

    from smallpt_tpu.ops.wavefront import TriLightData

    if not config.nee_lights or not isinstance(scene, MeshScene):
        return None
    if any(
        isinstance(leaf, jax.core.Tracer)
        for leaf in (scene.positions, scene.indices, scene.tri_inst)
    ):
        return None
    pos = np.asarray(scene.positions, np.float64)
    idx = np.asarray(scene.indices)
    tri_inst = np.asarray(scene.tri_inst)
    emission = np.asarray(scene.material.emission, np.float64)
    out = []
    for li in config.nee_lights:
        if li >= emission.shape[0]:
            raise ValueError(f"nee light instance {li} out of range")
        tris = np.nonzero(tri_inst == li)[0]
        if tris.size == 0:
            raise ValueError(f"nee light instance {li} has no triangles")
        a = pos[idx[tris, 0]]
        b = pos[idx[tris, 1]]
        c = pos[idx[tris, 2]]
        cross = np.cross(b - a, c - a)
        area2 = np.linalg.norm(cross, axis=1)
        if not (area2 > 0).all():
            raise ValueError(f"nee light instance {li} has degenerate tris")
        n = cross / area2[:, None]
        areas = 0.5 * area2
        total = float(areas.sum())
        cdf = np.cumsum(areas) / total
        cdf[-1] = 1.0
        dt = jnp.dtype(config.dtype)
        out.append(TriLightData(
            a=jnp.asarray(a, dt), b=jnp.asarray(b, dt),
            c=jnp.asarray(c, dt), n=jnp.asarray(n, dt),
            cdf=jnp.asarray(cdf, dt),
            area_total=jnp.asarray(total, dt),
            le=jnp.asarray(emission[li], dt),
            inst=int(li),
        ))
    return tuple(out)


def _use_mega(scene, config: RenderConfig, differentiable: bool) -> bool:
    """Megakernel eligibility: the fused Pallas bounce kernel covers the
    forward Mode.FULL single-path transport on f32 sphere scenes; everything
    else falls back to the pure-JAX schedulers (graceful degradation, like
    the reference's intersector backend switch smallpt.cpp:605)."""
    from smallpt_tpu.config import Mode
    from smallpt_tpu.ops.megakernel import MEGA_MAX_SPHERES

    return (
        config.scheduler == Scheduler.MEGA
        and not differentiable
        # the megakernel runs real Mosaic lowering on TPU and the Pallas
        # interpreter on CPU (tests); on any other backend (e.g. jax[cuda])
        # fall back to the pure-JAX schedulers rather than crash in Mosaic
        and jax.default_backend() in ("tpu", "cpu")
        and config.split_budget == 1
        and config.mode == Mode.FULL
        and config.dtype == "float32"
        and isinstance(scene, SphereScene)
        # the fused kernel wins while per-bounce XLA glue dominates; at
        # ~10k spheres the sweep dominates and the split-sweep intersect
        # kernel (per-chunk argmin vs per-sphere 12-way material fold) is
        # faster — measured 3.15 vs 2.18 Mrays/s on the 10k scene
        and scene.n_spheres <= MEGA_MAX_SPHERES
    )


def _use_regen(config: RenderConfig, differentiable: bool) -> bool:
    return (
        config.scheduler in (Scheduler.REGEN, Scheduler.MEGA)
        and not differentiable
        and config.split_budget == 1
    )


# Measured router policy (r3 TPU session, BASELINE.md "Round-3 TPU
# session"): on the 10k-sphere uniform INTERIOR scene every tile reaches
# every chunk (n_reach = 1250 = all), so per-tile culling removes nothing
# and the binned drain tops out at 2.92 Mrays/s (best tuning,
# sort_every=4/k_near=128) vs 3.59 M for the brute REGEN split-sweep it
# would replace — and below the classic megakernel at every size that fits
# VMEM. Batch render() therefore routes big scenes to the brute path by
# default; the binned scheduler stays OPT-IN (this flag, CLI --binned, or
# the streaming/interactive surfaces, where it is the only incremental
# stepper above MEGA_MAX_SPHERES and step_timed granularity matters more
# than the 1.2x batch-throughput gap).
BINNED_AUTO = False


def _use_binned(scene, config: RenderConfig, differentiable: bool,
                key=None, camera=None) -> bool:
    """Big-scene routing: above the classic megakernel's sphere cap, the
    grid-binned distance-ordered scheduler (engine/binned.py) CAN replace
    the brute split-sweep — but only when BINNED_AUTO opts in, because the
    measured default (see flag comment) is that the brute path wins on
    interior scenes where conservative per-tile reach culling is null.

    The binned drain is a host drive loop with concrete fetches, so any
    traced argument (scene under grad, key under an outer jit/vmap, traced
    camera) must fall through to the fully-jittable _render_jit path."""
    from smallpt_tpu.config import Mode
    from smallpt_tpu.ops.megakernel import MEGA_MAX_SPHERES

    def traced(x):
        return any(
            isinstance(l, jax.core.Tracer) for l in jax.tree.leaves(x)
        )

    return (
        config.scheduler == Scheduler.MEGA
        and not differentiable
        and jax.default_backend() in ("tpu", "cpu")
        and config.split_budget == 1
        # all modes incl. UV (in-kernel polynomial atan2). NEE + AOV is
        # contradictory and rejected by BinnedStreamingRenderer.
        and not (config.nee_lights and config.mode != Mode.FULL)
        and config.dtype == "float32"
        and isinstance(scene, SphereScene)
        and scene.n_spheres > MEGA_MAX_SPHERES
        and not traced(scene)
        and not traced(key)
        and not traced(camera)
    )


# per-(scene, camera, config) RENDERER cache for the render()-level binned
# drain: keyed by the ids of BOTH geometry arrays with weakref identity
# checks (id() alone could alias a recycled object; center alone could
# reuse a stale accel for a scene sharing centers but different radii —
# ADVICE r2) plus the config and camera vector. Caching the whole renderer
# (not just the accel) keeps its per-instance jitted bounce closures across
# render() calls — a rebuild per call re-traces them, the bulk of the
# 0.18-vs-1.46 Mrays/s product-surface drain gap (r3 verdict #3). Bounded
# LRU.
_RENDERER_CACHE: dict = {}
_RENDERER_CACHE_MAX = 4


def _render_binned_drain(scene, camera, config: RenderConfig, key):
    """Per-pass semantics (summed radiance over config.spp samples) through
    the binned streaming scheduler: budget = spp, exact drain. Sample
    streams are the streaming keying (placement-invariant in (pixel, ip)),
    deterministic per (scene, camera, config, key)."""
    import weakref

    import numpy as _np

    from smallpt_tpu.engine.binned import BinnedStreamingRenderer, \
        build_camera_vec

    cam_bytes = _np.asarray(build_camera_vec(camera, config)).tobytes()
    cache_key = (id(scene.center), id(scene.radius), config, cam_bytes)
    r = None
    cached = _RENDERER_CACHE.get(cache_key)
    if cached is not None:
        ref_c, ref_r, r_obj = cached
        if ref_c() is scene.center and ref_r() is scene.radius:
            r = r_obj
            r.reset(0)
            _RENDERER_CACHE[cache_key] = _RENDERER_CACHE.pop(cache_key)
    if r is None:
        r = BinnedStreamingRenderer(scene, camera, config)
        try:
            _RENDERER_CACHE[cache_key] = (
                weakref.ref(scene.center), weakref.ref(scene.radius), r,
            )
            while len(_RENDERER_CACHE) > _RENDERER_CACHE_MAX:
                _RENDERER_CACHE.pop(next(iter(_RENDERER_CACHE)))
        except TypeError:
            pass  # un-weakref-able array type: skip caching
    r.key = key
    # front-loaded budget + deep first advance: flush() then pays ONE fetch
    # per 8-bounce advance instead of a long fetch-per-advance tail
    r.step(add_samples=config.spp, n_bounces=8)
    r.flush()
    rad, _w = r.accumulators()
    return rad, jnp.asarray(float(r.stats.rays), jnp.float32)


def render(
    scene, camera, config: RenderConfig, key: jax.Array, differentiable: bool = False
) -> jnp.ndarray:
    """One full-frame pass. Returns (H, W, 3) summed radiance over
    config.spp samples per pixel (unnormalized, like smallpt.cpp:813)."""
    if _use_binned(scene, config, differentiable, key, camera):
        from smallpt_tpu.ops.accel import AccelUnsupported

        try:
            img, _ = _render_binned_drain(scene, camera, config, key)
            return img
        except AccelUnsupported:
            pass  # e.g. all-small-sphere open scene: brute fallback below
    mesh_accel = _render_mesh_accel(scene, config)
    return _render_jit(scene, camera, config, key, differentiable, mesh_accel,
                       _mesh_nee_for(scene, config))


def _render_mesh_accel(scene, config: RenderConfig):
    """Eager-side accel build for the jitted render paths (inside the trace
    the scene arrays are tracers, so _mesh_accel_for would no-op there)."""
    if isinstance(scene, MeshScene) and config.intersector == Intersector.PALLAS:
        return _mesh_accel_for(scene)
    return None


@functools.partial(jax.jit, static_argnames=("config", "differentiable"))
def _render_jit(
    scene, camera, config: RenderConfig, key: jax.Array,
    differentiable: bool = False, mesh_accel=None, mesh_nee=None,
) -> jnp.ndarray:
    if _use_mega(scene, config, differentiable):
        from smallpt_tpu.ops.megakernel import render_pass_megakernel

        img, _ = render_pass_megakernel(scene, camera, config, key)
        return img
    if _use_regen(config, differentiable):
        pixel = jnp.arange(config.n_pixels, dtype=jnp.int32)
        col = pixel % config.width
        row = pixel // config.width
        rad, _ = render_pixels(
            scene, camera, config, key, pixel, col, row, 0, config.spp,
            mesh_accel=mesh_accel, mesh_nee=mesh_nee,
        )
        return rad.reshape(config.height, config.width, 3)
    sample_ids, pixel, col, row, cx, cy = cam.sample_indices(config, config.n_pixels)
    rad = render_samples(
        scene, camera, config, key, sample_ids, col, row, cx, cy, differentiable,
        mesh_accel=mesh_accel, mesh_nee=mesh_nee,
    )
    img = rad.reshape(config.n_pixels, config.spp, 3).sum(axis=1)
    return img.reshape(config.height, config.width, 3)


def render_with_stats(scene, camera, config: RenderConfig, key: jax.Array):
    """Like render(), additionally returning the number of rays traced —
    the bench.py / observability entry point."""
    if _use_binned(scene, config, False, key, camera):
        from smallpt_tpu.ops.accel import AccelUnsupported

        try:
            return _render_binned_drain(scene, camera, config, key)
        except AccelUnsupported:
            pass
    return _render_with_stats_jit(
        scene, camera, config, key, _render_mesh_accel(scene, config),
        _mesh_nee_for(scene, config),
    )


@functools.partial(jax.jit, static_argnames=("config",))
def _render_with_stats_jit(scene, camera, config: RenderConfig, key: jax.Array,
                           mesh_accel=None, mesh_nee=None):
    if _use_mega(scene, config, False):
        from smallpt_tpu.ops.megakernel import render_pass_megakernel

        return render_pass_megakernel(scene, camera, config, key)
    if _use_regen(config, False):
        pixel = jnp.arange(config.n_pixels, dtype=jnp.int32)
        col = pixel % config.width
        row = pixel // config.width
        rad, rays = render_pixels(
            scene, camera, config, key, pixel, col, row, 0, config.spp,
            mesh_accel=mesh_accel, mesh_nee=mesh_nee,
        )
        return rad.reshape(config.height, config.width, 3), rays
    sample_ids, pixel, col, row, cx, cy = cam.sample_indices(config, config.n_pixels)
    rad, rays = render_samples(
        scene, camera, config, key, sample_ids, col, row, cx, cy,
        return_stats=True, mesh_accel=mesh_accel, mesh_nee=mesh_nee,
    )
    img = rad.reshape(config.n_pixels, config.spp, 3).sum(axis=1)
    return img.reshape(config.height, config.width, 3), rays


def render_image(
    scene,
    camera,
    config: RenderConfig,
    seed: int = 0,
    n_passes: int = 1,
) -> jnp.ndarray:
    """Convenience: run n_passes progressive passes and return the *mean*
    image (H, W, 3). Each pass gets an independent key derived from
    (seed, pass) — the analog of the reference re-seeding each pass with the
    running sampleCount (smallpt.cpp:922,740)."""
    base = prng.base_key(seed)
    acc = jnp.zeros((config.height, config.width, 3), jnp.dtype(config.dtype))
    for p in range(n_passes):
        acc = acc + render(scene, camera, config, jax.random.fold_in(base, p))
    return acc / (n_passes * config.spp)
