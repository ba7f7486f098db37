"""Masked fixed-shape wavefront scheduler — the TPU replacement for
Renderer::render's trace→shade→compact loop (smallpt.cpp:779-807).

The reference advances all live paths one bounce at a time, then
stream-compacts survivors into a shrinking buffer (smallpt.cpp:793-806) and
*grows* the buffer on refraction splits (smallpt.cpp:203-206). XLA needs
static shapes, so instead:

- the path buffer has fixed capacity (n_samples x split_budget lanes) and an
  ``alive`` mask; misses/RR kills flip the mask instead of compacting
- refraction splitting (smallpt.cpp:248-254) spawns the refracted child into
  a dead lane of the sample's budget group via a masked within-group
  assignment; if the group is out of free lanes, the path falls back to the
  reference's own probabilistic single-path selection (smallpt.cpp:256-263)
- the bounce loop is a ``lax.while_loop`` that exits when no lane is alive
  (or a ``lax.scan`` of fixed depth for the differentiable path, since
  while_loop is not reverse-differentiable)

Per-lane radiance accumulators replace the reference's mutable
outColor[pixelIdx] scatter (smallpt.cpp:180): a lane never changes pixel, so
the per-pixel image is a reshape-sum at the end — no scatter, no races.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from smallpt_tpu.config import RenderConfig, Mode
from smallpt_tpu.core import camera as cam
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.scene import DIFF, SPEC, REFR, Material
from smallpt_tpu.ops import bsdf
from smallpt_tpu.ops.intersect import Hit


class TriLightData(NamedTuple):
    """One triangle-mesh area light for next-event estimation: the light
    instance's triangles flattened to vertex tables with an area CDF
    (built eagerly — engine/renderer.py::_mesh_nee_for — because
    compacting an instance's triangles is a dynamic-shape op under jit).
    The mesh analog of the sphere NEE block's cone sampling."""

    a: jnp.ndarray  # (T,3) first vertices
    b: jnp.ndarray  # (T,3)
    c: jnp.ndarray  # (T,3)
    n: jnp.ndarray  # (T,3) unit geometric normals
    cdf: jnp.ndarray  # (T,) inclusive area CDF, cdf[-1] == 1
    area_total: jnp.ndarray  # () total area
    le: jnp.ndarray  # (3,) instance emission
    inst: int  # static instance id (hit/suppression tests)


class PathState(NamedTuple):
    """SoA wavefront path state — PathContrib (smallpt.cpp:106-118) plus the
    alive mask, split-tree history, and per-lane radiance accumulator.
    All arrays are (L, ...) with L = n_samples * split_budget."""

    org: jnp.ndarray  # (L,3)
    dir: jnp.ndarray  # (L,3)
    weight: jnp.ndarray  # (L,3) path throughput
    depth: jnp.ndarray  # (L,) int32
    hist: jnp.ndarray  # (L,) int32 split-tree position (core/rng.py)
    alive: jnp.ndarray  # (L,) bool
    radiance: jnp.ndarray  # (L,3) accumulated contribution
    suppress: jnp.ndarray  # (L,) int32 bitmask: bit j = light j's emission
    #   was direct-sampled at the previous vertex (NEE) — don't double count


def initial_state(org, dirs, budget: int, dtype) -> PathState:
    """Camera paths occupy slot 0 of each budget group; other slots dead."""
    n = org.shape[0]
    if budget == 1:
        return PathState(
            org=org,
            dir=dirs,
            weight=jnp.ones((n, 3), dtype),
            depth=jnp.zeros((n,), jnp.int32),
            hist=jnp.zeros((n,), jnp.int32),
            alive=jnp.ones((n,), bool),
            radiance=jnp.zeros((n, 3), dtype),
            suppress=jnp.zeros((n,), jnp.int32),
        )
    L = n * budget
    slot = jnp.tile(jnp.arange(budget, dtype=jnp.int32), n)
    rep = lambda a: jnp.repeat(a, budget, axis=0)
    return PathState(
        org=rep(org),
        dir=rep(dirs),
        weight=jnp.ones((L, 3), dtype),
        depth=jnp.zeros((L,), jnp.int32),
        hist=jnp.zeros((L,), jnp.int32),
        alive=slot == 0,
        radiance=jnp.zeros((L, 3), dtype),
        suppress=jnp.zeros((L,), jnp.int32),
    )


def material_lookup(material: Material, inst: jnp.ndarray, dtype):
    """Per-lane material fetch: (emission, albedo, is_diff, is_spec, is_refr).

    For small instance tables this is a one-hot (L,S)x(S,9) matmul — TPU
    gathers of tiny tables are pathologically slow (measured 32 ms vs 2 ms
    for 3.1M lanes x 9 spheres), while the MXU eats this shape. Large tables
    fall back to gathers.
    """
    S = material.albedo.shape[0]
    if S <= 64:
        onehot = (inst[:, None] == jnp.arange(S, dtype=inst.dtype)[None, :]).astype(dtype)
        refl_onehot = (
            material.refl[:, None] == jnp.arange(3, dtype=material.refl.dtype)[None, :]
        ).astype(dtype)  # (S,3)
        table = jnp.concatenate(
            [material.emission.astype(dtype), material.albedo.astype(dtype), refl_onehot],
            axis=1,
        )  # (S,9)
        # precision='highest': the bf16-pass MXU default corrupts values like
        # 0.999, breaking bit-parity with gathers (and the oracle)
        vals = jnp.matmul(onehot, table, precision="highest")  # (L,9) — MXU
        emission, albedo = vals[:, 0:3], vals[:, 3:6]
        is_diff = vals[:, 6] > 0.5
        is_spec = vals[:, 7] > 0.5
        is_refr = vals[:, 8] > 0.5
    else:
        emission = jnp.take(material.emission, inst, axis=0)
        albedo = jnp.take(material.albedo, inst, axis=0)
        refl = jnp.take(material.refl, inst)
        is_diff, is_spec, is_refr = refl == DIFF, refl == SPEC, refl == REFR
    return emission, albedo, is_diff, is_spec, is_refr


def _int2color(n: jnp.ndarray, dtype) -> jnp.ndarray:
    """False-color hash for id AOVs (smallpt.cpp:24-29): fract is x - trunc(x)
    as in the reference's x - int32(x)."""
    v = jnp.asarray([12.9898, 78.233, 56.128], dtype)
    x = (n.astype(dtype) + 1.0)[:, None] * v[None, :]
    x = jnp.sin(x) * 43758.5453
    return x - jnp.trunc(x)


def _aov_value(hit: Hit, nl, weight, material: Material, mode: Mode, dtype):
    if mode == Mode.NORMAL:
        return nl
    if mode == Mode.UV:
        return jnp.concatenate([hit.uv, jnp.zeros_like(hit.uv[:, :1])], axis=-1)
    if mode == Mode.INST_ID:
        return _int2color(hit.prim, dtype)
    if mode == Mode.EMISSION:
        return weight * jnp.take(material.emission, hit.inst, axis=0)
    raise ValueError(mode)


def bounce_step(
    state: PathState,
    intersect_fn: Callable[[jnp.ndarray, jnp.ndarray], Hit],
    material: Material,
    config: RenderConfig,
    key: jax.Array,
    sample_ids: jnp.ndarray,
    nee_scene=None,
    uniform_fns=None,
) -> PathState:
    """One trace+shade wavefront iteration over all lanes (masked).

    uniform_fns: optional (shade_fn(depth) -> (L, 4), nee_fn(depth, slot)
    -> (L, 2)) overriding the per-pass (sample, hist, depth) keying —
    the streaming engines inject (pixel, ip)-keyed draws here so this one
    shading implementation serves both keying schemes.

    nee_scene: light-sampling data when config.nee_lights is non-empty —
    the SphereScene itself (cone sampling reads light centers/radii), or a
    tuple of TriLightData for mesh area lights; shadow queries go through
    the same intersect_fn either way."""
    dtype = state.org.dtype
    L = state.org.shape[0]
    B = config.split_budget

    hit = intersect_fn(state.org, state.dir)
    live_hit = state.alive & hit.valid

    n = hit.n
    if config.flip_normals:
        # original smallpt: nl faces against the incoming ray
        nl = jnp.where(jnp.sum(n * state.dir, axis=-1, keepdims=True) < 0.0, n, -n)
    else:
        nl = n  # reference's active (broken-glass) behavior, smallpt.cpp:174

    if config.mode != Mode.FULL:
        # AOV debug modes accumulate at the first hit and terminate
        # (the `continue` at smallpt.cpp:183).
        aov = _aov_value(hit, nl, state.weight, material, config.mode, dtype)
        radiance = state.radiance + jnp.where(live_hit[:, None], aov, 0.0)
        return state._replace(radiance=radiance, alive=jnp.zeros_like(state.alive))

    if config.has_env:
        # escaped rays pick up the constant environment radiance — the
        # hook the reference leaves at smallpt.cpp:168; the lane then dies
        # below exactly as a plain miss does
        live_miss = state.alive & ~hit.valid
        env = jnp.asarray(config.env_emission, dtype)
        state = state._replace(
            radiance=state.radiance
            + jnp.where(live_miss[:, None], state.weight * env[None, :], 0.0)
        )

    emission, albedo, is_diff, is_spec, is_refr = material_lookup(
        material, hit.inst, dtype
    )

    if config.nee_lights:
        # a light whose direct term was sampled at the previous vertex must
        # not ALSO contribute through this BSDF-sampled hit (smallpt-explicit
        # E-flag semantics, per light)
        hit_suppressed = jnp.zeros_like(live_hit)
        for slot, li in enumerate(config.nee_lights):
            hit_suppressed = hit_suppressed | (
                (hit.inst == li) & (((state.suppress >> slot) & 1) == 1)
            )
        emission_counted = jnp.where(hit_suppressed[:, None], 0.0, emission)
    else:
        emission_counted = emission

    radiance = state.radiance + jnp.where(
        live_hit[:, None], state.weight * emission_counted, 0.0
    )

    if uniform_fns is not None:
        _shade_u, _nee_u = uniform_fns
        u = _shade_u(state.depth)
    else:
        _nee_u = lambda depth, slot: prng.nee_uniforms(
            key, sample_ids, state.hist, depth, slot, dtype
        )
        u = prng.shade_uniforms(
            key, sample_ids, state.hist, state.depth, dtype
        )

    survive, boost = bsdf.russian_roulette(
        albedo, state.depth, u[:, prng.U_RR], config.rr_depth
    )
    f = albedo * boost[:, None]

    # Candidate continuations for all three BSDFs.
    d_diff = bsdf.cosine_sample(nl, u[:, prng.U_BSDF_1], u[:, prng.U_BSDF_2])
    d_spec = bsdf.mirror_dir(state.dir, n)
    rt = bsdf.refr_terms(state.dir, n, nl, config.ior)

    # --- REFR split resolution -------------------------------------------
    want_split = is_refr & ~rt.tir & (state.depth <= config.split_depth) & live_hit & survive
    if B > 1:
        wg = want_split.reshape(-1, B)
        # free slots: lanes dead after this bounce's kill/miss updates
        next_alive_nosplit = live_hit & survive
        free = (~next_alive_nosplit).reshape(-1, B)
        spawn_rank = jnp.cumsum(wg, axis=1) - 1
        n_free = jnp.sum(free, axis=1, keepdims=True)
        can_split = (wg & (spawn_rank < n_free)).reshape(L)
        free_rank = jnp.cumsum(free, axis=1) - 1
        n_want = jnp.sum(wg & (spawn_rank < n_free), axis=1, keepdims=True)
        # M[g,j,i]: free slot j receives the child of splitter i
        fill = (
            free[:, :, None]
            & (free_rank[:, :, None] < n_want[:, :, None])
            & wg[:, None, :]
            & (spawn_rank[:, None, :] < n_free[:, :, None])
            & (spawn_rank[:, None, :] == free_rank[:, :, None])
        )
        filled = jnp.any(fill, axis=2).reshape(L)
        src_local = jnp.argmax(fill, axis=2)  # (G,B) index within group
        lane_ids = jnp.arange(L, dtype=jnp.int32).reshape(-1, B)
        src = jnp.take_along_axis(lane_ids, src_local, axis=1).reshape(L)
    else:
        can_split = jnp.zeros((L,), bool)
        filled = jnp.zeros((L,), bool)
        src = jnp.zeros((L,), jnp.int32)

    # --- continuation select ----------------------------------------------
    # REFR lane continuation: TIR -> reflect f; split -> reflect f*Re;
    # else probabilistic (smallpt.cpp:256-263).
    choose_refl = u[:, prng.U_CHOICE] < rt.p_refl
    refr_dir = jnp.where(
        (rt.tir | can_split | choose_refl)[:, None], d_spec, rt.tdir
    )
    one = jnp.ones_like(rt.re)
    refr_w = jnp.where(
        rt.tir,
        one,
        jnp.where(
            can_split,
            rt.re,
            jnp.where(
                choose_refl, rt.re / rt.p_refl, rt.tr / (1.0 - rt.p_refl)
            ),
        ),
    )

    if config.detach_sampling:
        # detached-sampling gradients: only the STOCHASTIC direction (cosine
        # hemisphere sample) is a constant of the backward pass; mirror and
        # refraction directions are deterministic functions of the geometry,
        # so their derivatives ARE the specular transport gradient — without
        # them, d(loss)/d(center) of a SPEC/REFR sphere is identically zero
        # (see RenderConfig.detach_sampling)
        d_diff = jax.lax.stop_gradient(d_diff)
    new_dir = jnp.where(
        is_diff[:, None], d_diff, jnp.where(is_spec[:, None], d_spec, refr_dir)
    )
    w_factor = f * jnp.where(is_refr, refr_w, 1.0)[:, None]

    # continuation-origin offset: +nl on the reflected side, -nl for
    # transmitted rays (the reference offsets +0.02*n uniformly,
    # smallpt.cpp:172; directional offsetting is required for f32 at
    # smallpt's 1e5 scene scale — see RenderConfig.shading_eps)
    transmitted = is_refr & ~rt.tir & ~can_split & ~choose_refl
    off_sign = jnp.where(transmitted, -1.0, 1.0).astype(dtype)
    x = hit.x + (config.shading_eps * off_sign)[:, None] * nl
    x_trans = hit.x - config.shading_eps * nl  # for spawned refract children

    new_suppress = jnp.zeros_like(state.suppress)
    if config.nee_lights:
        # ---- next-event estimation (explicit light sampling) --------------
        # the smallpt-explicit estimator: at each surviving diffuse vertex,
        # sample the solid-angle cone of every listed light sphere, cast a
        # shadow ray, and add f * Le * cos * omega / pi. Hit points INSIDE a
        # light sphere skip it (cone sampling is undefined there) and keep
        # plain emission pickup — unbiased under smallpt's giant ceiling
        # light, whose shell passes millimetres above the Cornell ceiling.
        if nee_scene is None:
            raise ValueError(
                "config.nee_lights requires light-sampling data: a "
                "SphereScene (cone sampling), or per-light TriLightData "
                "for mesh area lights (built from a CONCRETE MeshScene by "
                "engine/renderer.py::_mesh_nee_for)"
            )
        two_pi = jnp.asarray(2.0 * jnp.pi, dtype)
        sphere_lights = hasattr(nee_scene, "center")
        for slot, li in enumerate(config.nee_lights):
            if not sphere_lights:
                # ---- triangle AREA light (mesh scenes) -------------------
                # uniform-by-area point on the light instance: pick a
                # triangle through the area CDF, reusing the pick uniform's
                # conditional remainder for the first barycentric (exactly
                # mirrored by the f64 oracle), then the sqrt warp.
                data: TriLightData = nee_scene[slot]
                un = _nee_u(state.depth, slot)
                u0, u1 = un[:, 0], un[:, 1]
                cdf = data.cdf.astype(dtype)
                j = jnp.clip(
                    jnp.searchsorted(cdf, u0, side="right"),
                    0, cdf.shape[0] - 1,
                )
                lo = jnp.where(j > 0, cdf[jnp.maximum(j - 1, 0)], 0.0)
                u0r = jnp.clip(
                    (u0 - lo) / jnp.maximum(cdf[j] - lo, 1e-12), 0.0, 1.0
                )
                va = data.a.astype(dtype)[j]
                vb = data.b.astype(dtype)[j]
                vc = data.c.astype(dtype)[j]
                su = jnp.sqrt(u0r)[:, None]
                y = (1.0 - su) * va + su * (
                    (1.0 - u1)[:, None] * vb + u1[:, None] * vc
                )
                ny = data.n.astype(dtype)[j]
                sw = y - x
                d2 = jnp.sum(sw * sw, axis=-1)
                dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
                ldir = sw / dist[:, None]
                if config.detach_sampling:
                    # same policy as the cone sample: the stochastic
                    # direction is a constant of the backward pass
                    ldir = jax.lax.stop_gradient(ldir)
                shadow = intersect_fn(x, ldir)
                # visible iff the closest hit IS the light instance at ~the
                # sampled distance (a nearer hit — even on the same
                # instance — occludes the sampled point)
                lit = (
                    shadow.valid
                    & (shadow.inst == data.inst)
                    & (shadow.t >= dist * (1.0 - 1e-3))
                )
                cos_x = jnp.maximum(jnp.sum(ldir * nl, axis=-1), 0.0)
                # two-sided emitter: emission pickup at hits has no side
                # test, so NEE must not either
                cos_y = jnp.abs(jnp.sum(ldir * ny, axis=-1))
                geom = cos_x * cos_y * data.area_total.astype(dtype) / (
                    jnp.maximum(d2, 1e-12)
                )
                sampled = live_hit & survive & is_diff
                active = sampled & lit
                contrib = (
                    state.weight * f * data.le.astype(dtype)[None, :]
                    * (geom / jnp.pi)[:, None]
                )
                radiance = radiance + jnp.where(
                    active[:, None], contrib, 0.0
                )
                new_suppress = new_suppress | jnp.where(
                    sampled, jnp.int32(1 << slot), 0
                )
                continue
            lc = nee_scene.center[li].astype(dtype)
            lr = nee_scene.radius[li].astype(dtype)
            le = nee_scene.material.emission[li].astype(dtype)
            sw = lc[None, :] - x  # (L,3)
            d2 = jnp.sum(sw * sw, axis=-1)
            inside = d2 <= lr * lr
            cos_a_max = jnp.sqrt(
                jnp.maximum(1.0 - (lr * lr) / jnp.maximum(d2, 1e-12), 0.0)
            )
            un = _nee_u(state.depth, slot)
            cos_a = 1.0 - un[:, 0] + un[:, 0] * cos_a_max
            sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))
            phi = two_pi * un[:, 1]
            swn = sw / jnp.sqrt(jnp.maximum(d2, 1e-12))[:, None]
            up = jnp.where(
                (jnp.abs(swn[:, 0]) > 0.1)[:, None],
                jnp.asarray([0.0, 1.0, 0.0], dtype)[None, :],
                jnp.asarray([1.0, 0.0, 0.0], dtype)[None, :],
            )
            su = jnp.cross(up, swn)
            su = su / jnp.linalg.norm(su, axis=-1, keepdims=True)
            sv = jnp.cross(swn, su)
            ldir = (
                su * (jnp.cos(phi) * sin_a)[:, None]
                + sv * (jnp.sin(phi) * sin_a)[:, None]
                + swn * cos_a[:, None]
            )
            ldir = ldir / jnp.linalg.norm(ldir, axis=-1, keepdims=True)
            if config.detach_sampling:
                # same policy as the cosine sample: the stochastic direction
                # is a constant of the backward pass
                ldir = jax.lax.stop_gradient(ldir)
            shadow = intersect_fn(x, ldir)
            lit = shadow.valid & (shadow.inst == li)
            cosine = jnp.maximum(jnp.sum(ldir * nl, axis=-1), 0.0)
            omega = two_pi * (1.0 - cos_a_max)
            sampled = live_hit & survive & is_diff & ~inside
            active = sampled & lit
            contrib = (
                state.weight * f * le[None, :]
                * (cosine * omega / jnp.pi)[:, None]
            )
            radiance = radiance + jnp.where(active[:, None], contrib, 0.0)
            # suppress this light's emission at the NEXT (BSDF-sampled)
            # vertex whenever the cone sample was attempted, lit or not
            new_suppress = new_suppress | jnp.where(
                sampled, jnp.int32(1 << slot), 0
            )

    parent_alive = live_hit & survive
    new_state = PathState(
        org=jnp.where(parent_alive[:, None], x, state.org),
        dir=jnp.where(parent_alive[:, None], new_dir, state.dir),
        weight=jnp.where(parent_alive[:, None], state.weight * w_factor, state.weight),
        depth=state.depth + 1,
        hist=jnp.where(can_split, 2 * state.hist + 1, state.hist),
        alive=parent_alive,
        radiance=radiance,
        suppress=new_suppress,
    )

    if B > 1:
        # spawn refracted children into their assigned free slots
        child_org = jnp.take(x_trans, src, axis=0)
        child_dir = jnp.take(rt.tdir, src, axis=0)
        child_w = jnp.take(state.weight * f * rt.tr[:, None], src, axis=0)
        child_depth = jnp.take(state.depth, src) + 1
        child_hist = 2 * jnp.take(state.hist, src) + 2
        fm = filled[:, None]
        new_state = new_state._replace(
            org=jnp.where(fm, child_org, new_state.org),
            dir=jnp.where(fm, child_dir, new_state.dir),
            weight=jnp.where(fm, child_w, new_state.weight),
            depth=jnp.where(filled, child_depth, new_state.depth),
            hist=jnp.where(filled, child_hist, new_state.hist),
            alive=new_state.alive | filled,
            suppress=jnp.where(filled, 0, new_state.suppress),
        )

    return new_state


def run_wavefront(
    state: PathState,
    intersect_fn,
    material: Material,
    config: RenderConfig,
    key: jax.Array,
    sample_ids: jnp.ndarray,
    differentiable: bool = False,
    nee_scene=None,
):
    """Run the bounce loop to completion.

    Forward-only: lax.while_loop with early exit when no lane is alive (the
    reference's `while (pathCount > 0)`, smallpt.cpp:779). Differentiable:
    fixed-length lax.scan (reverse-diffable), same math.

    Returns (final_state, rays_traced) — rays_traced counts live lanes summed
    over bounces, the observability counter the reference only exposes as a
    per-bounce log line (smallpt.cpp:781).
    """

    def body(st):
        return bounce_step(st, intersect_fn, material, config, key, sample_ids,
                           nee_scene=nee_scene)

    if differentiable:
        # fixed-length scan (reverse-differentiable); with diff_remat each
        # bounce is rematerialized on the backward sweep instead of stored
        # (jax.checkpoint trades FLOPs for HBM); without it the scan stores
        # bounce residuals and the backward is pure VJP
        ckpt_body = jax.checkpoint(body) if config.diff_remat else body

        def scan_body(st, _):
            rays = jnp.sum(st.alive.astype(jnp.int32))
            return ckpt_body(st), rays

        state, rays = jax.lax.scan(scan_body, state, None, length=config.max_depth)
        return state, jnp.sum(rays)

    def cond(carry):
        st, bounce, rays = carry
        return (bounce < config.max_depth) & jnp.any(st.alive)

    def wbody(carry):
        st, bounce, rays = carry
        rays = rays + jnp.sum(st.alive.astype(jnp.int32))
        return body(st), bounce + 1, rays

    state, _, rays = jax.lax.while_loop(
        cond, wbody, (state, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    )
    return state, rays


def run_wavefront_regen(
    camera,
    intersect_fn,
    material: Material,
    config: RenderConfig,
    key: jax.Array,
    pixel: jnp.ndarray,  # (G,) pixel index per lane
    col: jnp.ndarray,  # (G,)
    row: jnp.ndarray,  # (G,)
    ip_offset: jnp.ndarray,  # (G,) or scalar: first in-pixel sample index
    k_samples: int,  # samples consumed sequentially per lane
    *,
    nee_scene=None,
):
    """Regenerative (persistent-lane) wavefront — the TPU-native occupancy
    fix.

    The reference restores occupancy by stream compaction
    (smallpt.cpp:793-806); sorts and scatters are TPU-hostile, so instead
    each lane owns one pixel and renders k_samples of it sequentially: when
    its path dies, the lane immediately regenerates the pixel's next camera
    sample *inside the loop* (path regeneration à la wavefront GPU tracers).
    Lane->pixel stays fixed, so radiance still accumulates per lane with no
    scatter, and occupancy stays near 1 until the sample stream drains.

    Requires split_budget == 1 (budgeted splitting needs grouped lanes; use
    run_wavefront for fidelity mode). Per-path depth is capped at
    config.max_depth, matching the flat scheduler's iteration cap.

    Returns (radiance (G,3) summed over the k_samples, rays_traced).
    """
    if config.split_budget != 1:
        raise ValueError("regenerative scheduler requires split_budget == 1")
    dtype = jnp.dtype(config.dtype)
    G = pixel.shape[0]
    spp = config.spp
    ip_offset = jnp.broadcast_to(jnp.asarray(ip_offset, jnp.int32), (G,))

    state = PathState(
        org=jnp.zeros((G, 3), dtype),
        dir=jnp.ones((G, 3), dtype),
        weight=jnp.zeros((G, 3), dtype),
        depth=jnp.zeros((G,), jnp.int32),
        hist=jnp.zeros((G,), jnp.int32),
        alive=jnp.zeros((G,), bool),
        radiance=jnp.zeros((G, 3), dtype),
        suppress=jnp.zeros((G,), jnp.int32),
    )
    s_idx0 = jnp.full((G,), -1, jnp.int32)  # last consumed sample slot

    def cond(carry):
        st, s_idx, sid, bounce, rays = carry
        more = st.alive | (s_idx < k_samples - 1)
        return (bounce < k_samples * config.max_depth) & jnp.any(more)

    def body(carry):
        st, s_idx, sid, bounce, rays = carry
        # --- regenerate dead lanes with their pixel's next sample ----------
        need = (~st.alive) & (s_idx < k_samples - 1)
        s_new = jnp.where(need, s_idx + 1, s_idx)
        ip = ip_offset + s_new
        sid_new = pixel * spp + ip
        group = ip // config.spp_per_cell
        cx = group % config.jitter_size
        cy = group // config.jitter_size
        u_cam = prng.camera_uniforms(key, sid_new, dtype)
        u_lens = (
            prng.lens_uniforms(key, sid_new, dtype)
            if config.aperture > 0.0 else None
        )
        org0, dir0 = cam.generate_rays(camera, u_cam, config, col, row, cx, cy,
                                       u_lens=u_lens)
        nm = need[:, None]
        st = PathState(
            org=jnp.where(nm, org0, st.org),
            dir=jnp.where(nm, dir0, st.dir),
            weight=jnp.where(nm, 1.0, st.weight),
            depth=jnp.where(need, 0, st.depth),
            hist=jnp.where(need, 0, st.hist),
            alive=st.alive | need,
            radiance=st.radiance,
            suppress=jnp.where(need, 0, st.suppress),
        )
        sid = jnp.where(need, sid_new, sid)
        # --- one bounce -----------------------------------------------------
        rays = rays + jnp.sum(st.alive.astype(jnp.int32))
        st = bounce_step(st, intersect_fn, material, config, key, sid,
                         nee_scene=nee_scene)
        # per-path depth cap (the flat scheduler's iteration cap equivalent)
        st = st._replace(alive=st.alive & (st.depth < config.max_depth))
        return st, s_new, sid, bounce + 1, rays

    carry = (
        state,
        s_idx0,
        jnp.zeros((G,), jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )
    state, _, _, _, rays = jax.lax.while_loop(cond, body, carry)
    return state.radiance, rays
