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
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.scene import DIFF, SPEC, REFR, Material
from smallpt_tpu.ops import bsdf
from smallpt_tpu.ops.intersect import Hit


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
    )


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
) -> PathState:
    """One trace+shade wavefront iteration over all lanes (masked)."""
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

    emission = jnp.take(material.emission, hit.inst, axis=0)
    albedo = jnp.take(material.albedo, hit.inst, axis=0)
    refl = jnp.take(material.refl, hit.inst, axis=0)

    radiance = state.radiance + jnp.where(
        live_hit[:, None], state.weight * emission, 0.0
    )

    u = prng.shade_uniforms(key, sample_ids, state.hist, state.depth, dtype)

    survive, boost = bsdf.russian_roulette(
        albedo, state.depth, u[:, prng.U_RR], config.rr_depth
    )
    f = albedo * boost[:, None]

    # Candidate continuations for all three BSDFs.
    d_diff = bsdf.cosine_sample(nl, u[:, prng.U_BSDF_1], u[:, prng.U_BSDF_2])
    d_spec = bsdf.mirror_dir(state.dir, n)
    rt = bsdf.refr_terms(state.dir, n, nl, config.ior)

    is_diff = refl == DIFF
    is_spec = refl == SPEC
    is_refr = refl == REFR

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

    new_dir = jnp.where(
        is_diff[:, None], d_diff, jnp.where(is_spec[:, None], d_spec, refr_dir)
    )
    if config.detach_sampling:
        # detached-sampling gradients: the sampled direction is a constant of
        # the backward pass (see RenderConfig.detach_sampling)
        new_dir = jax.lax.stop_gradient(new_dir)
    w_factor = f * jnp.where(is_refr, refr_w, 1.0)[:, None]

    # continuation-origin offset: +nl on the reflected side, -nl for
    # transmitted rays (the reference offsets +0.02*n uniformly,
    # smallpt.cpp:172; directional offsetting is required for f32 at
    # smallpt's 1e5 scene scale — see RenderConfig.shading_eps)
    transmitted = is_refr & ~rt.tir & ~can_split & ~choose_refl
    off_sign = jnp.where(transmitted, -1.0, 1.0).astype(dtype)
    x = hit.x + (config.shading_eps * off_sign)[:, None] * nl
    x_trans = hit.x - config.shading_eps * nl  # for spawned refract children

    parent_alive = live_hit & survive
    new_state = PathState(
        org=jnp.where(parent_alive[:, None], x, state.org),
        dir=jnp.where(parent_alive[:, None], new_dir, state.dir),
        weight=jnp.where(parent_alive[:, None], state.weight * w_factor, state.weight),
        depth=state.depth + 1,
        hist=jnp.where(can_split, 2 * state.hist + 1, state.hist),
        alive=parent_alive,
        radiance=radiance,
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
) -> PathState:
    """Run the bounce loop to completion.

    Forward-only: lax.while_loop with early exit when no lane is alive (the
    reference's `while (pathCount > 0)`, smallpt.cpp:779). Differentiable:
    fixed-length lax.scan (reverse-diffable), same math.
    """

    def body(st):
        return bounce_step(st, intersect_fn, material, config, key, sample_ids)

    if differentiable:
        # fixed-length scan (reverse-differentiable); each bounce is
        # rematerialized on the backward sweep instead of stored
        # (jax.checkpoint trades FLOPs for HBM)
        ckpt_body = jax.checkpoint(body)

        def scan_body(st, _):
            return ckpt_body(st), None

        state, _ = jax.lax.scan(scan_body, state, None, length=config.max_depth)
        return state

    def cond(carry):
        st, bounce = carry
        return (bounce < config.max_depth) & jnp.any(st.alive)

    def wbody(carry):
        st, bounce = carry
        return body(st), bounce + 1

    state, _ = jax.lax.while_loop(cond, wbody, (state, jnp.asarray(0, jnp.int32)))
    return state
