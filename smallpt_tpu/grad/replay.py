"""Recorded-winner replay differentiation — the fast config-4 path.

The scan-based differentiable pass (ops/wavefront.py::run_wavefront with
``differentiable=True``) pays the per-bounce winner SEARCH on both sweeps:
the forward traces it, and under ``diff_remat`` the backward re-runs it
inside every rematerialized bounce (the Mosaic winner kernel of the hybrid
intersector included). But the search result is a DISCRETE choice that the
estimator detaches anyway (RenderConfig.detach_sampling — flipping a winner
is a visibility discontinuity, outside the documented bias envelope), so
differentiating "through" it only ever replays the recorded outcome.

This module makes that structure explicit, in two phases:

1. RECORD (non-differentiable, fast): run the forward wavefront with the
   fast Pallas intersector and record each lane's winner sphere id per
   bounce — a (max_depth, L) int32 plane, -1 on miss/dead. Everything else
   a replay needs (camera rays, shade uniforms, branch choices) is a
   deterministic function of (key, sample id, depth) via the shared PCG4D
   keying and therefore recomputable; the winner id is the only product of
   an O(lanes x spheres) search. The recorder reuses bounce_step itself,
   so transport and keying are the pinned ones.

2. REPLAY (differentiable, O(lanes)): a fixed-length scan whose
   "intersector" reconstructs the recorded winner's hit — a one-hot gather
   of (center | radius) plus the cancellation-stable single-sphere replay
   (ops/intersect_pallas.py::_replay_winner, the same arithmetic the
   hybrid path uses after ITS per-bounce search). Gradients of the loss
   w.r.t. scene parameters come from jax.grad of this replay: no Pallas
   kernel and no sweep anywhere in the backward program.

The primal image reported is the RECORD pass's (identical streams and
winner decisions; replay-vs-kernel arithmetic agrees to FMA noise on
razor-edge lanes — the established mega-vs-JAX parity floor). Gradient
equivalence with the scan path is pinned by tests/test_grad_replay.py.

The reference has no differentiable pass; this serves BASELINE.json's
config 4 ("reverse-mode gradients ... via detached-sampling reparameterized
path replay" — this module is that phrase made literal).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from smallpt_tpu.config import Intersector, Mode, RenderConfig
from smallpt_tpu.core import camera as cam
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.scene import SphereScene
from smallpt_tpu.ops import wavefront
from smallpt_tpu.ops.intersect import Hit


def use_replay(scene, config: RenderConfig) -> bool:
    """Eligibility for the recorded-winner replay differentiator.

    NEE configs stay on the scan path (shadow rays are a second intersect
    per bounce whose winner is not recorded); split_budget > 1 likewise
    (lane spawning makes the per-depth winner plane ragged). The pure-JAX
    intersector keeps the scan path too: its full-sweep gradient is the
    reference-fidelity mode (and the FD oracle for this one)."""
    return (
        config.diff_replay
        and isinstance(scene, SphereScene)
        and config.mode == Mode.FULL
        and config.split_budget == 1
        and not config.nee_lights
        and config.intersector == Intersector.PALLAS
    )


def _flat_rays(scene, camera, config: RenderConfig, key):
    """The FLAT sample set + camera rays — exactly render_samples' prologue
    (engine/renderer.py), kept bit-identical so replay streams match every
    other scheduler's."""
    dtype = jnp.dtype(config.dtype)
    sample_ids, _pix, col, row, cx, cy = cam.sample_indices(
        config, config.n_pixels
    )
    u_cam = prng.camera_uniforms(key, sample_ids, dtype)
    u_lens = (
        prng.lens_uniforms(key, sample_ids, dtype)
        if config.aperture > 0.0 else None
    )
    org, dirs = cam.generate_rays(
        camera, u_cam, config, col, row, cx, cy, u_lens=u_lens
    )
    return sample_ids, org, dirs


@functools.partial(jax.jit, static_argnames=("config",))
def record_forward(scene, camera, config: RenderConfig, key):
    """Fast non-differentiable forward pass recording per-bounce winners.

    Returns (mean image (H, W, 3), winners (max_depth, L) int32 with -1 for
    miss-or-dead, rays traced). Callers inside a grad trace should pass a
    stop_gradient'ed scene — this function does not detach its inputs.

    The recorder uses the HYBRID intersector (kernel winner search +
    _replay_winner completion) rather than the plain kernel wrapper: the
    two differ in root selection near the eps threshold (measured: one
    razor-edge lane per few hundred at toy scale takes a different root and
    diverges wholesale), and the recorded winners must be the ones the
    replay's _replay_winner arithmetic will reproduce — with the hybrid
    recorder, record/scan/replay primals agree bit-tight and the FD gates
    of test_grad.py hold unchanged through the dispatch.

    Scenes inside the megakernel's capacity record through the FUSED
    kernel instead (render_record_megakernel: one persistent launch per
    in-pixel sample, winner planes riding the loop carry) — the whole
    forward in config.spp kernel launches at megakernel speed rather than
    max_depth per-bounce XLA programs. Its sweep uses the same stable
    citardauq arithmetic and root selection as _replay_winner, so the
    recorded winners are the ones the replay reproduces (parity pinned by
    tests/test_grad_replay.py)."""
    from smallpt_tpu.engine.renderer import make_intersect_fn
    from smallpt_tpu.ops.megakernel import (MEGA_MAX_SPHERES,
                                            render_record_megakernel)

    if (
        scene.n_spheres <= MEGA_MAX_SPHERES
        and config.dtype == "float32"
        and jax.default_backend() in ("tpu", "cpu")
    ):
        img, winners, rays = render_record_megakernel(
            scene, camera, config, key
        )
        return img / config.spp, winners, rays

    sample_ids, org, dirs = _flat_rays(scene, camera, config, key)
    state = wavefront.initial_state(org, dirs, 1, jnp.dtype(config.dtype))
    isect = make_intersect_fn(scene, config, differentiable=True)

    def body(st, _):
        hit = isect(st.org, st.dir)
        winner = jnp.where(
            st.alive & hit.valid, hit.inst, jnp.int32(-1)
        )
        rays = jnp.sum(st.alive.astype(jnp.int32))
        st2 = wavefront.bounce_step(
            st, lambda o, d: hit, scene.material, config, key, sample_ids
        )
        return st2, (winner, rays)

    state, (winners, rays) = jax.lax.scan(
        body, state, None, length=config.max_depth
    )
    img = (
        state.radiance.reshape(config.n_pixels, config.spp, 3).sum(axis=1)
        / config.spp
    ).reshape(config.height, config.width, 3)
    return img, winners, jnp.sum(rays)


def _replay_hit_fn(scene, config: RenderConfig, winners_d):
    """Intersector that reconstructs the recorded winner for this depth.

    One-hot matmul gather (precision='highest' — the bf16 default mangles
    the 1e5-scale wall centers, the r4 c56fab0 trap) + the stable
    single-sphere replay. The winner CHOICE is already concrete (recorded);
    only t(center, radius), the hit point, and the normal carry gradients."""
    from smallpt_tpu.ops.intersect_pallas import _replay_winner

    def isect(org, dirs):
        ok = winners_d >= 0
        idx = jnp.maximum(winners_d, 0)
        S = scene.center.shape[0]
        oh = jax.nn.one_hot(idx, S, dtype=org.dtype)  # (L, S)
        cr = jnp.concatenate(
            [
                scene.center.astype(org.dtype),
                scene.radius.astype(org.dtype)[:, None],
            ],
            axis=1,
        )
        crw = jnp.matmul(oh, cr, precision="highest")
        c, r = crw[:, 0:3], crw[:, 3]
        t, x, nrm, _okr = _replay_winner(
            org, dirs, c, r, ok,
            config.intersect_eps, config.intersect_eps_rel,
        )
        return Hit(
            t=t,
            inst=idx,
            prim=idx,
            x=x,
            n=nrm,
            uv=jnp.zeros((org.shape[0], 2), org.dtype),
        )

    return isect


def replay_samples(scene, config: RenderConfig, key, sample_ids, org, dirs,
                   winners):
    """Differentiable per-sample radiance from recorded winners: the scan's
    xs are the per-depth winner planes; each bounce reconstructs its lane's
    winner hit in O(lanes) and shades through the SAME bounce_step as every
    other scheduler. diff_remat applies as in the scan path (the replay
    body's residuals are small enough to store at config-4 shapes —
    diff_remat False is the measured option here, unlike the hybrid body
    whose residuals OOM'd at 24.6 GB). This is the sharding-friendly core:
    callers shard the sample axis (parallel/replay_shard.py)."""
    state = wavefront.initial_state(org, dirs, 1, jnp.dtype(config.dtype))

    def body(st, winners_d):
        isect = _replay_hit_fn(scene, config, winners_d)
        return (
            wavefront.bounce_step(
                st, isect, scene.material, config, key, sample_ids
            ),
            None,
        )

    ckpt_body = jax.checkpoint(body) if config.diff_remat else body
    state, _ = jax.lax.scan(ckpt_body, state, winners)
    return state.radiance


def replay_mean(scene, camera, config: RenderConfig, key, winners):
    """Differentiable mean image from recorded winners (full frame)."""
    sample_ids, org, dirs = _flat_rays(scene, camera, config, key)
    rad = replay_samples(scene, config, key, sample_ids, org, dirs, winners)
    return (
        rad.reshape(config.n_pixels, config.spp, 3).sum(axis=1)
        / config.spp
    ).reshape(config.height, config.width, 3)


@functools.partial(jax.jit, static_argnames=("config",))
def image_loss_and_grads_replay(
    scene, camera, config: RenderConfig, key, target
):
    """L2 image loss + SceneParams gradients via recorded-winner replay.

    Same contract as grad/diff.py::image_loss_and_grads (which dispatches
    here when use_replay says the config is eligible). The reported loss
    and image come from the record pass; gradients from jax.grad of the
    replay loss at the same parameters (their primal agrees to FMA noise)."""
    from smallpt_tpu.grad.diff import merge_scene, split_scene

    params, refl = split_scene(scene)
    sg_scene = jax.lax.stop_gradient(scene)
    img, winners, _rays = record_forward(sg_scene, camera, config, key)
    loss = jnp.mean((img - target) ** 2)

    def replay_loss(p):
        rimg = replay_mean(
            merge_scene(p, refl), camera, config, key, winners
        )
        return jnp.mean((rimg - target) ** 2)

    grads = jax.grad(replay_loss)(params)
    return loss, img, grads
