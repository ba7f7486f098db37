"""Differentiable rendering: reverse-mode gradients of pixel radiance w.r.t.
scene parameters (sphere centers, radii, albedo, emission).

The reference has no differentiable pass; this is the capability named in
BASELINE.json's north star: "reverse-mode gradients of pixel radiance w.r.t.
sphere positions/radii/emission/albedo flow via detached-sampling
reparameterized path replay". Design:

- the wavefront runs as a fixed-length ``lax.scan`` (reverse-differentiable,
  unlike while_loop) over the same bounce math
- sampled continuation directions are ``stop_gradient``-ed
  (config.detach_sampling): gradients flow through throughput products,
  emission lookups, Fresnel weights, and hit geometry (t(center, radius) via
  the intersect quadratic), but not through the Monte-Carlo direction choice
- each bounce body is ``jax.checkpoint``-ed so the backward sweep
  rematerializes bounce state instead of storing every intermediate —
  the HBM-for-FLOPs trade that makes deep paths differentiable at scale
- visibility discontinuities (silhouettes, occlusion changes) are NOT
  differentiated — the documented bias envelope (SURVEY.md §7 hard part #3);
  tests compare against finite differences away from silhouettes

Gradients target the float leaves of SphereScene; the integer BSDF-tag table
is closed over.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from smallpt_tpu.config import RenderConfig
from smallpt_tpu.core.scene import SphereScene, Material
from smallpt_tpu.engine.renderer import render


class SceneParams(NamedTuple):
    """The differentiable subset of SphereScene."""

    center: jnp.ndarray
    radius: jnp.ndarray
    emission: jnp.ndarray
    albedo: jnp.ndarray


def split_scene(scene: SphereScene):
    params = SceneParams(
        scene.center, scene.radius, scene.material.emission, scene.material.albedo
    )
    return params, scene.material.refl


def merge_scene(params: SceneParams, refl) -> SphereScene:
    return SphereScene(
        center=params.center,
        radius=params.radius,
        material=Material(
            emission=params.emission, albedo=params.albedo, refl=refl
        ),
    )


@functools.partial(jax.jit, static_argnames=("config",))
def render_mean(scene: SphereScene, camera, config: RenderConfig, key) -> jnp.ndarray:
    """Differentiable mean image (H,W,3): render / spp, scan-based loop."""
    return render(scene, camera, config, key, differentiable=True) / config.spp


@functools.partial(jax.jit, static_argnames=("config",))
def image_loss_and_grads(
    scene: SphereScene, camera, config: RenderConfig, key, target: jnp.ndarray
):
    """L2 image loss against `target` plus gradients w.r.t. SceneParams.

    Returns (loss, image, grads: SceneParams).

    Eligible configs (use_replay) route through the recorded-winner replay
    differentiator (grad/replay.py): fast non-diff forward records the
    per-bounce winner ids, gradients come from a search-free replay scan.
    Everything else (NEE, splits, pure-JAX intersector, meshes)
    differentiates the scan directly."""
    from smallpt_tpu.grad.replay import image_loss_and_grads_replay, use_replay

    if use_replay(scene, config):
        return image_loss_and_grads_replay(scene, camera, config, key, target)

    params, refl = split_scene(scene)

    def loss_fn(p: SceneParams):
        img = render_mean(merge_scene(p, refl), camera, config, key)
        return jnp.mean((img - target) ** 2), img

    (loss, img), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return loss, img, grads


def project_params(params: SceneParams) -> SceneParams:
    """Keep parameters physical: albedo in [0, 0.999] (RR survival p = max
    albedo must stay < 1, smallpt.cpp:191-192), emission >= 0, radius > 0."""
    return SceneParams(
        center=params.center,
        radius=jnp.maximum(params.radius, 1e-2),
        emission=jnp.maximum(params.emission, 0.0),
        albedo=jnp.clip(params.albedo, 0.0, 0.999),
    )


def sgd_train_step(
    scene: SphereScene, camera, config: RenderConfig, key, target,
    lr: float | SceneParams = 1e-2,
):
    """One inverse-rendering step: render, L2 loss vs target, projected SGD
    update of scene parameters. The flagship 'training step' of the framework
    (used by __graft_entry__.dryrun_multichip and the optimization demo).

    lr: scalar, or a SceneParams of per-group rates — geometry gradients are
    orders of magnitude smaller than albedo/emission gradients (a sphere's
    Fresnel-smooth response covers few pixels), so joint recovery needs
    per-group scaling."""
    loss, img, grads = image_loss_and_grads(scene, camera, config, key, target)
    params, refl = split_scene(scene)
    if isinstance(lr, SceneParams):
        new_params = jax.tree.map(lambda p, g, l: p - l * g, params, grads, lr)
    else:
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return merge_scene(project_params(new_params), refl), loss, img


def adam_optimizer(scene: SphereScene, lr: float = 1e-2):
    """Optax Adam over the scene's float leaves (optional dependency)."""
    import optax

    params, refl = split_scene(scene)
    opt = optax.adam(lr)
    state = opt.init(params)

    def step(scene, camera, config, key, target, state):
        loss, img, grads = image_loss_and_grads(scene, camera, config, key, target)
        params, refl = split_scene(scene)
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        # keep iterates physical (same projection as the SGD path — albedo
        # drifting past 1 breaks RR survival, negative radius breaks hits)
        return merge_scene(project_params(params), refl), state, loss, img

    return step, state
