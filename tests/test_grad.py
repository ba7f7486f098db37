"""Differentiable-pass tests (BASELINE.json config 4): reverse-mode scene
gradients vs central finite differences.

FD comparisons need care: Russian roulette decisions flip discretely when
albedo moves (p = max albedo), and silhouettes make center/radius FD noisy.
So: max_depth <= rr_depth (no RR), fixed RNG key (the render is then a
deterministic, almost-everywhere-smooth function of the parameters), and
geometry tests use view rays well inside the silhouette."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smallpt_tpu.config import RenderConfig, Filter, CameraModel, Scheduler
from smallpt_tpu.core.scene import (
    make_sphere_scene,
    cornell_box_scene,
    DIFF,
    SPEC,
    REFR,
)
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core import rng as prng
from smallpt_tpu.grad.diff import (
    render_mean,
    image_loss_and_grads,
    sgd_train_step,
    split_scene,
    merge_scene,
)

CFG = RenderConfig(
    width=12, height=12, spp_per_cell=1, max_depth=4,
    camera_model=CameraModel.LEGACY, filter=Filter.TENT,
)


def _fd_loss(scene, camera, cfg, key, target, param_path, idx, h):
    """Central finite difference of the L2 loss along one scalar param."""
    def loss_at(delta):
        params, refl = split_scene(scene)
        leaf = getattr(params, param_path)
        leaf = leaf.at[idx].add(delta)
        s = merge_scene(params._replace(**{param_path: leaf}), refl)
        img = render_mean(s, camera, cfg, key)
        return float(jnp.mean((img - target) ** 2))

    return (loss_at(h) - loss_at(-h)) / (2 * h)


@pytest.fixture(scope="module")
def setup():
    scene = cornell_box_scene()
    cam = smallpt_camera()
    key = prng.base_key(0)
    target = render_mean(scene, cam, CFG, prng.base_key(99))
    return scene, cam, key, target


def test_albedo_gradient_matches_fd(setup):
    scene, cam, key, target = setup
    loss, img, grads = image_loss_and_grads(scene, cam, CFG, key, target)
    assert np.isfinite(float(loss))
    for idx in [(0, 0), (2, 1)]:  # left wall R, back wall G
        fd = _fd_loss(scene, cam, CFG, key, target, "albedo", idx, 1e-3)
        an = float(grads.albedo[idx])
        assert abs(an - fd) < 5e-3 * max(1.0, abs(fd)) + 1e-4, (idx, an, fd)


def test_emission_gradient_matches_fd(setup):
    scene, cam, key, target = setup
    _, _, grads = image_loss_and_grads(scene, cam, CFG, key, target)
    idx = (8, 0)  # light red emission
    fd = _fd_loss(scene, cam, CFG, key, target, "emission", idx, 1e-3)
    an = float(grads.emission[idx])
    assert abs(an - fd) < 5e-3 * max(1.0, abs(fd)) + 1e-5, (an, fd)


def test_center_gradient_direction():
    """Geometry grads: a diffuse sphere under a big light; moving the sphere
    toward/away from camera changes shading smoothly inside the silhouette.
    Analytic grad should match FD within a few percent (bias envelope:
    silhouette pixels are excluded by construction at this size)."""
    scene = make_sphere_scene(
        [
            (10.0, (50, 40.8, 81.6), (0, 0, 0), (0.75, 0.25, 0.25), DIFF),
            (600.0, (50, 681.33, 81.6), (1, 1, 1), (0, 0, 0), DIFF),
        ]
    )
    cam = smallpt_camera()
    cfg = CFG.replace(width=8, height=8, max_depth=3)
    key = prng.base_key(1)
    target = jnp.zeros((8, 8, 3))
    _, _, grads = image_loss_and_grads(scene, cam, cfg, key, target)
    for axis in range(3):
        fd = _fd_loss(scene, cam, cfg, key, target, "center", (0, axis), 5e-3)
        an = float(grads.center[0, axis])
        # geometry grads: detached-sampling bias + f32 → loose tolerance
        assert abs(an - fd) < 0.15 * max(0.05, abs(fd)), (axis, an, fd)


def test_glass_center_gradient_matches_fd():
    """Specular transport gradients: the glass ball's position enters the
    loss smoothly through Fresnel Re/Tr and the refraction direction, both
    of which must stay differentiable under detached sampling (only the
    stochastic cosine sample is detached). Regression for the bug where
    stop_gradient on the merged direction zeroed ALL specular geometry
    gradients."""
    cfg = RenderConfig(width=24, height=24, spp_per_cell=1, max_depth=6,
                       camera_model=CameraModel.LEGACY, filter=Filter.TENT)
    scene = cornell_box_scene()
    cam = smallpt_camera()
    key = prng.base_key(0)
    target = render_mean(scene, cam, cfg, key)
    params, refl = split_scene(scene)
    wrong = params._replace(
        center=params.center.at[7].add(jnp.asarray([1.5, 1.0, -1.5]))
    )
    moved = merge_scene(wrong, refl)
    _, _, grads = image_loss_and_grads(scene, cam, cfg, key, target)
    _, _, g = image_loss_and_grads(moved, cam, cfg, key, target)
    an = float(g.center[7, 0])
    assert an != 0.0
    fd = _fd_loss(moved, cam, cfg, key, target, "center", (7, 0), 1e-2)
    assert abs(an - fd) < 0.05 * max(1e-4, abs(fd)), (an, fd)


def test_radius_gradient_finite(setup):
    scene, cam, key, target = setup
    _, _, grads = image_loss_and_grads(scene, cam, CFG, key, target)
    assert np.isfinite(np.asarray(grads.radius)).all()
    assert np.isfinite(np.asarray(grads.center)).all()


def test_inverse_rendering_converges():
    """End-to-end: recover a perturbed albedo by gradient descent — the
    flagship training loop."""
    cfg = CFG.replace(width=8, height=8, max_depth=4)
    cam = smallpt_camera()
    true_scene = cornell_box_scene()
    key = prng.base_key(0)
    target = render_mean(true_scene, cam, cfg, key)

    params, refl = split_scene(true_scene)
    wrong = params._replace(albedo=params.albedo.at[0].set(jnp.asarray([0.3, 0.6, 0.6])))
    scene = merge_scene(wrong, refl)

    losses = []
    for i in range(60):
        scene, loss, _ = sgd_train_step(scene, cam, cfg, key, target, lr=1.0)
        losses.append(float(loss))
    # At 8x8/4spp a single razor-edge path can flip discretely as params move
    # (the undifferentiated-visibility bias envelope, SURVEY.md §7 hard part
    # #3), adding an O(0.03) square-wave on top of the smooth descent — judge
    # convergence by the best loss reached plus parameter recovery below, not
    # the (possibly flipped) last loss.
    assert min(losses) < 0.1 * losses[0], losses[::10]
    assert min(losses[30:]) < min(losses[:10]), losses[::10]
    # recovered albedo should move toward the truth
    err0 = np.abs(np.asarray(wrong.albedo[0]) - np.asarray(params.albedo[0])).mean()
    err1 = np.abs(np.asarray(scene.material.albedo[0]) - np.asarray(params.albedo[0])).mean()
    assert err1 < 0.5 * err0, (err0, err1)


def test_hybrid_pallas_gradients_match_jax_path(setup):
    """The hybrid diff intersector (Pallas winner search + per-lane
    differentiable replay, intersect_spheres_hybrid_diff) must reproduce
    the pure-JAX path's gradients: same detached-argmin estimator, same
    stable hit arithmetic — differences limited to razor-edge rounding."""
    from smallpt_tpu.config import Intersector

    scene, cam, key, target = setup
    # diff_replay=False: this test pins the HYBRID SCAN differentiator
    # specifically; the recorded-winner replay path (the PALLAS default)
    # has its own parity + FD gates in test_grad_replay.py
    cfg_h = CFG.replace(intersector=Intersector.PALLAS, diff_replay=False)
    _, img_j, g_j = image_loss_and_grads(scene, cam, CFG, key, target)
    _, img_h, g_h = image_loss_and_grads(scene, cam, cfg_h, key, target)
    # forward images agree (same streams, same winner verdicts)
    assert np.allclose(np.asarray(img_j), np.asarray(img_h),
                       rtol=5e-3, atol=5e-3)
    for name in ("albedo", "emission"):
        a = np.asarray(getattr(g_j, name))
        b = np.asarray(getattr(g_h, name))
        assert np.allclose(a, b, rtol=0.05, atol=1e-5 + 0.02 * np.abs(a).max()), name


def test_hybrid_pallas_albedo_gradient_matches_fd(setup):
    """FD check directly against the hybrid path (not just cross-path)."""
    from smallpt_tpu.config import Intersector

    scene, cam, key, target = setup
    cfg_h = CFG.replace(intersector=Intersector.PALLAS, diff_replay=False)
    _, _, grads = image_loss_and_grads(scene, cam, cfg_h, key, target)
    idx = (0, 0)
    fd = _fd_loss(scene, cam, cfg_h, key, target, "albedo", idx, 1e-3)
    an = float(grads.albedo[idx])
    assert abs(an - fd) < 5e-3 * max(1.0, abs(fd)) + 1e-4, (an, fd)


def test_mesh_material_gradients_match_fd():
    """Mesh-scene MATERIAL gradients come free through the pure-JAX FLAT
    path (the reference has no differentiability anywhere): reverse-mode
    d(loss)/d(albedo, emission) vs central finite differences. Geometry
    (vertex) gradients carry the same visibility-discontinuity caveat as
    sphere positions and are not pinned here."""
    import jax

    from smallpt_tpu.core.scene import procedural_mesh_scene
    from smallpt_tpu.engine.renderer import render

    cfg = RenderConfig(width=10, height=8, spp_per_cell=1, max_depth=5,
                       camera_model=CameraModel.LEGACY, filter=Filter.TENT,
                       scheduler=Scheduler.FLAT)
    scene = procedural_mesh_scene(n_balls=2, subdiv_longitude=3, seed=1)
    key = prng.base_key(0)

    def loss(albedo, emission):
        s = scene._replace(material=scene.material._replace(
            albedo=albedo, emission=emission))
        img = render(s, smallpt_camera(), cfg, key, differentiable=True)
        return jnp.mean(img ** 2)

    a0, e0 = scene.material.albedo, scene.material.emission
    ga, ge = jax.grad(loss, argnums=(0, 1))(a0, e0)
    d = 1e-3
    for arr, g, idx in (
        (a0, ga, (4, 0)),   # floor albedo red
        (e0, ge, (6, 1)),   # light emission green
    ):
        bump = jnp.zeros_like(arr).at[idx].set(d)
        if arr is a0:
            fd = (loss(a0 + bump, e0) - loss(a0 - bump, e0)) / (2 * d)
        else:
            fd = (loss(a0, e0 + bump) - loss(a0, e0 - bump)) / (2 * d)
        an = float(g[idx])
        assert abs(an - float(fd)) < 5e-3 * max(abs(float(fd)), 1e-4), (
            idx, an, float(fd))
