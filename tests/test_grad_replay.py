"""Recorded-winner replay differentiator (grad/replay.py) gates.

Correctness anchor: the analytic gradients must be finite differences of
THEIR OWN primal — the record pass's image (megakernel recorder for scenes
inside its capacity, hybrid-scan recorder above it). Cross-path agreement
with the scan differentiator is gated statistically: the mega sweep and the
hybrid's fast search kernel can pick different roots on razor-edge lanes
(the documented mega-vs-JAX parity floor), and a single divergent path
shifts a toy image's aggregate loss by percents while both estimators stay
valid."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smallpt_tpu.config import (CameraModel, Filter, Intersector,
                                RenderConfig)
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core.scene import cornell_box_scene
from smallpt_tpu.grad.diff import (image_loss_and_grads, merge_scene,
                                   render_mean, split_scene)
from smallpt_tpu.grad.replay import record_forward, replay_mean, use_replay

CFG = RenderConfig(
    width=12, height=12, spp_per_cell=1, max_depth=4,
    camera_model=CameraModel.LEGACY, filter=Filter.TENT,
    intersector=Intersector.PALLAS,
)


@pytest.fixture(scope="module")
def setup():
    scene = cornell_box_scene()
    cam = smallpt_camera()
    key = prng.base_key(0)
    target = render_mean(scene, cam, CFG, prng.base_key(99))
    return scene, cam, key, target


def _fd_record_loss(scene, camera, cfg, key, target, param_path, idx, h):
    """Central finite difference of the REPLAY surface's own loss (the
    record pass's image) along one scalar parameter."""
    def loss_at(delta):
        params, refl = split_scene(scene)
        leaf = getattr(params, param_path)
        leaf = leaf.at[idx].add(delta)
        s = merge_scene(params._replace(**{param_path: leaf}), refl)
        img, _w, _r = record_forward(s, camera, cfg, key)
        return float(jnp.mean((img - target) ** 2))

    return (loss_at(h) - loss_at(-h)) / (2 * h)


def test_routing():
    scene = cornell_box_scene()
    assert use_replay(scene, CFG)
    assert not use_replay(scene, CFG.replace(diff_replay=False))
    assert not use_replay(scene, CFG.replace(nee_lights=(8,)))
    assert not use_replay(scene, CFG.replace(split_budget=4))
    assert not use_replay(scene, CFG.replace(intersector=Intersector.JAX))


def test_replay_reproduces_record_bitwise(setup):
    """The gradient's primal (replay scan) must reproduce the recorded
    forward exactly: same winners, same stable arithmetic — interpret-mode
    CPU runs agree to the last bit (hardware may add FMA-contraction noise,
    CLAUDE.md)."""
    scene, cam, key, _ = setup
    img_rec, winners, rays = record_forward(scene, cam, CFG, key)
    img_rep = jax.jit(replay_mean, static_argnames=("config",))(
        scene, cam, CFG, key, winners
    )
    assert float(rays) > 0
    np.testing.assert_allclose(
        np.asarray(img_rep), np.asarray(img_rec), rtol=0, atol=1e-6
    )


def test_albedo_emission_gradients_match_fd(setup):
    """FD of the replay surface's own loss vs its analytic gradients —
    the same tolerance discipline as test_grad.py's gates."""
    scene, cam, key, target = setup
    loss, img, grads = image_loss_and_grads(scene, cam, CFG, key, target)
    assert np.isfinite(float(loss))
    for path, idx, tol in [
        ("albedo", (0, 0), 1e-4),
        ("albedo", (2, 1), 1e-4),
        ("emission", (8, 0), 1e-5),
    ]:
        fd = _fd_record_loss(scene, cam, CFG, key, target, path, idx, 1e-3)
        an = float(getattr(grads, path)[idx])
        assert abs(an - fd) < 5e-3 * max(1.0, abs(fd)) + tol, (path, idx, an, fd)


def test_geometry_gradients_match_scan_tight(setup):
    """Geometry (center/radius) gradients vs the scan path: these flow
    only through the shared _replay_winner/Fresnel arithmetic, which both
    differentiators evaluate identically — measured bit-identical on CPU
    even when a razor-edge lane flips the albedo/emission sums. (FD checks
    of glass-center gradients live in test_grad.py with a dedicated
    inside-silhouette scene; at 12x12 Cornell an FD step is dominated by
    silhouette flips the estimator deliberately does not differentiate.)"""
    scene, cam, key, target = setup
    _, _, g_r = image_loss_and_grads(scene, cam, CFG, key, target)
    _, _, g_s = image_loss_and_grads(
        scene, cam, CFG.replace(diff_replay=False), key, target
    )
    for name in ("center", "radius"):
        a = np.asarray(getattr(g_s, name))
        b = np.asarray(getattr(g_r, name))
        assert np.allclose(
            a, b, rtol=1e-3, atol=1e-8 + 1e-3 * np.abs(a).max()
        ), name


def test_replay_matches_scan_path_statistically(setup):
    """Cross-path gate vs the hybrid scan differentiator: identical
    transport, razor-edge winner flips allowed (mega-vs-hybrid root
    selection differs on grazing lanes — at 12x12 that is at most a pixel
    or two). Images: >= 98% of pixels tight; grads: strong directional
    agreement."""
    scene, cam, key, target = setup
    cfg_scan = CFG.replace(diff_replay=False)
    loss_r, img_r, g_r = image_loss_and_grads(scene, cam, CFG, key, target)
    loss_s, img_s, g_s = image_loss_and_grads(
        scene, cam, cfg_scan, key, target
    )
    assert abs(float(loss_r) - float(loss_s)) < 0.1 * float(loss_s)
    d = np.abs(np.asarray(img_r) - np.asarray(img_s)).max(axis=-1)
    assert (d < 5e-3).mean() >= 0.98, (d > 5e-3).sum()
    for name in ("albedo", "emission", "center", "radius"):
        a = np.asarray(getattr(g_s, name)).ravel()
        b = np.asarray(getattr(g_r, name)).ravel()
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        if denom > 0:
            cos = float(np.dot(a, b) / denom)
            assert cos > 0.95, (name, cos)


def test_replay_noremat_matches(setup):
    """diff_remat=False on the replay scan (store the small replay
    residuals, pure-VJP backward — the measured config-4 option) is a
    backward-structure change only: grads must be identical-ish."""
    scene, cam, key, target = setup
    _, _, g_a = image_loss_and_grads(scene, cam, CFG, key, target)
    _, _, g_b = image_loss_and_grads(
        scene, cam, CFG.replace(diff_remat=False), key, target
    )
    for name in ("albedo", "emission", "center", "radius"):
        a = np.asarray(getattr(g_a, name))
        b = np.asarray(getattr(g_b, name))
        assert np.allclose(
            a, b, rtol=1e-4, atol=1e-7 + 1e-4 * np.abs(a).max()
        ), name


def test_fallback_recorder_above_mega_capacity(setup, monkeypatch):
    """Scenes above the megakernel sphere cap record through the
    hybrid-scan recorder; force that branch (capacity patched down, fresh
    config shape so the jit cache can't serve the mega trace) and pin it
    against the scan differentiator — the hybrid recorder shares the scan
    path's exact hit semantics, so the match is tight."""
    from smallpt_tpu.ops import megakernel as mk

    monkeypatch.setattr(mk, "MEGA_MAX_SPHERES", 4)
    scene, cam, key, _ = setup
    cfg = CFG.replace(width=14, height=10)
    target = render_mean(scene, cam, cfg, prng.base_key(99))
    loss_r, img_r, g_r = image_loss_and_grads(scene, cam, cfg, key, target)
    loss_s, img_s, g_s = image_loss_and_grads(
        scene, cam, cfg.replace(diff_replay=False), key, target
    )
    assert np.allclose(float(loss_r), float(loss_s), rtol=1e-3)
    assert np.allclose(np.asarray(img_r), np.asarray(img_s),
                       rtol=5e-3, atol=5e-3)
    for name in ("albedo", "emission", "center", "radius"):
        a = np.asarray(getattr(g_s, name))
        b = np.asarray(getattr(g_r, name))
        assert np.allclose(
            a, b, rtol=0.05, atol=1e-5 + 0.02 * np.abs(a).max()
        ), name


def test_replay_finite_and_nonzero(setup):
    scene, cam, key, target = setup
    loss, img, grads = image_loss_and_grads(scene, cam, CFG, key, target)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(img)).all()
    for name in ("albedo", "emission", "center", "radius"):
        g = np.asarray(getattr(grads, name))
        assert np.isfinite(g).all(), name
    assert np.abs(np.asarray(grads.albedo)).max() > 0
    assert np.abs(np.asarray(grads.emission)).max() > 0
