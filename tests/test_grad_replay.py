"""Recorded-winner replay differentiator (grad/replay.py) gates.

The replay path must be a pure re-plumbing of the hybrid scan estimator:
same streams, same winner verdicts, same detached-argmin semantics — so its
loss/image/grads must match the scan path (diff_replay=False) up to the
established razor-edge FMA floor. test_grad.py's FD gates run against the
replay path automatically (PALLAS + diff_replay default True)."""

import numpy as np
import pytest
import jax.numpy as jnp

from smallpt_tpu.config import (CameraModel, Filter, Intersector,
                                RenderConfig)
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core.scene import cornell_box_scene
from smallpt_tpu.grad.diff import image_loss_and_grads, render_mean
from smallpt_tpu.grad.replay import use_replay

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


def test_routing():
    scene = cornell_box_scene()
    assert use_replay(scene, CFG)
    assert not use_replay(scene, CFG.replace(diff_replay=False))
    assert not use_replay(scene, CFG.replace(nee_lights=(8,)))
    assert not use_replay(scene, CFG.replace(split_budget=4))
    assert not use_replay(scene, CFG.replace(intersector=Intersector.JAX))


def test_replay_matches_scan_path(setup):
    """Replay vs the hybrid scan differentiator: identical estimator,
    different program structure — loss/image near-equal, grads equal to
    razor-edge rounding (the hybrid-vs-JAX floor of test_grad.py)."""
    scene, cam, key, target = setup
    cfg_scan = CFG.replace(diff_replay=False)
    loss_r, img_r, g_r = image_loss_and_grads(scene, cam, CFG, key, target)
    loss_s, img_s, g_s = image_loss_and_grads(
        scene, cam, cfg_scan, key, target
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
