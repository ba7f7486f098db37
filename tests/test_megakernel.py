"""Fused Pallas bounce megakernel vs the pure-JAX regenerative scheduler.

Cross-backend testing in the reference's style (two independent
implementations of one contract must agree, SURVEY.md §4): the megakernel
shares the REGEN scheduler's sample streams bit-for-bit (PCG4D keying,
core/rng.py), so images agree except where f32 op-ordering flips razor-edge
paths. On the CPU test platform the kernel runs in the Pallas interpreter.
"""

import numpy as np
import pytest
import jax

from smallpt_tpu.config import RenderConfig, Filter, CameraModel, Scheduler
from smallpt_tpu.core.scene import cornell_box_scene, two_sphere_scene
from smallpt_tpu.core.camera import smallpt_camera, default_matrix_camera
from smallpt_tpu.core import rng as prng
from smallpt_tpu.engine.renderer import render_with_stats
from smallpt_tpu.ops.megakernel import render_pass_megakernel


def _compare(cfg, scene, cam, key, frac=0.02):
    regen = cfg.replace(scheduler=Scheduler.REGEN)
    ref, rays_ref = render_with_stats(scene, cam, regen, key)
    img, rays = render_pass_megakernel(scene, cam, cfg, key)
    ref, img = np.asarray(ref), np.asarray(img)
    assert np.isfinite(img).all()
    # same schedule => same ray count up to razor-edge flips
    assert abs(int(rays) - int(rays_ref)) <= max(64, 0.001 * int(rays_ref))
    rel = np.abs(ref - img) / (1.0 + np.abs(ref))
    assert (rel > 0.1).mean() <= frac, f"{(rel > 0.1).mean():.4f} diverge"
    assert abs(img.mean() - ref.mean()) < 0.05 * (abs(ref.mean()) + 0.1)


def test_cornell_matches_regen():
    cfg = RenderConfig(width=24, height=16, spp_per_cell=1, max_depth=10,
                       camera_model=CameraModel.LEGACY, filter=Filter.TENT)
    _compare(cfg, cornell_box_scene(), smallpt_camera(), prng.base_key(0))


def test_two_sphere_box_filter_matrix_camera():
    cfg = RenderConfig(width=16, height=16, spp_per_cell=1, max_depth=6,
                       camera_model=CameraModel.MATRIX, filter=Filter.BOX)
    _compare(cfg, two_sphere_scene(), default_matrix_camera(), prng.base_key(2))


def test_row_band_equals_full_frame_slice():
    """Sharding hook: rendering a row band with row_offset/n_rows must equal
    the same rows of the full-frame render (placement invariance of the
    keying, SURVEY.md §7 hard part #4)."""
    cfg = RenderConfig(width=16, height=12, spp_per_cell=1, max_depth=8,
                       camera_model=CameraModel.LEGACY, filter=Filter.TENT)
    scene, cam, key = cornell_box_scene(), smallpt_camera(), prng.base_key(5)
    full, _ = render_pass_megakernel(scene, cam, cfg, key)
    band, _ = render_pass_megakernel(scene, cam, cfg, key,
                                     row_offset=6, n_rows=6)
    np.testing.assert_array_equal(np.asarray(full)[6:], np.asarray(band))


def test_sample_slices_sum_to_full():
    """ip_offset/k_samples splits of the in-pixel sample axis must sum to the
    full pass (the 'sample' mesh axis contract)."""
    cfg = RenderConfig(width=12, height=8, spp_per_cell=1, max_depth=8,
                       camera_model=CameraModel.LEGACY, filter=Filter.TENT)
    scene, cam, key = cornell_box_scene(), smallpt_camera(), prng.base_key(9)
    full, rays_full = render_pass_megakernel(scene, cam, cfg, key)
    a, ra = render_pass_megakernel(scene, cam, cfg, key, ip_offset=0, k_samples=2)
    b, rb = render_pass_megakernel(scene, cam, cfg, key, ip_offset=2, k_samples=2)
    np.testing.assert_allclose(np.asarray(a) + np.asarray(b),
                               np.asarray(full), rtol=1e-5, atol=1e-5)
    assert int(ra) + int(rb) == int(rays_full)


def test_reproducible_and_key_sensitive():
    cfg = RenderConfig(width=8, height=8, spp_per_cell=1, max_depth=6,
                       camera_model=CameraModel.LEGACY, filter=Filter.TENT)
    scene, cam = cornell_box_scene(), smallpt_camera()
    a, _ = render_pass_megakernel(scene, cam, cfg, prng.base_key(3))
    b, _ = render_pass_megakernel(scene, cam, cfg, prng.base_key(3))
    c, _ = render_pass_megakernel(scene, cam, cfg, prng.base_key(4))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_rejects_unsupported_configs():
    cfg = RenderConfig(width=8, height=8, split_budget=2)
    with pytest.raises(ValueError):
        render_pass_megakernel(cornell_box_scene(), smallpt_camera(), cfg,
                               prng.base_key(0))
