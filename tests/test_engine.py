"""Engine-level tests: progressive accumulation, command queue, checkpoint/
resume, AOV modes, mesh-scene rendering, placement invariance, image IO."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smallpt_tpu.config import RenderConfig, Mode, Filter, CameraModel
from smallpt_tpu.core.scene import (
    cornell_box_scene,
    single_triangle_scene,
)
from smallpt_tpu.core.camera import (
    smallpt_camera,
    default_matrix_camera,
    sample_indices,
)
from smallpt_tpu.core import rng as prng
from smallpt_tpu.engine.renderer import render, render_samples, render_image
from smallpt_tpu.engine.progressive import ProgressiveRenderer
from smallpt_tpu.utils import image as img_io


CFG = RenderConfig(width=8, height=8, spp_per_cell=1, max_depth=8,
                   camera_model=CameraModel.LEGACY, filter=Filter.TENT)


def test_progressive_accumulation_matches_passes():
    """step() accumulation = sum of independent render passes; display image
    = accum / (N*spp) (smallpt.cpp:922-926,957)."""
    scene, cam = cornell_box_scene(), smallpt_camera()
    r = ProgressiveRenderer(scene, cam, CFG, seed=0)
    r.step(3)
    base = prng.base_key(0)
    manual = sum(
        np.asarray(render(scene, cam, CFG, jax.random.fold_in(base, p)))
        for p in range(3)
    )
    np.testing.assert_allclose(np.asarray(r.accum), manual, rtol=1e-6)
    np.testing.assert_allclose(r.image, manual / (3 * CFG.spp), rtol=1e-6)


def test_command_queue_camera_update_resets_accum():
    """The JSON render-request protocol (smallpt.cpp:906-920,978-985):
    update_camera clears accumulation and restarts the progressive count."""
    scene, cam = cornell_box_scene(), smallpt_camera()
    r = ProgressiveRenderer(scene, cam, CFG, seed=0)
    r.step(2)
    assert r.sample_count == 2
    r.enqueue('{"action": "update_camera", "org": [50.0, 52.0, 290.0]}')
    r.step()
    assert r.sample_count == 1
    np.testing.assert_allclose(
        np.asarray(r.camera.origin), [50.0, 52.0, 290.0]
    )


def test_checkpoint_resume(tmp_path):
    scene, cam = cornell_box_scene(), smallpt_camera()
    r1 = ProgressiveRenderer(scene, cam, CFG, seed=5)
    r1.step(2)
    ck = str(tmp_path / "state.npz")
    r1.save_checkpoint(ck)
    r1.step(2)

    r2 = ProgressiveRenderer(scene, cam, CFG, seed=5)
    r2.load_checkpoint(ck)
    assert r2.sample_count == 2
    r2.step(2)
    np.testing.assert_allclose(np.asarray(r1.accum), np.asarray(r2.accum), rtol=1e-6)


def test_aov_modes_smoke():
    scene, cam = cornell_box_scene(), smallpt_camera()
    for mode in (Mode.UV, Mode.INST_ID, Mode.EMISSION):
        cfg = CFG.replace(mode=mode)
        img = np.asarray(render(scene, cam, cfg, prng.base_key(0)))
        assert np.isfinite(img).all(), mode


def test_single_triangle_scene_normal_aov():
    """The reference main() pipeline (smallpt.cpp:818-838 + 840-1005): matrix
    camera, box filter, mesh scene, normals AOV with unflipped normals. The
    triangle's debug vertex normals are the axis vectors, so the interpolated
    normal equals the barycentric coords and channels sum to 1 per hit."""
    cfg = RenderConfig(
        width=16, height=16, spp_per_cell=1, mode=Mode.NORMAL,
        flip_normals=False, camera_model=CameraModel.MATRIX, filter=Filter.BOX,
    )
    scene = single_triangle_scene()
    cam = default_matrix_camera()
    img = np.asarray(render(scene, cam, cfg, prng.base_key(0))) / cfg.spp
    hit_mask = img.sum(-1) > 1e-6
    assert hit_mask.any(), "triangle not visible"
    sums = img.sum(-1)[hit_mask]
    # each sample contributes (w,u,v) which sums to 1; pixel may mix hit and
    # miss samples so sums lie in (0, 1]
    assert (sums <= 1.0 + 1e-4).all()


def test_placement_invariance_batch_split():
    """Rendering the sample batch in two halves gives bit-identical radiance
    to rendering it whole — the keying is coordinate-based, not
    iteration-based (SURVEY.md §7 hard part #4)."""
    scene, cam = cornell_box_scene(), smallpt_camera()
    cfg = CFG
    key = prng.base_key(0)
    sids, pixel, col, row, cx, cy = sample_indices(cfg, cfg.n_pixels)
    full = np.asarray(render_samples(scene, cam, cfg, key, sids, col, row, cx, cy))
    h = sids.shape[0] // 2
    a = np.asarray(render_samples(scene, cam, cfg, key, sids[:h], col[:h], row[:h], cx[:h], cy[:h]))
    b = np.asarray(render_samples(scene, cam, cfg, key, sids[h:], col[h:], row[h:], cx[h:], cy[h:]))
    np.testing.assert_array_equal(full, np.concatenate([a, b]))


def test_render_image_normalization():
    scene, cam = cornell_box_scene(), smallpt_camera()
    img = np.asarray(render_image(scene, cam, CFG, seed=0, n_passes=2))
    assert img.shape == (8, 8, 3)
    assert np.isfinite(img).all()


def test_ppm_roundtrip(tmp_path):
    img = np.random.default_rng(0).uniform(0, 1, (6, 5, 3)).astype(np.float32)
    p3 = str(tmp_path / "a.ppm")
    img_io.write_ppm(p3, img, flip=True)
    back = img_io.read_ppm(p3)
    np.testing.assert_array_equal(back, img_io.to_int(img_io.flip_y(img)))
    p6 = str(tmp_path / "a.p6.ppm")
    img_io.write_ppm_binary(p6, img, flip=True)
    back6 = img_io.read_ppm(p6)
    np.testing.assert_array_equal(back6, back)


def test_png_writer(tmp_path):
    img = np.random.default_rng(0).uniform(0, 1, (4, 4, 3)).astype(np.float32)
    p = str(tmp_path / "a.png")
    img_io.write_png(p, img)
    with open(p, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_writers_accept_tonemapped_uint8(tmp_path):
    """An integer array is treated as ALREADY tone-mapped: passing to_int
    output must not gamma-map twice (the double-map clamps everything to
    white — regression for an example bug)."""
    img = np.random.default_rng(1).uniform(0, 1, (6, 5, 3)).astype(np.float32)
    mapped = img_io.to_int(img)
    pa, pb = str(tmp_path / "lin.ppm"), str(tmp_path / "mapped.ppm")
    img_io.write_ppm(pa, img, flip=False)
    img_io.write_ppm(pb, mapped, flip=False)
    np.testing.assert_array_equal(img_io.read_ppm(pa), img_io.read_ppm(pb))
    img_io.write_ppm_binary(pb, mapped, flip=True)
    np.testing.assert_array_equal(
        img_io.read_ppm(pb), img_io.to_int(img_io.flip_y(img))
    )


def test_cli_end_to_end(tmp_path):
    from smallpt_tpu.cli import main

    out = str(tmp_path / "image.ppm")
    rc = main(["4", "--scene", "cornell", "--width", "8", "--height", "8",
               "--max-depth", "8", "--out", out, "--quiet"])
    assert rc == 0
    assert img_io.read_ppm(out).shape == (8, 8, 3)
