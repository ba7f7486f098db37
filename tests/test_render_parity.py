"""End-to-end parity: the TPU wavefront renderer vs the NumPy f64 oracle.

Because both implementations consume identical per-decision uniform streams
(keyed by sample/history/depth, core/rng.py), they follow the same decision
tree path-for-path; residual differences are f32-vs-f64 geometry noise plus a
small population of genuinely ambiguous paths (smallpt's light sphere bottom
sits 0.27 units below the ceiling wall — hits near that rim can flip
surfaces). Thresholds below reflect measured behavior with margin."""

import numpy as np
import pytest

import jax

from smallpt_tpu.config import RenderConfig, Mode, Filter, CameraModel
from smallpt_tpu.core.scene import cornell_box_scene, two_sphere_scene
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core import rng as prng
from smallpt_tpu.engine.renderer import render
from smallpt_tpu.oracle.numpy_oracle import Oracle, PrecomputedUniformProvider


def _compare(cfg, scene, cam, key, max_frac_div=0.02, mean_tol=0.2):
    img = np.asarray(render(scene, cam, cfg, key))
    oracle = Oracle(scene, cam, cfg, PrecomputedUniformProvider(key, cfg.n_pixels * cfg.spp))
    oimg = oracle.render()
    diff = np.abs(img - oimg)
    rel = diff / (1.0 + np.abs(oimg))
    assert np.isfinite(img).all()
    assert (rel > 0.1).mean() <= max_frac_div, (
        f"{(rel > 0.1).mean():.4f} of values diverge >10%"
    )
    assert diff.mean() < mean_tol, f"mean abs diff {diff.mean():.4f}"
    assert abs(img.mean() - oimg.mean()) < 0.15 * (abs(oimg.mean()) + 0.1)
    return img, oimg


def test_cornell_full_transport_parity():
    """BASELINE.json config 1 analog: smallpt Cornell box, legacy camera,
    tent filter, full BSDF set, RR at depth>5, no splitting."""
    cfg = RenderConfig(
        width=16, height=16, spp_per_cell=1,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT, max_depth=16,
    )
    _compare(cfg, cornell_box_scene(), smallpt_camera(), prng.base_key(0))


def test_cornell_parity_with_splitting():
    """Fidelity mode: refraction splitting at depth<=2 into an 8-lane budget
    (smallpt.cpp:248-254 semantics)."""
    cfg = RenderConfig(
        width=10, height=10, spp_per_cell=1, split_budget=8, split_depth=2,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT, max_depth=12,
    )
    # splitting doubles the glass-path population, so more rim-ambiguous
    # paths than the no-split configs — 3% divergence budget
    _compare(cfg, cornell_box_scene(), smallpt_camera(), prng.base_key(3),
             max_frac_div=0.03)


def test_two_sphere_scene_parity():
    """The reference's *active* scene (smallpt.cpp:31-34)."""
    cfg = RenderConfig(
        width=12, height=12, spp_per_cell=1,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT, max_depth=10,
    )
    _compare(cfg, two_sphere_scene(), smallpt_camera(), prng.base_key(1))


def test_box_filter_parity():
    cfg = RenderConfig(
        width=12, height=12, spp_per_cell=1,
        camera_model=CameraModel.LEGACY, filter=Filter.BOX, max_depth=10,
    )
    _compare(cfg, cornell_box_scene(), smallpt_camera(), prng.base_key(2))


def test_normal_aov_parity():
    """Normal AOV (the reference's active debug output, smallpt.cpp:180),
    with the reference's unflipped normals."""
    cfg = RenderConfig(
        width=12, height=12, spp_per_cell=1, mode=Mode.NORMAL,
        flip_normals=False,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
    )
    img, oimg = _compare(cfg, cornell_box_scene(), smallpt_camera(), prng.base_key(4),
                         max_frac_div=0.02, mean_tol=0.05)
    # normals AOV values are bounded by spp per pixel
    assert np.abs(img).max() <= cfg.spp + 1e-3


def test_emission_aov_parity():
    """Mode.EMISSION (the commented smallpt.cpp:179 line): first-hit
    weight*emission — previously the oracle silently fell through to full
    transport for this mode."""
    cfg = RenderConfig(
        width=12, height=12, spp_per_cell=1, mode=Mode.EMISSION,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT, max_depth=4,
    )
    scene, cam = cornell_box_scene(), smallpt_camera()
    key = prng.base_key(6)
    img = np.asarray(render(scene, cam, cfg, key))
    oracle = Oracle(scene, cam, cfg,
                    PrecomputedUniformProvider(key, cfg.n_pixels * cfg.spp))
    oimg = oracle.render()
    # first-hit geometry only: f32-vs-f64 differences are razor flips on
    # the light rim — exact agreement elsewhere
    exact = np.isclose(img, oimg, rtol=1e-5, atol=1e-5)
    assert exact.mean() > 0.98, exact.mean()
    assert img.max() > 1.0  # the light is visible


def test_inst_id_oracle_mode_runs():
    """INST_ID oracle colors: fract(sin) amplifies 1-ulp differences 4e4x,
    so no cross-precision gate — pin the oracle's own value range and that
    the engine mode renders non-black."""
    cfg = RenderConfig(
        width=8, height=8, spp_per_cell=1, mode=Mode.INST_ID,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT, max_depth=2,
    )
    scene, cam = cornell_box_scene(), smallpt_camera()
    key = prng.base_key(6)
    img = np.asarray(render(scene, cam, cfg, key))
    oracle = Oracle(scene, cam, cfg,
                    PrecomputedUniformProvider(key, cfg.n_pixels * cfg.spp))
    oimg = oracle.render()
    assert np.abs(oimg).max() <= cfg.spp and np.abs(oimg).max() > 0
    assert np.abs(img).max() <= cfg.spp and np.abs(img).max() > 0


def test_reproducibility_same_key():
    cfg = RenderConfig(width=8, height=8, spp_per_cell=1, max_depth=8,
                       camera_model=CameraModel.LEGACY, filter=Filter.TENT)
    scene, cam = cornell_box_scene(), smallpt_camera()
    a = np.asarray(render(scene, cam, cfg, prng.base_key(7)))
    b = np.asarray(render(scene, cam, cfg, prng.base_key(7)))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(render(scene, cam, cfg, prng.base_key(8)))
    assert not np.array_equal(a, c)


def test_uv_aov_parity_on_spheres():
    """Mode.UV on an analytic-sphere scene: spherical lat/long uv
    (ops/intersect.py::sphere_uv, the makeSphereTriMesh grid analog) must
    match the oracle's parameterization — pre-round-2 this AOV rendered
    black on sphere scenes (Hit.uv was hardwired 0)."""
    cfg = RenderConfig(
        width=12, height=12, spp_per_cell=1, mode=Mode.UV,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT, max_depth=2,
    )
    scene, cam = cornell_box_scene(), smallpt_camera()
    key = prng.base_key(5)
    img = np.asarray(render(scene, cam, cfg, key)) / cfg.spp
    oracle = Oracle(scene, cam, cfg,
                    PrecomputedUniformProvider(key, cfg.n_pixels * cfg.spp))
    oimg = oracle.render() / cfg.spp
    # the AOV must not be black, and must agree with the oracle closely
    # (u wraps at phi=0: a razor-straddling sample can land on either side,
    # so compare circularly in the u channel)
    assert img[..., :2].max() > 0.1
    du = np.abs(img[..., 0] - oimg[..., 0])
    du = np.minimum(du, 1.0 - du)
    assert (du < 5e-3).mean() > 0.98, du.max()
    assert np.allclose(img[..., 1], oimg[..., 1], atol=5e-3)


def test_mesh_scene_transport_parity():
    """Full transport on a TRIANGLE scene (quad-walled Cornell + tessellated
    balls) vs the f64 oracle's mesh mirror — pins the mesh path's hit
    construction (barycentric position, UNNORMALIZED interpolated normals,
    per-instance materials) and the culled accel route end-to-end, since
    render() auto-routes this scene through intersect_mesh_culled."""
    from smallpt_tpu.config import Intersector, Scheduler
    from smallpt_tpu.core.scene import procedural_mesh_scene
    from smallpt_tpu.engine import renderer as R

    scene = procedural_mesh_scene(n_balls=60, seed=3)
    cfg = RenderConfig(
        width=12, height=12, spp_per_cell=1,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT, max_depth=10,
        intersector=Intersector.PALLAS, scheduler=Scheduler.FLAT,
    )
    old = R.MESH_ACCEL_MIN_TRIS
    try:
        R.MESH_ACCEL_MIN_TRIS = 1  # force the accel route
        R._MESH_ACCEL_CACHE.clear()
        _compare(cfg, scene, smallpt_camera(), prng.base_key(5))
    finally:
        R.MESH_ACCEL_MIN_TRIS = old
        R._MESH_ACCEL_CACHE.clear()


def test_mesh_normal_aov_parity():
    from smallpt_tpu.config import Intersector, Scheduler
    from smallpt_tpu.core.scene import procedural_mesh_scene

    scene = procedural_mesh_scene(n_balls=30, seed=4)
    cfg = RenderConfig(
        width=12, height=12, spp_per_cell=1, mode=Mode.NORMAL,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT, max_depth=4,
        intersector=Intersector.PALLAS, scheduler=Scheduler.FLAT,
    )
    _compare(cfg, scene, smallpt_camera(), prng.base_key(6))
