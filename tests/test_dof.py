"""Thin-lens depth of field (config.aperture / focal_distance).

Pins: pinhole (aperture=0) is unchanged; DoF parity across oracle, JAX
schedulers, and the megakernel (shared lens-sample streams); blur increases
away from the focal plane."""

import numpy as np
import pytest

from smallpt_tpu.config import RenderConfig, Filter, CameraModel, Scheduler
from smallpt_tpu.core.scene import cornell_box_scene
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core import rng as prng
from smallpt_tpu.engine.renderer import render, render_image
from smallpt_tpu.oracle.numpy_oracle import Oracle, PrecomputedUniformProvider

BASE = RenderConfig(width=16, height=12, spp_per_cell=1, max_depth=8,
                    camera_model=CameraModel.LEGACY, filter=Filter.TENT)
# mirror ball sits ~|(27,16.5,47)-(50,52,295.6)| ~ 252 from the camera;
# push_forward=140 puts ray origins ~112 away -> focal ~112 is "on the ball"
DOF = BASE.replace(aperture=4.0, focal_distance=112.0)


def test_aperture_zero_is_pinhole():
    scene, cam = cornell_box_scene(), smallpt_camera()
    key = prng.base_key(0)
    a = np.asarray(render(scene, cam, BASE, key))
    # DOF config with the aperture zeroed: the lens branch must compile away
    # to exactly the pinhole program (focal_distance alone changes nothing)
    b = np.asarray(render(scene, cam, DOF.replace(aperture=0.0), key))
    np.testing.assert_array_equal(a, b)


def test_dof_oracle_parity():
    scene, cam = cornell_box_scene(), smallpt_camera()
    key = prng.base_key(1)
    cfg = DOF.replace(scheduler=Scheduler.FLAT)
    img = np.asarray(render(scene, cam, cfg, key))
    oracle = Oracle(scene, cam, cfg,
                    PrecomputedUniformProvider(key, cfg.n_pixels * cfg.spp))
    oimg = oracle.render()
    rel = np.abs(img - oimg) / (1.0 + np.abs(oimg))
    assert (rel > 0.1).mean() <= 0.03, f"{(rel > 0.1).mean():.4f} diverge"


def test_dof_megakernel_matches_regen():
    from smallpt_tpu.ops.megakernel import render_pass_megakernel

    scene, cam = cornell_box_scene(), smallpt_camera()
    key = prng.base_key(2)
    a = np.asarray(render(scene, cam, DOF.replace(scheduler=Scheduler.REGEN), key))
    b, _ = render_pass_megakernel(scene, cam, DOF, key)
    b = np.asarray(b)
    rel = np.abs(a - b) / (1.0 + np.abs(a))
    assert (rel > 0.1).mean() <= 0.02
    assert abs(a.mean() - b.mean()) < 0.05 * (a.mean() + 0.1)


def test_dof_focus_plane_invariant():
    """The defining thin-lens property: every lens sample of a pixel whose
    geometry sits AT the focal distance converges to the same hit point, so
    the (deterministic) normals AOV is unchanged there — while out-of-focus
    geometry mixes neighboring points and changes. Focal distance here = the
    central pixel's back-wall hit distance, computed from the camera ray."""
    from smallpt_tpu.config import Mode
    from smallpt_tpu.ops.intersect import intersect_spheres
    import jax.numpy as jnp

    scene, cam = cornell_box_scene(), smallpt_camera()
    cfg = BASE.replace(width=48, height=36, spp_per_cell=4, mode=Mode.NORMAL)
    # central ray hit distance (back wall)
    d = np.asarray(cam.direction, np.float64)
    org = np.asarray(cam.origin, np.float64) + d * float(cam.push_forward)
    hit = intersect_spheres(jnp.asarray(org, jnp.float32)[None, :],
                            jnp.asarray(d, jnp.float32)[None, :], scene)
    focal = float(hit.t[0])
    cfg_dof = cfg.replace(aperture=6.0, focal_distance=focal)

    pin = np.asarray(render_image(scene, cam, cfg, seed=5, n_passes=1))
    dof = np.asarray(render_image(scene, cam, cfg_dof, seed=5, n_passes=1))
    h, w = cfg.height, cfg.width
    center = (slice(h // 2 - 2, h // 2 + 2), slice(w // 2 - 2, w // 2 + 2))
    center_delta = np.abs(pin[center] - dof[center]).mean()
    total_delta = np.abs(pin - dof).mean()
    # back wall (in focus): normals identical; silhouettes/close geometry
    # (out of focus) mix normals and move
    assert center_delta < 5e-3, center_delta
    assert total_delta > 10 * max(center_delta, 1e-4), (
        center_delta, total_delta)
