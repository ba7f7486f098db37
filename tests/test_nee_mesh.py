"""Next-event estimation for triangle AREA lights (mesh scenes).

Round 3: config.nee_lights on a MeshScene names emissive INSTANCES;
diffuse vertices sample a point uniformly by area on the instance
(CDF triangle pick reusing the pick uniform's conditional remainder +
sqrt warp), cast a shadow ray, and add f*Le*cos_x*cos_y*A/(pi*d^2); the
instance's emission is then suppressed at the next BSDF-sampled hit —
the same estimator family as the sphere cone sampler, on the geometry
family the reference's accelerated backend actually serves
(smallpt.cpp:489-516)."""

import numpy as np
import pytest

from smallpt_tpu.config import RenderConfig, Filter, CameraModel, Scheduler
from smallpt_tpu.core.scene import (
    DIFF, make_instanced_mesh_scene, procedural_mesh_scene,
)
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core import rng as prng
from smallpt_tpu.engine.renderer import render, render_image
from smallpt_tpu.oracle.numpy_oracle import Oracle, PrecomputedUniformProvider

SCENE = procedural_mesh_scene(n_balls=2, subdiv_longitude=3, seed=1)
LIGHT = 6  # the ceiling light quad instance (core/scene.py wall_mats[6])

CFG = RenderConfig(
    width=12, height=10, spp_per_cell=1, max_depth=8, nee_lights=(LIGHT,),
    camera_model=CameraModel.LEGACY, filter=Filter.TENT,
)


def _quad(p0, p1, p2, p3, normal):
    pos = np.asarray([p0, p1, p2, p3], np.float64)
    nrm = np.tile(np.asarray(normal, np.float64), (4, 1))
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int64)
    return pos, nrm, idx


def _small_light_scene():
    """Cornell-ish quad box with a SMALL bright light quad — the scene
    shape NEE exists for (BSDF rays almost never hit the emitter)."""
    x0, x1, y0, y1, z0, z1 = 1.0, 99.0, 0.0, 81.6, 0.0, 170.0
    white = ((0, 0, 0), (0.75, 0.75, 0.75), DIFF)
    instances = [
        (*_quad((x0, y0, z0), (x0, y0, z1), (x0, y1, z1), (x0, y1, z0),
                (1, 0, 0)), None, ((0, 0, 0), (0.75, 0.25, 0.25), DIFF)),
        (*_quad((x1, y0, z0), (x1, y1, z0), (x1, y1, z1), (x1, y0, z1),
                (-1, 0, 0)), None, ((0, 0, 0), (0.25, 0.25, 0.75), DIFF)),
        (*_quad((x0, y0, z0), (x0, y1, z0), (x1, y1, z0), (x1, y0, z0),
                (0, 0, 1)), None, white),
        (*_quad((x0, y0, z0), (x1, y0, z0), (x1, y0, z1), (x0, y0, z1),
                (0, 1, 0)), None, white),
        (*_quad((x0, y1, z0), (x0, y1, z1), (x1, y1, z1), (x1, y1, z0),
                (0, -1, 0)), None, white),
        # small 6x6 light quad, 400x emission (cornell_box_small_light's
        # radiance scale)
        (*_quad((47, y1 - 0.02, 78), (47, y1 - 0.02, 84),
                (53, y1 - 0.02, 84), (53, y1 - 0.02, 78),
                (0, -1, 0)), None, ((400, 400, 400), (0, 0, 0), DIFF)),
    ]
    return make_instanced_mesh_scene(instances), 5  # light instance id


def test_mesh_nee_oracle_parity():
    """Same per-decision uniforms => the wavefront's area sampler and the
    f64 oracle mirror agree path-for-path."""
    cfg = CFG.replace(scheduler=Scheduler.FLAT)
    cam = smallpt_camera()
    key = prng.base_key(0)
    img = np.asarray(render(SCENE, cam, cfg, key))
    oracle = Oracle(SCENE, cam, cfg,
                    PrecomputedUniformProvider(key, cfg.n_pixels * cfg.spp))
    oimg = oracle.render()
    rel = np.abs(img - oimg) / (1.0 + np.abs(oimg))
    assert np.isfinite(img).all()
    assert (rel > 0.1).mean() <= 0.03, f"{(rel > 0.1).mean():.4f} diverge"
    assert abs(img.mean() - oimg.mean()) < 0.1 * (abs(oimg.mean()) + 0.1)
    assert img.mean() > 0.01  # the light actually contributes


def test_mesh_nee_schedulers_agree():
    cam = smallpt_camera()
    key = prng.base_key(2)
    a = np.asarray(render(SCENE, cam, CFG.replace(scheduler=Scheduler.FLAT),
                          key))
    b = np.asarray(render(SCENE, cam, CFG.replace(scheduler=Scheduler.REGEN),
                          key))
    rel = np.abs(a - b) / (1.0 + np.abs(a))
    assert (rel > 1e-3).mean() <= 0.02
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.05)


def test_mesh_nee_unbiased_vs_plain():
    """Area-light NEE and plain BSDF sampling estimate the same integral."""
    cam = smallpt_camera()
    nee = np.asarray(render_image(SCENE, cam, CFG, seed=0, n_passes=6))
    plain = np.asarray(render_image(
        SCENE, cam, CFG.replace(nee_lights=()), seed=1, n_passes=30,
    ))
    assert abs(nee.mean() - plain.mean()) < 0.08 * (plain.mean() + 0.05), (
        nee.mean(), plain.mean())


def test_mesh_nee_reduces_variance_small_light():
    scene, light = _small_light_scene()
    cfg = CFG.replace(nee_lights=(light,), width=16, height=12)
    cam = smallpt_camera()
    ref = np.asarray(render_image(scene, cam, cfg, seed=9, n_passes=24))
    lo_nee = np.asarray(render_image(scene, cam, cfg, seed=3, n_passes=1))
    lo_plain = np.asarray(render_image(
        scene, cam, cfg.replace(nee_lights=()), seed=3, n_passes=1,
    ))
    tm = lambda x: np.power(np.clip(x, 0.0, 1.0), 1 / 2.2)
    mse_nee = float(np.mean((tm(lo_nee) - tm(ref)) ** 2))
    mse_plain = float(np.mean((tm(lo_plain) - tm(ref)) ** 2))
    assert mse_nee < 0.5 * mse_plain, (mse_nee, mse_plain)


def test_mesh_nee_sharded_matches_single():
    """The triangle-light tables replicate into the shard_map body (the
    mesh-accel discipline): sharded == unsharded."""
    import jax

    from smallpt_tpu.parallel.shard import make_mesh, render_sharded

    cfg = CFG.replace(width=16, height=8, max_depth=6)
    cam = smallpt_camera()
    key = prng.base_key(4)
    single = np.asarray(render(SCENE, cam, cfg, key))
    mesh = make_mesh(n_sample=2, devices=jax.devices("cpu")[:4])
    sharded = np.asarray(render_sharded(SCENE, cam, cfg, key, mesh))
    np.testing.assert_allclose(sharded, single, rtol=2e-5, atol=2e-5)


def test_mesh_nee_rejects_bad_lights():
    from smallpt_tpu.engine.renderer import _mesh_nee_for

    with pytest.raises(ValueError, match="out of range"):
        _mesh_nee_for(SCENE, CFG.replace(nee_lights=(LIGHT, 7777)))
