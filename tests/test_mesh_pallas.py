"""Pallas ray/triangle kernel vs the pure-JAX mesh backend.

Cross-backend contract testing in the reference's style (CPUIntersector vs
OptixIntersector, smallpt.cpp:605): same duck-typed traceRays, two
implementations must agree."""

import numpy as np
import pytest
import jax.numpy as jnp

from smallpt_tpu.config import RenderConfig, Mode, Filter, CameraModel, Intersector, Scheduler
from smallpt_tpu.core.scene import (
    single_triangle_scene,
    two_sphere_scene,
    mesh_scene_from_spheres,
)
from smallpt_tpu.ops.intersect import intersect_mesh
from smallpt_tpu.ops.mesh_pallas import intersect_mesh_pallas


def _random_rays(n, lo, hi, seed=0):
    rng = np.random.default_rng(seed)
    org = jnp.asarray(rng.uniform(lo, hi, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return org, jnp.asarray(d, jnp.float32)


def test_single_triangle():
    scene = single_triangle_scene()
    rng = np.random.default_rng(1)
    org = jnp.asarray(rng.uniform([-1, -1, 0], [1, 1, 1], (500, 3)), jnp.float32)
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (500, 1))
    a = intersect_mesh(org, dirs, scene)
    b = intersect_mesh_pallas(org, dirs, scene)
    np.testing.assert_array_equal(
        np.isfinite(np.asarray(a.t)), np.isfinite(np.asarray(b.t))
    )
    hit = np.isfinite(np.asarray(a.t))
    assert hit.sum() > 20  # rays over the triangle actually hit
    np.testing.assert_allclose(np.asarray(a.t)[hit], np.asarray(b.t)[hit],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.uv)[hit], np.asarray(b.uv)[hit],
                               rtol=1e-4, atol=1e-5)


def test_tessellated_spheres_mesh():
    """8192-triangle mesh (two tessellated spheres — the reference's actual
    sphere intersection path, scene.h:107-109)."""
    scene = mesh_scene_from_spheres(two_sphere_scene(), subdiv_longitude=16)
    org, dirs = _random_rays(800, [0, 0, 0], [100, 80, 160], seed=2)
    a = intersect_mesh(org, dirs, scene)
    b = intersect_mesh_pallas(org, dirs, scene)
    ta, tb = np.asarray(a.t), np.asarray(b.t)
    agree = np.isfinite(ta) == np.isfinite(tb)
    assert agree.mean() > 0.999
    both = np.isfinite(ta) & np.isfinite(tb)
    rel = np.abs(ta[both] - tb[both]) / np.maximum(ta[both], 1.0)
    assert np.median(rel) < 1e-6 and rel.max() < 1e-3
    same_tri = np.asarray(a.prim)[both] == np.asarray(b.prim)[both]
    # shared-edge ties can pick either triangle; hits must otherwise agree
    assert same_tri.mean() > 0.99
    np.testing.assert_allclose(np.asarray(a.x)[both][same_tri],
                               np.asarray(b.x)[both][same_tri],
                               atol=1e-3)


def test_triangle_scene_render_normal_aov():
    """End-to-end: the reference main()'s debug render (normals AOV of the
    single red triangle, smallpt.cpp:818-838 + 180) through the Pallas mesh
    backend."""
    from smallpt_tpu.engine.renderer import render
    from smallpt_tpu.core.camera import default_matrix_camera
    from smallpt_tpu.core import rng as prng

    cfg = RenderConfig(width=32, height=24, spp_per_cell=1, mode=Mode.NORMAL,
                       flip_normals=False, camera_model=CameraModel.MATRIX,
                       filter=Filter.BOX, scheduler=Scheduler.FLAT)
    scene = single_triangle_scene()
    cam = default_matrix_camera()
    a = np.asarray(render(scene, cam, cfg, prng.base_key(0)))
    b = np.asarray(render(scene, cam, cfg.replace(intersector=Intersector.PALLAS),
                          prng.base_key(0)))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    assert a.max() > 0.5  # the triangle is visible
