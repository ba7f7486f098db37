"""Pallas intersect kernel vs the pure-JAX backend.

The reference's test-strategy analog (SURVEY.md §4): its two intersector
backends (CPUIntersector / OptixIntersector) share one duck-typed contract and
cross-check each other by a one-line switch (smallpt.cpp:605). Here the Pallas
kernel (OptiX Prime analog) is checked against ops.intersect.intersect_spheres
(CPUIntersector analog) — on the CPU test platform the kernel runs in the
Pallas interpreter, so this validates kernel logic, not Mosaic codegen (the
TPU run is covered by bench.py and the driver's entry check).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smallpt_tpu.config import RenderConfig, Intersector, CameraModel, Filter
from smallpt_tpu.core.scene import cornell_box_scene, procedural_sphere_scene
from smallpt_tpu.ops.intersect import intersect_spheres
from smallpt_tpu.ops.intersect_pallas import intersect_spheres_pallas


def _random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    org = jnp.asarray(rng.uniform([5, 5, 20], [95, 75, 150], (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return org, jnp.asarray(d, jnp.float32)


@pytest.mark.parametrize(
    "scene_fn,n_rays",
    [(cornell_box_scene, 1500), (lambda: procedural_sphere_scene(200), 800)],
    ids=["cornell", "procedural200"],
)
def test_matches_pure_jax(scene_fn, n_rays):
    scene = scene_fn()
    org, dirs = _random_rays(n_rays)
    h_ref = intersect_spheres(org, dirs, scene)
    h_pal = intersect_spheres_pallas(org, dirs, scene)

    tr, tp = np.asarray(h_ref.t), np.asarray(h_pal.t)
    hit_r, hit_p = np.isfinite(tr), np.isfinite(tp)
    # hit/miss classification agrees except razor-edge rays
    assert (hit_r == hit_p).mean() > 0.999
    both = hit_r & hit_p
    # both backends use the cancellation-stable form, but f32 op-ordering
    # differs; at smallpt's 1e5 wall-sphere scale the inherent noise floor is
    # a few e-3 relative (ops/intersect.py::sphere_hit_t docstring)
    rel = np.abs(tr[both] - tp[both]) / np.maximum(tr[both], 1.0)
    assert rel.max() < 5e-3
    assert np.median(rel) < 1e-6
    # same nearest sphere wherever t is not a near-tie
    ir, ip = np.asarray(h_ref.inst)[both], np.asarray(h_pal.inst)[both]
    disagree = ir != ip
    assert disagree.mean() < 3e-3
    # positions consistent to the same envelope (t noise ~ 3e-3 * t ~ 0.5)
    np.testing.assert_allclose(
        np.asarray(h_ref.x)[both][~disagree],
        np.asarray(h_pal.x)[both][~disagree],
        atol=1.0,
    )
    nr = np.asarray(h_ref.n)[both][~disagree]
    npal = np.asarray(h_pal.n)[both][~disagree]
    assert np.abs((nr * npal).sum(-1) - 1.0).max() < 1e-3


def test_padding_lanes_and_misses():
    """Ray counts not divisible by the tile size, and all-miss rays."""
    scene = cornell_box_scene()
    org = jnp.tile(jnp.asarray([[50.0, 52.0, 295.6]], jnp.float32), (77, 1))
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (77, 1))  # away
    h = intersect_spheres_pallas(org, dirs, scene)
    assert h.t.shape == (77,)
    # +z from the camera exits through the open front (sphere 4/bottom has
    # radius 1e5 centered y=1e5 — ray +z at y=52 stays inside its hollow);
    # every lane must agree with the reference backend
    h_ref = intersect_spheres(org, dirs, scene)
    np.testing.assert_array_equal(
        np.isfinite(np.asarray(h.t)), np.isfinite(np.asarray(h_ref.t))
    )


def test_full_render_parity_pallas_vs_jax():
    """End-to-end: a tiny Cornell render with the PALLAS intersector matches
    the JAX intersector statistically (same RNG keying, same transport)."""
    base = RenderConfig(
        width=32, height=24, spp_per_cell=1, max_depth=8,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
    )
    from smallpt_tpu.engine.renderer import render_image
    from smallpt_tpu.core.camera import smallpt_camera

    scene = cornell_box_scene()
    camera = smallpt_camera()
    img_jax = np.asarray(render_image(scene, camera, base, seed=7))
    img_pal = np.asarray(
        render_image(scene, camera, base.replace(intersector=Intersector.PALLAS),
                     seed=7)
    )
    # identical sample streams; only intersect arithmetic differs (ulps),
    # which can flip rare razor-edge paths — compare robustly
    close = np.isclose(img_jax, img_pal, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.98


@pytest.mark.parametrize(
    "scene_fn,n_rays",
    [(cornell_box_scene, 4000), (lambda: procedural_sphere_scene(2000), 4000)],
    ids=["cornell", "procedural2000"],
)
def test_mxu_matches_pure_jax(scene_fn, n_rays):
    """MXU-assisted sweep vs the pure-JAX backend — same statistical gates
    as the classic kernel, plus: same-winner lanes must carry the exact
    replay t (noise floor == the classic kernel's own, measured on the same
    rays, since _replay_winner shares the stable citardauq arithmetic)."""
    from smallpt_tpu.ops.intersect_pallas import intersect_spheres_mxu

    scene = scene_fn()
    # wide origin range includes camera-distance rays (z to 290) — the
    # recentering's worst case for the expanded-quadratic noise
    rng = np.random.default_rng(3)
    org = jnp.asarray(rng.uniform([5, 5, 20], [95, 75, 290], (n_rays, 3)),
                      jnp.float32)
    d = rng.normal(size=(n_rays, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs = jnp.asarray(d, jnp.float32)

    h_ref = intersect_spheres(org, dirs, scene)
    h_mxu = intersect_spheres_mxu(org, dirs, scene)

    tr, tm = np.asarray(h_ref.t), np.asarray(h_mxu.t)
    hit_r, hit_m = np.isfinite(tr), np.isfinite(tm)
    # hit/miss classification: grazing reclassification only
    assert (hit_r == hit_m).mean() > 0.998
    both = hit_r & hit_m
    ir, im = np.asarray(h_ref.inst)[both], np.asarray(h_mxu.inst)[both]
    # winner flips: razor-edge near-ties within the det noise
    assert (ir != im).mean() < 3e-3
    same = ir == im
    rel = np.abs(tr[both] - tm[both])[same] / np.maximum(tr[both][same], 1.0)
    # replay-refined t: same floor as classic-vs-jax (grazing wall hits)
    assert np.quantile(rel, 0.999) < 2e-2
    assert np.median(rel) < 1e-6
    # normals unit + consistent where winners agree
    nr = np.asarray(h_ref.n)[both][same]
    nm = np.asarray(h_mxu.n)[both][same]
    assert np.abs((nr * nm).sum(-1) - 1.0).max() < 1e-2


def test_mxu_padding_and_misses():
    from smallpt_tpu.ops.intersect_pallas import intersect_spheres_mxu

    scene = cornell_box_scene()
    org = jnp.tile(jnp.asarray([[50.0, 52.0, 295.6]], jnp.float32), (77, 1))
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (77, 1))
    h = intersect_spheres_mxu(org, dirs, scene)
    assert h.t.shape == (77,)
    h_ref = intersect_spheres(org, dirs, scene)
    np.testing.assert_array_equal(
        np.isfinite(np.asarray(h.t)), np.isfinite(np.asarray(h_ref.t))
    )
