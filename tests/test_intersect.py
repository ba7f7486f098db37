"""Unit tests for intersection kernels vs closed forms and the oracle's
scalar math (the reference's own cross-check style: two independent backends
must agree — SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from smallpt_tpu.core.scene import (
    make_sphere_scene,
    cornell_box_scene,
    single_triangle_scene,
    mesh_scene_from_spheres,
    two_sphere_scene,
    DIFF,
)
from smallpt_tpu.ops.intersect import intersect_spheres, intersect_mesh


def test_sphere_head_on():
    scene = make_sphere_scene([(1.0, (0, 0, -5), (0, 0, 0), (1, 1, 1), DIFF)])
    org = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = intersect_spheres(org, d, scene)
    assert np.isclose(float(hit.t[0]), 4.0, atol=1e-5)
    assert int(hit.inst[0]) == 0
    np.testing.assert_allclose(np.asarray(hit.x[0]), [0, 0, -4], atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.n[0]), [0, 0, 1], atol=1e-5)


def test_sphere_miss_is_inf():
    scene = make_sphere_scene([(1.0, (0, 0, -5), (0, 0, 0), (1, 1, 1), DIFF)])
    hit = intersect_spheres(
        jnp.asarray([[0.0, 5.0, 0.0]]), jnp.asarray([[0.0, 0.0, -1.0]]), scene
    )
    assert not bool(np.isfinite(np.asarray(hit.t))[0])


def test_inside_sphere_returns_far_root():
    scene = make_sphere_scene([(2.0, (0, 0, 0), (0, 0, 0), (1, 1, 1), DIFF)])
    hit = intersect_spheres(
        jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([[1.0, 0.0, 0.0]]), scene
    )
    assert np.isclose(float(hit.t[0]), 2.0, atol=1e-5)
    # normal points outward from center (scene.cpp:124) — not flipped here
    np.testing.assert_allclose(np.asarray(hit.n[0]), [1, 0, 0], atol=1e-5)


def test_eps_rejects_grazing_self_hit():
    scene = make_sphere_scene([(1.0, (0, 0, 0), (0, 0, 0), (1, 1, 1), DIFF)])
    # origin on the surface pointing away: both roots <= eps -> miss
    hit = intersect_spheres(
        jnp.asarray([[1.0, 0.0, 0.0]]), jnp.asarray([[1.0, 0.0, 0.0]]), scene
    )
    assert not bool(np.isfinite(np.asarray(hit.t))[0])


def test_closest_of_many_and_chunking():
    # 5 spheres along -z; chunk=2 forces the scan path
    spheres = [(0.5, (0, 0, -2.0 * (i + 1)), (0, 0, 0), (1, 1, 1), DIFF) for i in range(5)]
    scene = make_sphere_scene(spheres)
    hit = intersect_spheres(
        jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([[0.0, 0.0, -1.0]]), scene, chunk=2
    )
    assert int(hit.inst[0]) == 0
    assert np.isclose(float(hit.t[0]), 1.5, atol=1e-5)
    hit_full = intersect_spheres(
        jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([[0.0, 0.0, -1.0]]), scene, chunk=512
    )
    assert np.isclose(float(hit.t[0]), float(hit_full.t[0]))


def test_cornell_camera_ray_hits_back_wall_region():
    scene = cornell_box_scene()
    org = jnp.asarray([[50.0, 52.0, 295.6]])
    d = jnp.asarray([[0.0, -0.042612, -1.0]])
    d = d / jnp.linalg.norm(d)
    hit = intersect_spheres(org, d, scene)
    assert bool(np.isfinite(np.asarray(hit.t))[0])
    # the raw camera position sits behind the black front wall (inst 3,
    # surface near z=170) — this is why smallpt pushes origins 140 forward
    assert int(hit.inst[0]) == 3
    # pushed-forward origin (smallpt.cpp:333) is inside the box: the central
    # ray now reaches the back wall (inst 2) or floor (inst 4)
    org2 = org + 140.0 * d
    hit2 = intersect_spheres(org2, d, scene)
    assert int(hit2.inst[0]) in (2, 4)


def test_oracle_matches_jax_spheres():
    from smallpt_tpu.oracle.numpy_oracle import Oracle, JaxUniformProvider
    from smallpt_tpu.config import RenderConfig

    scene = cornell_box_scene()
    cfg = RenderConfig()
    oracle = Oracle(scene, None, cfg, JaxUniformProvider(0))
    rng = np.random.default_rng(7)
    orgs = rng.uniform([10, 10, 30], [90, 70, 160], (64, 3))
    dirs = rng.normal(size=(64, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    hit = intersect_spheres(
        jnp.asarray(orgs, jnp.float32), jnp.asarray(dirs, jnp.float32), scene
    )
    for k in range(64):
        t, i = oracle.intersect(orgs[k], dirs[k])
        jt, ji = float(hit.t[k]), int(hit.inst[k])
        if np.isfinite(t):
            # f32 vs f64 on the 1e5-radius wall spheres: stable formulation
            # keeps abs error ~1e-2 at this scene scale
            assert abs(jt - t) < 0.08, k
            # instance may differ only on genuine near-ties (e.g. the light
            # sphere bottom nearly touches the ceiling wall)
            if ji != i:
                assert abs(jt - t) < 0.05, (k, ji, i)
        else:
            assert not np.isfinite(jt), k


def test_triangle_intersect_basic():
    scene = single_triangle_scene()
    org = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = intersect_mesh(org, d, scene)
    assert np.isclose(float(hit.t[0]), 2.0, atol=1e-6)
    # barycentric interp of positions reproduces the hit point
    np.testing.assert_allclose(np.asarray(hit.x[0]), [0, 0, -2], atol=1e-6)
    miss = intersect_mesh(
        jnp.asarray([[2.0, 2.0, 0.0]]), jnp.asarray([[0.0, 0.0, -1.0]]), scene
    )
    assert not bool(np.isfinite(np.asarray(miss.t))[0])


def test_mesh_vs_analytic_sphere_cross_check():
    """The reference's analytic-vs-mesh switch (scene.h:107-109) as a test:
    a tessellated sphere hit should approximate the analytic hit."""
    sph = make_sphere_scene([(1.0, (0, 0, -5), (0, 0, 0), (1, 1, 1), DIFF)])
    mesh = mesh_scene_from_spheres(sph, subdiv_longitude=32)
    org = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    h_a = intersect_spheres(org, d, sph)
    h_m = intersect_mesh(org, d, mesh, chunk=512)
    assert abs(float(h_a.t[0]) - float(h_m.t[0])) < 5e-3
    assert np.dot(np.asarray(h_a.n[0]), np.asarray(h_m.n[0])) > 0.999


def test_instanced_mesh_transforms():
    """OptiX-instance-model capability (smallpt.cpp:518-530): two instances
    of one triangle with different 3x4 transforms land where the transforms
    say, carry their instance ids, and rotated normals follow the
    inverse-transpose rule."""
    import numpy as np
    from smallpt_tpu.core.scene import make_instanced_mesh_scene, DIFF
    from smallpt_tpu.ops.intersect import intersect_mesh

    pos = np.array([(-1.0, -1.0, 0.0), (1.0, -1.0, 0.0), (0.0, 1.0, 0.0)])
    nrm = np.array([(0.0, 0.0, 1.0)] * 3)
    idx = np.array([[0, 1, 2]])
    # instance 0: translate to z = -5; instance 1: rotate 90deg about y
    # (plane becomes x = +3) and translate to x = 3
    t0 = np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -5.0]])
    c, s = 0.0, 1.0  # cos/sin 90deg
    t1 = np.array([[c, 0, s, 3.0], [0, 1, 0, 0], [-s, 0, c, 0.0]])
    mat = ((0, 0, 0), (0.7, 0.7, 0.7), DIFF)
    scene = make_instanced_mesh_scene(
        [(pos, nrm, idx, t0, mat), (pos, nrm, idx, t1, mat)]
    )
    assert scene.n_triangles == 2

    org = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    dirs = jnp.asarray([[0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    hit = intersect_mesh(org, dirs, scene, eps=0.0)
    t = np.asarray(hit.t)
    assert np.allclose(t, [5.0, 3.0], atol=1e-5)
    assert np.asarray(hit.inst).tolist() == [0, 1]
    n = np.asarray(hit.n)
    # instance 0 normal stays +z; instance 1 normal rotates to +x
    assert np.allclose(np.abs(n[0]), [0, 0, 1], atol=1e-5)
    assert np.allclose(np.abs(n[1]), [1, 0, 0], atol=1e-5)
