"""Scene model: struct-of-arrays sphere and triangle-mesh scenes.

The reference represents scenes as C++ object arrays (Sphere spheres[],
smallpt.cpp:31-48; TriMesh, scene.h:6-15) with a Material per instance
(scene.h:75-82). Here scenes are pytrees of device arrays — SoA layout so the
intersector kernels see contiguous (S,3)/(S,) tables, and so scene parameters
are first-class differentiable leaves (sphere centers/radii/albedo/emission).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

# BSDF tags (scene.h:64 — enum Refl_t { DIFF, SPEC, REFR }).
DIFF = 0
SPEC = 1
REFR = 2


class Material(NamedTuple):
    """Material table: emission/color/refl (scene.h:75-82), SoA over instances."""

    emission: jnp.ndarray  # (S, 3)
    albedo: jnp.ndarray  # (S, 3)
    refl: jnp.ndarray  # (S,) int32 in {DIFF, SPEC, REFR}


class SphereScene(NamedTuple):
    """Analytic sphere scene — the primary TPU intersection path.

    Mirrors Sphere{radius, center, material} (scene.h:84-110), but analytic
    intersection (scene.cpp:129-140) is the default here, whereas the
    reference tessellates every sphere into 4096 triangles and intersects the
    mesh (scene.h:107-109) — see SURVEY.md Appendix A.
    """

    center: jnp.ndarray  # (S, 3)
    radius: jnp.ndarray  # (S,)
    material: Material

    @property
    def n_spheres(self) -> int:
        return self.center.shape[0]


class MeshScene(NamedTuple):
    """Triangle-mesh scene (TriMesh per instance flattened into one table).

    Mirrors TriMesh{positions, normals, uint32 indices} (scene.h:6-15) with an
    added per-triangle instance id (the reference gets instId from the OptiX
    instance model, smallpt.cpp:518-530).
    """

    positions: jnp.ndarray  # (V, 3)
    normals: jnp.ndarray  # (V, 3)
    indices: jnp.ndarray  # (T, 3) int32
    tri_inst: jnp.ndarray  # (T,) int32 — instance id per triangle
    material: Material  # per-instance tables

    @property
    def n_triangles(self) -> int:
        return self.indices.shape[0]


def _mat(spec, dtype=jnp.float32) -> Material:
    """spec: list of (emission3, albedo3, refl)."""
    e = jnp.asarray([s[0] for s in spec], dtype=dtype)
    a = jnp.asarray([s[1] for s in spec], dtype=dtype)
    r = jnp.asarray([s[2] for s in spec], dtype=jnp.int32)
    return Material(e, a, r)


def make_sphere_scene(spheres, dtype=jnp.float32) -> SphereScene:
    """spheres: list of (radius, center3, emission3, albedo3, refl)."""
    radius = jnp.asarray([s[0] for s in spheres], dtype=dtype)
    center = jnp.asarray([s[1] for s in spheres], dtype=dtype)
    mat = _mat([(s[2], s[3], s[4]) for s in spheres], dtype=dtype)
    return SphereScene(center, radius, mat)


def two_sphere_scene(dtype=jnp.float32) -> SphereScene:
    """The reference's *active* global scene (smallpt.cpp:31-34): a small red
    diffuse ball plus a giant white emitter sphere."""
    return make_sphere_scene(
        [
            (10.0, (50, 40.8, 81.6), (0, 0, 0), (0.75, 0.25, 0.25), DIFF),
            (600.0, (50, 681.6 - 0.27, 81.6), (1, 1, 1), (0, 0, 0), DIFF),
        ],
        dtype=dtype,
    )


def cornell_box_scene(dtype=jnp.float32) -> SphereScene:
    """The canonical smallpt Cornell box — the commented-out 9-sphere scene at
    smallpt.cpp:36-48 (left/right/back/front/bottom/top walls as giant
    spheres, mirror + glass balls, ceiling light)."""
    return make_sphere_scene(
        [
            (1e5, (1e5 + 1, 40.8, 81.6), (0, 0, 0), (0.75, 0.25, 0.25), DIFF),
            (1e5, (-1e5 + 99, 40.8, 81.6), (0, 0, 0), (0.25, 0.25, 0.75), DIFF),
            (1e5, (50, 40.8, 1e5), (0, 0, 0), (0.75, 0.75, 0.75), DIFF),
            (1e5, (50, 40.8, -1e5 + 170), (0, 0, 0), (0, 0, 0), DIFF),
            (1e5, (50, 1e5, 81.6), (0, 0, 0), (0.75, 0.75, 0.75), DIFF),
            (1e5, (50, -1e5 + 81.6, 81.6), (0, 0, 0), (0.75, 0.75, 0.75), DIFF),
            (16.5, (27, 16.5, 47), (0, 0, 0), (0.999, 0.999, 0.999), SPEC),
            (16.5, (73, 16.5, 78), (0, 0, 0), (0.999, 0.999, 0.999), REFR),
            (600.0, (50, 681.6 - 0.27, 81.6), (12, 12, 12), (0, 0, 0), DIFF),
        ],
        dtype=dtype,
    )


def cornell_box_dim_light_scene(dtype=jnp.float32) -> SphereScene:
    """Cornell box with the (1,1,1) light emission the reference's commented
    scene actually uses (smallpt.cpp:46) — original smallpt uses (12,12,12)."""
    scene = cornell_box_scene(dtype=dtype)
    emission = scene.material.emission.at[8].set(
        jnp.asarray([1.0, 1.0, 1.0], dtype=dtype)
    )
    return scene._replace(material=scene.material._replace(emission=emission))


def cornell_box_small_light_scene(dtype=jnp.float32) -> SphereScene:
    """Cornell box with a small bright spherical light — the smallpt-explicit
    variant's scene shape (tiny emitter, high radiance), where next-event
    estimation pays off: BSDF rays almost never hit a 1.5-radius light, so
    explicit cone sampling removes most direct-light variance."""
    scene = cornell_box_scene(dtype=dtype)
    center = scene.center.at[8].set(
        jnp.asarray([50.0, 81.6 - 16.5, 81.6], dtype)
    )
    radius = scene.radius.at[8].set(jnp.asarray(1.5, dtype))
    emission = scene.material.emission.at[8].set(
        jnp.asarray([400.0, 400.0, 400.0], dtype)
    )
    return SphereScene(
        center=center, radius=radius,
        material=scene.material._replace(emission=emission),
    )


def procedural_sphere_scene(
    n: int = 10_000, seed: int = 0, dtype=jnp.float32
) -> SphereScene:
    """Large procedural scene for scaling benchmarks (BASELINE.json config 5:
    10k-sphere variant). Spheres scattered in the Cornell box volume with a
    mix of BSDFs, plus the box walls and light."""
    rng = np.random.default_rng(seed)
    n_rand = max(0, n - 9)
    centers = rng.uniform([5, 5, 20], [95, 75, 150], size=(n_rand, 3))
    radii = rng.uniform(0.4, 1.6, size=(n_rand,))
    albedo = rng.uniform(0.2, 0.95, size=(n_rand, 3))
    refl = rng.choice([DIFF, SPEC, REFR], p=[0.8, 0.1, 0.1], size=(n_rand,))
    emission = np.zeros((n_rand, 3))
    base = cornell_box_scene(dtype=dtype)
    return SphereScene(
        center=jnp.concatenate([base.center, jnp.asarray(centers, dtype=dtype)]),
        radius=jnp.concatenate([base.radius, jnp.asarray(radii, dtype=dtype)]),
        material=Material(
            emission=jnp.concatenate(
                [base.material.emission, jnp.asarray(emission, dtype=dtype)]
            ),
            albedo=jnp.concatenate(
                [base.material.albedo, jnp.asarray(albedo, dtype=dtype)]
            ),
            refl=jnp.concatenate(
                [base.material.refl, jnp.asarray(refl, dtype=jnp.int32)]
            ),
        ),
    )


def single_triangle_scene(dtype=jnp.float32) -> MeshScene:
    """The scene main() actually renders (smallpt.cpp:818-838): one red
    diffuse triangle at z=-2 with axis-aligned (debug) vertex normals."""
    positions = jnp.asarray(
        [(-0.5, -0.5, -2), (0.5, -0.5, -2), (0, 0.5, -2)], dtype=dtype
    )
    normals = jnp.asarray([(1, 0, 0), (0, 1, 0), (0, 0, 1)], dtype=dtype)
    indices = jnp.asarray([[0, 1, 2]], dtype=jnp.int32)
    tri_inst = jnp.asarray([0], dtype=jnp.int32)
    mat = _mat([((1, 0, 0), (0, 0, 0), DIFF)], dtype=dtype)
    return MeshScene(positions, normals, indices, tri_inst, mat)


def make_sphere_tri_mesh(
    origin, radius: float, subdiv_longitude: int = 32, dtype=np.float32
):
    """Lat/long sphere tessellation matching makeSphereTriMesh
    (scene.cpp:3-48): discLong=subdiv, discLat=2*subdiv; unit normals are the
    local coordinates. Returns (positions, normals, indices) numpy arrays.
    """
    disc_long = subdiv_longitude
    disc_lat = 2 * disc_long
    d_phi = 2.0 * np.pi / disc_lat
    d_theta = np.pi / disc_long

    j = np.arange(disc_long + 1)
    i = np.arange(disc_lat + 1)
    theta = -np.pi / 2 + j * d_theta
    cos_t, sin_t = np.cos(theta), np.sin(theta)
    phi = i * d_phi
    # (j, i, 3) grid of unit coords
    coords = np.stack(
        [
            np.sin(phi)[None, :] * cos_t[:, None],
            np.broadcast_to(sin_t[:, None], (disc_long + 1, disc_lat + 1)),
            np.cos(phi)[None, :] * cos_t[:, None],
        ],
        axis=-1,
    ).astype(dtype)
    positions = (np.asarray(origin, dtype=dtype) + radius * coords).reshape(-1, 3)
    normals = coords.reshape(-1, 3)

    jj, ii = np.meshgrid(np.arange(disc_long), np.arange(disc_lat), indexing="ij")
    offset = jj * (disc_lat + 1)
    a = offset + ii
    b = offset + ii + 1
    c = offset + disc_lat + 1 + ii + 1
    d = offset + ii + disc_lat + 1
    # interleave to match reference emission order (two tris per quad,
    # scene.cpp:37-43)
    t1 = np.stack([a, b, c], axis=-1).reshape(-1, 3)
    t2 = np.stack([a, c, d], axis=-1).reshape(-1, 3)
    tris = np.empty((t1.shape[0] * 2, 3), dtype=np.int32)
    tris[0::2] = t1
    tris[1::2] = t2
    return positions, normals, tris


def mesh_scene_from_spheres(
    scene: SphereScene, subdiv_longitude: int = 32
) -> MeshScene:
    """Tessellated-sphere mesh scene — the reference's actual intersection
    path for its global sphere scenes (scene.h:107-109 delegates
    Sphere::intersect to the mesh). Kept as a cross-check/secondary mode."""
    centers = np.asarray(scene.center)
    radii = np.asarray(scene.radius)
    all_pos, all_nrm, all_idx, all_inst = [], [], [], []
    v_off = 0
    for s in range(centers.shape[0]):
        p, nn, t = make_sphere_tri_mesh(centers[s], float(radii[s]), subdiv_longitude)
        all_pos.append(p)
        all_nrm.append(nn)
        all_idx.append(t + v_off)
        all_inst.append(np.full((t.shape[0],), s, dtype=np.int32))
        v_off += p.shape[0]
    return MeshScene(
        positions=jnp.asarray(np.concatenate(all_pos)),
        normals=jnp.asarray(np.concatenate(all_nrm)),
        indices=jnp.asarray(np.concatenate(all_idx), dtype=jnp.int32),
        tri_inst=jnp.asarray(np.concatenate(all_inst), dtype=jnp.int32),
        material=scene.material,
    )


def procedural_mesh_scene(
    n_balls: int = 500,
    seed: int = 0,
    subdiv_longitude: int = 4,
    radius_range: tuple = (0.4, 1.6),
    dtype=jnp.float32,
) -> MeshScene:
    """Large procedural TRIANGLE scene for the mesh acceleration path
    (ops/mesh_accel.py) — the mesh analog of procedural_sphere_scene.

    The Cornell interior is bounded by QUAD walls (2 triangles per face,
    exactly on the planes the 1e5-radius wall spheres define: x=1, x=99,
    y=0, y=81.6, z=0, z=170) plus a ceiling light quad, instead of
    tessellating the giant spheres — 14 wall-class triangles land in the
    accel's always-swept global block (one chunk) where 8 tessellated
    walls would contribute thousands. Balls are lat/long tessellations
    (make_sphere_tri_mesh) scattered in the same volume / radius / BSDF
    mix as the sphere variant.

    Default size: 500 balls x 64 tris = ~32k triangles — 100x the brute
    Cornell mesh workload, with a VMEM-resident table (~2 MB)."""
    rng = np.random.default_rng(seed)
    wall_mats = [
        ((0, 0, 0), (0.75, 0.25, 0.25), DIFF),   # left  x=1
        ((0, 0, 0), (0.25, 0.25, 0.75), DIFF),   # right x=99
        ((0, 0, 0), (0.75, 0.75, 0.75), DIFF),   # back  z=0
        ((0, 0, 0), (0, 0, 0), DIFF),            # front z=170
        ((0, 0, 0), (0.75, 0.75, 0.75), DIFF),   # floor y=0
        ((0, 0, 0), (0.75, 0.75, 0.75), DIFF),   # ceil  y=81.6
        ((12, 12, 12), (0, 0, 0), DIFF),         # light quad
    ]

    def quad(p0, p1, p2, p3, normal):
        pos = np.asarray([p0, p1, p2, p3], np.float64)
        nrm = np.tile(np.asarray(normal, np.float64), (4, 1))
        idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int64)
        return pos, nrm, idx

    x0, x1, y0, y1, z0, z1 = 1.0, 99.0, 0.0, 81.6, 0.0, 170.0
    instances = [
        (*quad((x0, y0, z0), (x0, y0, z1), (x0, y1, z1), (x0, y1, z0),
               (1, 0, 0)), None, wall_mats[0]),
        (*quad((x1, y0, z0), (x1, y1, z0), (x1, y1, z1), (x1, y0, z1),
               (-1, 0, 0)), None, wall_mats[1]),
        (*quad((x0, y0, z0), (x0, y1, z0), (x1, y1, z0), (x1, y0, z0),
               (0, 0, 1)), None, wall_mats[2]),
        (*quad((x0, y0, z1), (x1, y0, z1), (x1, y1, z1), (x0, y1, z1),
               (0, 0, -1)), None, wall_mats[3]),
        (*quad((x0, y0, z0), (x1, y0, z0), (x1, y0, z1), (x0, y0, z1),
               (0, 1, 0)), None, wall_mats[4]),
        (*quad((x0, y1, z0), (x0, y1, z1), (x1, y1, z1), (x1, y1, z0),
               (0, -1, 0)), None, wall_mats[5]),
        (*quad((35, y1 - 0.02, 66.6), (35, y1 - 0.02, 96.6),
               (65, y1 - 0.02, 96.6), (65, y1 - 0.02, 66.6),
               (0, -1, 0)), None, wall_mats[6]),
    ]

    centers = rng.uniform([5, 5, 20], [95, 75, 150], size=(n_balls, 3))
    radii = rng.uniform(radius_range[0], radius_range[1], size=(n_balls,))
    albedo = rng.uniform(0.2, 0.95, size=(n_balls, 3))
    refl = rng.choice([DIFF, SPEC, REFR], p=[0.8, 0.1, 0.1], size=(n_balls,))
    for b in range(n_balls):
        p, nn, t = make_sphere_tri_mesh(
            centers[b], float(radii[b]), subdiv_longitude
        )
        instances.append(
            (p, nn, t, None, ((0, 0, 0), tuple(albedo[b]), int(refl[b])))
        )
    return make_instanced_mesh_scene(instances, dtype=dtype)


def transform_points(t34, p):
    """Apply a (3,4) affine transform to (N,3) points (row-vector form)."""
    t34 = np.asarray(t34, np.float64)
    return p @ t34[:, :3].T + t34[:, 3]


def make_instanced_mesh_scene(instances, dtype=jnp.float32) -> MeshScene:
    """Build a MeshScene from per-instance (mesh, transform) pairs — the
    OptiX instance model (rtpModelSetInstances with per-instance 3x4
    transforms, smallpt.cpp:518-530), TPU-first: transforms are BAKED into
    the flattened triangle table at build time (XLA wants one static
    geometry buffer, not per-instance indirection at traversal; the
    reference's own build step similarly re-finalizes the instanced model
    up front).

    instances: list of (positions (V,3), normals (V,3), indices (T,3),
    transform (3,4) or None, material (emission3, albedo3, refl)).
    Normals are transformed by the inverse-transpose of the linear part and
    re-normalized (correct under non-uniform scale)."""
    all_pos, all_nrm, all_idx, all_inst, mats = [], [], [], [], []
    v_off = 0
    for inst_id, (pos, nrm, idx, t34, mat) in enumerate(instances):
        pos = np.asarray(pos, np.float64)
        nrm = np.asarray(nrm, np.float64)
        idx = np.asarray(idx, np.int64)
        if t34 is not None:
            t34 = np.asarray(t34, np.float64)
            if t34.shape != (3, 4):
                raise ValueError(f"transform must be (3,4), got {t34.shape}")
            pos = transform_points(t34, pos)
            lin_it = np.linalg.inv(t34[:, :3]).T
            nrm = nrm @ lin_it.T
            nrm /= np.maximum(
                np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20
            )
        all_pos.append(pos)
        all_nrm.append(nrm)
        all_idx.append(idx + v_off)
        all_inst.append(np.full((idx.shape[0],), inst_id, np.int32))
        mats.append(mat)
        v_off += pos.shape[0]
    return MeshScene(
        positions=jnp.asarray(np.concatenate(all_pos), dtype=dtype),
        normals=jnp.asarray(np.concatenate(all_nrm), dtype=dtype),
        indices=jnp.asarray(np.concatenate(all_idx), dtype=jnp.int32),
        tri_inst=jnp.asarray(np.concatenate(all_inst), dtype=jnp.int32),
        material=_mat(mats, dtype=dtype),
    )
