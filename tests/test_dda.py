"""Per-ray DDA grid kernel vs the brute Pallas sweep — exactness gates.

The reference cross-checks its accelerated intersector against the brute
CPU one through a shared duck-typed contract (smallpt.cpp:605 switch);
here the DDA grid kernel (ops/dda.py) is pinned against the brute kernel
(ops/intersect_pallas.py) in interpret mode: the grid only changes WHICH
pairs are tested, never the arithmetic of a tested pair, and the
(t, original-id) fold reproduces the brute tie-break. Gates: hit/miss
classification IDENTICAL, winner ids IDENTICAL, t within a few ulp (XLA
contracts FMA chains independently per program — ~0.3% of lanes differ
by ~1 ulp with the same winner; see ops/dda.py docstring).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from smallpt_tpu.core.scene import cornell_box_scene, procedural_sphere_scene
from smallpt_tpu.ops.dda import build_dda_grid, intersect_spheres_dda
from smallpt_tpu.ops.intersect_pallas import intersect_spheres_pallas


def _rays(n, seed=0, inside=True):
    rng = np.random.default_rng(seed)
    if inside:
        org = rng.uniform([5, 5, 20], [95, 75, 150], (n, 3))
    else:
        org = rng.uniform([-40, -40, 170], [140, 120, 320], (n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(org, jnp.float32), jnp.asarray(d, jnp.float32)


def _assert_bit_exact(scene, grid, org, dirs):
    h_ref = intersect_spheres_pallas(org, dirs, scene, want_uv=False)
    h_dda = intersect_spheres_dda(org, dirs, scene, grid, want_uv=False)
    tr = np.asarray(h_ref.t)
    td = np.asarray(h_dda.t)
    hit_r = np.isfinite(tr)
    hit_d = np.isfinite(td)
    np.testing.assert_array_equal(hit_r, hit_d)
    # identical pairs tested with the identical op sequence; only FMA
    # contraction (per-program compiler choice) separates them
    np.testing.assert_allclose(tr[hit_r], td[hit_r], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(h_ref.inst)[hit_r], np.asarray(h_dda.inst)[hit_r]
    )


@pytest.mark.parametrize("inside", [True, False], ids=["inside", "outside"])
def test_procedural_bit_exact(inside):
    scene = procedural_sphere_scene(800)
    grid = build_dda_grid(scene, occ_target=16.0)
    org, dirs = _rays(2048, seed=1, inside=inside)
    _assert_bit_exact(scene, grid, org, dirs)


def test_cornell_bit_exact():
    # only 2-3 local spheres: degenerate near-empty grid
    scene = cornell_box_scene()
    grid = build_dda_grid(scene, occ_target=4.0)
    org, dirs = _rays(1024, seed=2)
    _assert_bit_exact(scene, grid, org, dirs)


def test_overflow_path():
    # force per-cell capacity overflow: a coarse grid with tiny k_max
    scene = procedural_sphere_scene(600)
    grid = build_dda_grid(scene, nb=(2, 2, 2), k_max=48)
    assert grid.n_overflow > 0, "expected spheres to overflow k_max=48"
    org, dirs = _rays(1024, seed=3)
    _assert_bit_exact(scene, grid, org, dirs)


def test_axis_aligned_and_boundary_rays():
    scene = procedural_sphere_scene(400)
    grid = build_dda_grid(scene, occ_target=16.0)
    rng = np.random.default_rng(4)
    n = 1024
    org = rng.uniform([5, 5, 20], [95, 75, 150], (n, 3))
    # exact grid-corner / face origins for some lanes
    org[:64] = np.asarray(grid.lo)
    org[64:128, 0] = grid.lo[0]
    axes = np.eye(3)
    d = axes[rng.integers(0, 3, n)] * rng.choice([-1.0, 1.0], (n, 1))
    _assert_bit_exact(
        scene, grid,
        jnp.asarray(org, jnp.float32), jnp.asarray(d, jnp.float32),
    )


def test_grid_shapes_and_split():
    scene = procedural_sphere_scene(800)
    grid = build_dda_grid(scene, occ_target=16.0)
    assert grid.k % 8 == 0
    assert grid.cells3.shape == (3, 5 * grid.k, grid.n_cells)
    # exact bf16x3 reconstruction of the packed table
    v = np.asarray(grid.cells3)
    recon = v[0] + v[1] + v[2]
    assert np.isfinite(recon).all()
