"""Sharded BINNED streaming (parallel/binned_shard.py) on the virtual
8-device CPU mesh.

The load-bearing pin: a (tile x sample) sharded binned render is
BIT-EQUAL to the single-device BinnedStreamingRenderer with
n_streams = n_sample — row-band tiling is invisible (lane keying rides
the global pixel-id plane; the culled kernel's min-fold is
sweep-set-invariant), and the sample axis reproduces the multi-stream
ip_offset decomposition exactly.
"""

import numpy as np
import pytest
import jax

from smallpt_tpu.config import RenderConfig, Filter, CameraModel
from smallpt_tpu.core.scene import procedural_sphere_scene
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.engine.binned import BinnedStreamingRenderer
from smallpt_tpu.parallel.shard import make_mesh
from smallpt_tpu.parallel.binned_shard import ShardedBinnedRenderer

CFG = RenderConfig(width=24, height=16, spp_per_cell=1, max_depth=8,
                   camera_model=CameraModel.LEGACY, filter=Filter.TENT)
SCENE = procedural_sphere_scene(80, seed=3)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(4, 2, devices=jax.devices("cpu")[:8])


def _drain(r, add, n_bounces=6):
    r.step(add_samples=add, n_bounces=n_bounces)
    r.flush()
    rad, w = r.accumulators()
    return np.asarray(rad), np.asarray(w)


def test_sharded_binned_drain_and_weights(mesh):
    r = ShardedBinnedRenderer(SCENE, smallpt_camera(), CFG, mesh, seed=0)
    rad, w = _drain(r, add=2)
    assert w.shape == (CFG.height, CFG.width)
    # 2 per-shard samples x 2 sample shards = 4 spp everywhere, exact
    assert (w == 4).all(), (w.min(), w.max())
    assert r.spp_total == 4
    img = r.image
    assert np.isfinite(img).all() and img.mean() > 0.01


def test_sharded_binned_bit_matches_single_multistream(mesh):
    """(4 tile x 2 sample) mesh == single-device n_streams=2, bit-for-bit
    (same streams: shard s and stream s share ip_offset = s*IP_STRIDE;
    per-pixel budgets match: 3 per shard vs 6 split across 2 streams)."""
    cam = smallpt_camera()
    rs = ShardedBinnedRenderer(SCENE, cam, CFG, mesh, seed=0)
    rad_s, w_s = _drain(rs, add=3)

    r1 = BinnedStreamingRenderer(SCENE, cam, CFG, seed=0, n_streams=2)
    rad_1, w_1 = _drain(r1, add=6)
    np.testing.assert_array_equal(w_s, w_1)
    np.testing.assert_array_equal(rad_s, rad_1)


def test_sharded_binned_tile_axis_invariance():
    """Re-sharding the TILE axis never changes the image (the sample axis
    carve-out does not apply: both meshes have n_sample=2)."""
    cam = smallpt_camera()
    cpus = jax.devices("cpu")
    m_a = make_mesh(2, 2, devices=cpus[:4])
    m_b = make_mesh(4, 2, devices=cpus[:8])
    ra = ShardedBinnedRenderer(SCENE, cam, CFG, m_a, seed=0)
    rb = ShardedBinnedRenderer(SCENE, cam, CFG, m_b, seed=0)
    rad_a, w_a = _drain(ra, add=2)
    rad_b, w_b = _drain(rb, add=2)
    np.testing.assert_array_equal(w_a, w_b)
    np.testing.assert_array_equal(rad_a, rad_b)


def test_sharded_binned_nee_bit_matches_single(mesh):
    """NEE on the sharded binned path: the deferred shadow machinery is
    per-lane arithmetic over replicated accel tables, so the (tile x
    sample) decomposition stays bit-equal to the single-device
    multi-stream renderer — now with explicit light sampling on."""
    cfg = CFG.replace(nee_lights=(8,))
    cam = smallpt_camera()
    rs = ShardedBinnedRenderer(SCENE, cam, cfg, mesh, seed=0)
    rad_s, w_s = _drain(rs, add=2)
    assert (w_s == 4).all()

    r1 = BinnedStreamingRenderer(SCENE, cam, cfg, seed=0, n_streams=2)
    rad_1, w_1 = _drain(r1, add=4)
    assert (w_s == w_1).all()
    assert (rad_s == rad_1).all()
