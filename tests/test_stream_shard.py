"""Sharded streaming renderer on the virtual 8-device mesh."""

import numpy as np
import pytest
import jax

from smallpt_tpu.config import RenderConfig, Filter, CameraModel
from smallpt_tpu.core.scene import cornell_box_scene
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.engine.streaming import StreamingRenderer
from smallpt_tpu.parallel.shard import make_mesh
from smallpt_tpu.parallel.stream_shard import ShardedStreamingRenderer

CFG = RenderConfig(width=16, height=8, spp_per_cell=1, max_depth=6,
                   camera_model=CameraModel.LEGACY, filter=Filter.TENT)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(4, 2, devices=jax.devices("cpu")[:8])


def test_sharded_stream_drain_and_weights(mesh):
    r = ShardedStreamingRenderer(cornell_box_scene(), smallpt_camera(), CFG,
                                 mesh, seed=0)
    r.step(n_iters=16, add_samples=2)
    r.step(n_iters=16, add_samples=2)
    r.flush()
    rad, w = r.accumulators()
    w = np.asarray(w)
    assert w.shape == (CFG.height, CFG.width)
    # 4 per-shard samples x 2 sample shards = 8 spp everywhere
    assert (w == 8).all(), (w.min(), w.max())
    assert r.spp_total == 8
    img = r.image
    assert np.isfinite(img).all() and img.mean() > 0.05


def test_sharded_matches_single_statistically(mesh):
    scene, cam = cornell_box_scene(), smallpt_camera()
    rs = ShardedStreamingRenderer(scene, cam, CFG, mesh, seed=0)
    rs.step(n_iters=2000, add_samples=48)  # 96 spp total
    rs.flush()
    a = rs.image

    r1 = StreamingRenderer(scene, cam, CFG, seed=1)
    r1.step(n_iters=4000, add_samples=96)
    r1.flush()
    b = r1.image
    assert abs(a.mean() - b.mean()) < 0.1 * (b.mean() + 0.05)


def test_sharded_deterministic(mesh):
    scene, cam = cornell_box_scene(), smallpt_camera()
    imgs = []
    for _ in range(2):
        r = ShardedStreamingRenderer(scene, cam, CFG, mesh, seed=3)
        r.step(n_iters=100, add_samples=4)
        r.flush()
        imgs.append(r.image)
    np.testing.assert_array_equal(imgs[0], imgs[1])


def test_sharded_dda_matches_sharded_classic(mesh):
    """Big-scene sharded streaming auto-routes to the DDA kernel and
    matches the classic sharded engine exactly on weights / tightly on
    radiance (same per-shard streams, same transport arithmetic up to FMA
    contraction)."""
    from smallpt_tpu.core.scene import procedural_sphere_scene

    scene, cam = procedural_sphere_scene(2100), smallpt_camera()
    r_dda = ShardedStreamingRenderer(scene, cam, CFG, mesh, seed=5)
    assert r_dda._dda is not None, "big scene should auto-route to DDA"
    r_cls = ShardedStreamingRenderer(scene, cam, CFG, mesh, seed=5,
                                     dda=False)
    for r in (r_dda, r_cls):
        r.step(n_iters=CFG.max_depth * 4, add_samples=2)
        r.flush()
    rad_a, w_a = r_dda.accumulators()
    rad_b, w_b = r_cls.accumulators()
    np.testing.assert_array_equal(np.asarray(w_a), np.asarray(w_b))
    np.testing.assert_allclose(np.asarray(rad_a), np.asarray(rad_b),
                               rtol=2e-4, atol=2e-3)
