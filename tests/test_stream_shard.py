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
