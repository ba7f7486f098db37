"""Streaming (continuous-wavefront) renderer tests.

Pins: exactness after flush (weights == budget everywhere, image matches the
per-pass renderer statistically), monotone convergence, and the occupancy
advantage that motivates the mode."""

import numpy as np
import pytest
import jax.numpy as jnp

from smallpt_tpu.config import RenderConfig, Filter, CameraModel, Scheduler
from smallpt_tpu.core.scene import cornell_box_scene
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core import rng as prng
from smallpt_tpu.engine.renderer import render_image
from smallpt_tpu.engine.streaming import StreamingRenderer

CFG = RenderConfig(width=16, height=12, spp_per_cell=1, max_depth=8,
                   camera_model=CameraModel.LEGACY, filter=Filter.TENT)


def test_flush_exact_weights():
    r = StreamingRenderer(cornell_box_scene(), smallpt_camera(), CFG, seed=0)
    r.step(n_iters=16, add_samples=4)
    r.step(n_iters=16, add_samples=4)
    r.flush()
    _, w = r.accumulators()
    w = np.asarray(w)
    assert (w == 8).all(), (w.min(), w.max())


def test_streaming_matches_perpass_statistically():
    """Different sample streams (streaming keying) but the same estimator:
    at moderate spp the two renderers agree within MC noise."""
    scene, cam = cornell_box_scene(), smallpt_camera()
    r = StreamingRenderer(scene, cam, CFG, seed=0)
    r.step(n_iters=8, add_samples=32)
    r.flush()
    a = r.image
    b = np.asarray(render_image(scene, cam, CFG, seed=1, n_passes=8))
    # 32 spp vs 32 spp, independent streams: means agree a few percent
    assert abs(a.mean() - b.mean()) < 0.08 * (b.mean() + 0.05)
    close = np.isclose(a, b, rtol=0.5, atol=0.25)
    # glass-caustic pixels are high-variance at 32 spp — most pixels agree
    assert close.mean() > 0.75


def test_partial_step_shows_progress():
    r = StreamingRenderer(cornell_box_scene(), smallpt_camera(), CFG, seed=3)
    rays1 = r.step(n_iters=4, add_samples=100)
    img1 = r.image
    rays2 = r.step(n_iters=4, add_samples=0)
    img2 = r.image
    assert rays1 > 0 and rays2 > 0
    # near-full occupancy while the budget lasts: every iteration traces
    # close to one ray per lane
    G = CFG.n_pixels
    assert rays1 >= 0.99 * 4 * G
    assert rays2 >= 0.99 * 4 * G
    assert not np.array_equal(img1, img2)


def test_checkpoint_resume_bitexact(tmp_path):
    """Stream checkpoint/resume: save mid-flight, resume, finish — must equal
    the uninterrupted run bit-for-bit (SURVEY.md §5.4)."""
    scene, cam = cornell_box_scene(), smallpt_camera()
    a = StreamingRenderer(scene, cam, CFG, seed=11)
    a.step(n_iters=7, add_samples=4)
    path = str(tmp_path / "stream.npz")
    a.save_checkpoint(path)
    a.step(n_iters=64, add_samples=2)
    a.flush()

    b = StreamingRenderer(scene, cam, CFG, seed=11)
    b.load_checkpoint(path)
    b.step(n_iters=64, add_samples=2)
    b.flush()
    np.testing.assert_array_equal(a.image, b.image)


def test_camera_update_resets(tmp_path):
    scene, cam = cornell_box_scene(), smallpt_camera()
    r = StreamingRenderer(scene, cam, CFG, seed=1)
    r.step(n_iters=8, add_samples=2)
    assert r.budget == 2
    r.update_camera(cam._replace(origin=cam.origin + 1.0))
    assert r.budget == 0
    _, w = r.accumulators()
    assert int(np.asarray(w).sum()) == 0


def test_adaptive_sampling_allocates_by_variance():
    """Variance-adaptive stepping: noisy pixels (glass/caustics) receive
    more samples than flat wall pixels, weights normalize per pixel, and
    flush still drains to an exact heterogeneous estimate."""
    from smallpt_tpu.ops.megakernel import stream_variance

    r = StreamingRenderer(cornell_box_scene(), smallpt_camera(), CFG, seed=4)
    # bootstrap: uniform samples to seed the variance estimate
    r.step(n_iters=64, add_samples=4)
    r.flush()
    _, var, n = stream_variance(r.f, r.i, r.config)
    var = np.asarray(var)
    assert (np.asarray(n) == 4).all()
    assert var.max() > 0  # some pixels are noisy

    # two adaptive rounds
    for _ in range(2):
        r.step_adaptive(n_iters=400, add_samples_total=2 * CFG.n_pixels)
    r.flush()
    _, w = r.accumulators()
    w = np.asarray(w)
    assert w.min() >= 4  # bootstrap budget retained everywhere
    assert w.max() > w.min()  # heterogeneous allocation happened
    # allocation followed the variance signal: the noisiest decile of
    # pixels got more average samples than the quietest decile
    flat_v = var.reshape(-1)
    flat_w = w.reshape(-1)
    hi = flat_w[np.argsort(flat_v)[-len(flat_v) // 10:]]
    lo = flat_w[np.argsort(flat_v)[: len(flat_v) // 10]]
    assert hi.mean() > lo.mean() + 0.5, (hi.mean(), lo.mean())
    # image remains a sane estimate under heterogeneous weights
    img = r.image
    assert np.isfinite(img).all() and img.mean() > 0.05


def test_weights_monotone_and_capped():
    r = StreamingRenderer(cornell_box_scene(), smallpt_camera(), CFG, seed=5)
    r.step(n_iters=6, add_samples=2)
    _, w1 = r.accumulators()
    r.step(n_iters=6, add_samples=2)
    _, w2 = r.accumulators()
    w1, w2 = np.asarray(w1), np.asarray(w2)
    assert (w2 >= w1).all()
    assert w2.max() <= 4
