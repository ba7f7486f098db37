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


def test_stream_keying_v2_unique_across_v1_wrap():
    """v1 packed sid = pixel + n_pixels*ip into ONE int32: at 1024x768
    (n_pixels = 3*2^18), (pixel, ip) and (pixel, ip + 16384) produced the
    IDENTICAL key word (3*2^18 * 2^14 = 3*2^32 === 0 mod 2^32) — duplicated
    uniforms well inside config 5's 5000-spp budget. v2 keys (pixel, ip) as
    separate PCG4D words (core/rng.py::stream_key_words); this pins that the
    colliding pairs now draw distinct streams."""
    n_pixels = 1024 * 768
    key = prng.base_key(7)
    pixel = jnp.arange(0, n_pixels, 12345, dtype=jnp.int32)
    ip0 = jnp.full_like(pixel, 100)
    ip1 = ip0 + 16384

    # the v1 scheme's collision, pinned explicitly (int32 wraparound)
    with np.errstate(over="ignore"):
        sid0 = np.asarray(pixel) + np.int32(n_pixels) * np.asarray(ip0)
        sid1 = np.asarray(pixel) + np.int32(n_pixels) * np.asarray(ip1)
    assert (sid0 == sid1).all(), "v1 wrap premise broken — update the test"

    u0 = np.asarray(prng.stream_camera_uniforms(key, pixel, ip0))
    u1 = np.asarray(prng.stream_camera_uniforms(key, pixel, ip1))
    # every formerly-colliding pair now has an independent draw
    per_pair_equal = np.all(u0 == u1, axis=-1)
    assert not per_pair_equal.any()


def test_stream_keying_v2_well_distributed_past_wrap():
    """Uniforms drawn for ip far past the v1 wrap stay uniform (mean ~0.5,
    no collapsed variance) — the v1 failure mode was duplicated streams,
    i.e. added samples stopped reducing variance."""
    key = prng.base_key(3)
    pixel = jnp.zeros((4096,), jnp.int32) + 12345
    ip = jnp.arange(4096, dtype=jnp.int32) + 2_000_000  # >> any real budget
    u = np.asarray(prng.stream_camera_uniforms(key, pixel, ip))
    assert abs(u.mean() - 0.5) < 0.02
    assert abs(np.var(u) - 1.0 / 12.0) < 0.01
    # all draws distinct (collision prob over 4096 24-bit pairs is ~tiny)
    packed = (u[:, 0] * (1 << 24)).astype(np.int64) * (1 << 25) + (
        u[:, 1] * (1 << 24)
    ).astype(np.int64)
    assert len(np.unique(packed)) > 4090


def test_v1_checkpoint_refused(tmp_path):
    """A checkpoint without the v2 stream-key version marker must be refused
    (resuming it would mix v1 and v2 sample streams)."""
    r = StreamingRenderer(cornell_box_scene(), smallpt_camera(), CFG, seed=0)
    r.step(n_iters=4, add_samples=1)
    p = str(tmp_path / "ck.npz")
    r.save_checkpoint(p)
    data = dict(np.load(p))
    del data["stream_key_version"]  # forge a v1-era checkpoint
    np.savez(p, **data)
    with pytest.raises(ValueError, match="keying v1"):
        r.load_checkpoint(p)


def test_step_timed_equal_time_mode():
    """Equal-time stepping produces valid progressive state and adapts its
    iteration budget from measured throughput."""
    r = StreamingRenderer(cornell_box_scene(), smallpt_camera(), CFG, seed=0)
    total = 0
    for _ in range(3):
        total += r.step_timed(target_ms=50.0, add_samples=2)
    assert total > 0
    assert getattr(r, "_iters_per_s") > 0
    r.flush()
    _, w = r.accumulators()
    assert (np.asarray(w) == 6).all()


def test_step_to_quality_reaches_target_or_budget():
    """Equal-quality stopping: the driver must (a) terminate, (b) drain
    exactly, (c) either hit the stderr target or exhaust max_spp, and
    (d) spend more samples on higher-variance pixels (adaptive path)."""
    from smallpt_tpu.ops.megakernel import stream_variance

    r = StreamingRenderer(cornell_box_scene(), smallpt_camera(), CFG, seed=5)
    q = r.step_to_quality(rel_err=0.25, quantile=0.9, max_spp=64,
                          min_spp=8, n_iters=2048)
    assert q["spp_min"] >= 8
    _, w = r.accumulators()
    w = np.asarray(w)
    # drained: weights equal the final budgets (min >= spp_min)
    assert w.min() >= q["spp_min"]
    mean, var, n = stream_variance(r.f, r.i, r.config)
    n = np.asarray(n).reshape(-1)
    assert (n >= 2).all()
    stderr = np.sqrt(np.maximum(np.asarray(var).reshape(-1), 0) / n) / (
        np.abs(np.asarray(mean).reshape(-1)) + 1e-2
    )
    hit_target = float(np.quantile(stderr, 0.9)) <= 0.25
    out_of_budget = q["spp_max"] >= 64
    assert hit_target or out_of_budget, q
    if q["spp_max"] > q["spp_min"]:
        # adaptive allocation engaged: budgets differ across pixels
        assert w.max() > w.min()


def test_step_to_quality_respects_max_spp():
    r = StreamingRenderer(cornell_box_scene(), smallpt_camera(), CFG, seed=6)
    q = r.step_to_quality(rel_err=1e-5, quantile=0.95, max_spp=12,
                          min_spp=4, n_iters=2048)
    # an unreachable target must stop at the budget cap, drained
    assert q["spp_max"] >= 12
    _, w = r.accumulators()
    assert np.asarray(w).min() >= 4


def test_launch_cap_bitexact():
    """max_launch_iters splits a step into chained launches without
    changing the result: the r5e config-5 soak crashed the TPU worker on a
    single minutes-long launch; the cap is the fix and must be a pure
    re-chunking (placement-invariant keying makes it so)."""
    scene, cam = cornell_box_scene(), smallpt_camera()
    a = StreamingRenderer(scene, cam, CFG, seed=5)
    a.step(n_iters=24, add_samples=4)
    a.flush()

    b = StreamingRenderer(scene, cam, CFG, seed=5)
    b.max_launch_iters = 5  # 24 -> 5+5+5+5+4, flush rounds capped too
    b.step(n_iters=24, add_samples=4)
    b.flush()
    rad_a, w_a = a.accumulators()
    rad_b, w_b = b.accumulators()
    np.testing.assert_array_equal(np.asarray(rad_a), np.asarray(rad_b))
    np.testing.assert_array_equal(np.asarray(w_a), np.asarray(w_b))


def test_checkpoint_wrong_resolution_refused(tmp_path):
    """A checkpoint from another resolution must be rejected at load (full
    shape check, lane count included): before r5, a rows-only check let a
    stale toy-shape file into a 1080p renderer, which then broadcast-crashed
    deep inside set_sample_budget on the first step."""
    scene, cam = cornell_box_scene(), smallpt_camera()
    a = StreamingRenderer(scene, cam, CFG, seed=2)
    a.step(n_iters=4, add_samples=1)
    path = str(tmp_path / "small.npz")
    a.save_checkpoint(path)

    big = CFG.replace(width=128, height=96)  # 12288 lanes -> 2 tiles (16x12 pads to 1)
    b = StreamingRenderer(scene, cam, big, seed=2)
    with pytest.raises(ValueError, match="incompatible stream checkpoint"):
        b.load_checkpoint(path)


def test_capped_flush_drains_large_backlog():
    """Capped flush rounds vs a big outstanding backlog: while lanes still
    owe samples, (n_alive, n_can_regen) sits CONSTANT across rounds — the
    r5f config-5 solo flush crashed on the old single-round equality
    heuristic after rendering all 5000 spp. The capped drain must finish
    and match the uncapped result exactly."""
    scene, cam = cornell_box_scene(), smallpt_camera()
    a = StreamingRenderer(scene, cam, CFG, seed=7)
    a.step(n_iters=2, add_samples=20)  # huge backlog vs tiny advance
    a.flush()

    b = StreamingRenderer(scene, cam, CFG, seed=7)
    b.max_launch_iters = 3
    b.step(n_iters=2, add_samples=20)
    b.flush()  # old heuristic raised here on round 2
    rad_a, w_a = a.accumulators()
    rad_b, w_b = b.accumulators()
    np.testing.assert_array_equal(np.asarray(w_a), np.asarray(w_b))
    np.testing.assert_array_equal(np.asarray(rad_a), np.asarray(rad_b))
    assert (np.asarray(w_b) == 20).all()
