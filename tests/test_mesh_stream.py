"""Continuous-wavefront streaming for mesh scenes (engine/mesh_stream.py).

The engine composes existing pieces — stream-keyed regeneration, the
culled/brute mesh intersect backends, bounce_step shading with injected
stream uniforms — into one relaunched XLA program per bounce. Pins:
oracle stream-replay parity (the strongest gate: same (pixel, ip, depth)
uniforms, path-for-path), estimator agreement with the per-pass REGEN
scheduler, exact drain weights, intersect-backend invariance, and the
feature matrix (NEE area lights, env, DoF)."""

import numpy as np
import pytest

import jax.numpy as jnp

from smallpt_tpu.config import RenderConfig, Filter, CameraModel, Mode
from smallpt_tpu.core.scene import procedural_mesh_scene, two_sphere_scene
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core import rng as prng
from smallpt_tpu.engine.mesh_stream import WavefrontStreamingRenderer
from smallpt_tpu.engine.renderer import render
from smallpt_tpu.oracle.numpy_oracle import Oracle, StreamUniformProvider

SCENE = procedural_mesh_scene(n_balls=2, subdiv_longitude=3, seed=1)
CFG = RenderConfig(width=12, height=10, spp_per_cell=1, max_depth=8,
                   camera_model=CameraModel.LEGACY, filter=Filter.TENT)


def _run(scene, cfg, spp, seed=0, n_bounces=24):
    r = WavefrontStreamingRenderer(scene, smallpt_camera(), cfg, seed=seed)
    r.step(n_bounces=n_bounces, add_samples=spp)
    r.flush()
    rad, w = r.accumulators()
    return np.asarray(rad), np.asarray(w)


def test_flush_exact_weights():
    rad, w = _run(SCENE, CFG, spp=3)
    assert (w == 3).all()
    assert np.isfinite(rad).all() and rad.sum() > 0


def test_oracle_stream_replay_parity():
    """The f64 oracle replays the exact streaming decision streams
    (StreamUniformProvider): path-for-path agreement."""
    cfg = CFG
    key = prng.base_key(0)
    r = WavefrontStreamingRenderer(SCENE, smallpt_camera(), cfg, seed=0)
    assert (np.asarray(prng.base_key(0)) == np.asarray(r.key)).all()
    r.step(n_bounces=24, add_samples=cfg.spp)  # budget == spp: ip in [0,spp)
    r.flush()
    rad, w = r.accumulators()
    assert (w == cfg.spp).all()

    sids = np.arange(cfg.n_pixels * cfg.spp, dtype=np.int64)
    oracle = Oracle(SCENE, smallpt_camera(), cfg,
                    StreamUniformProvider(key, cfg, sids))
    oimg = oracle.render()
    rel = np.abs(rad - oimg) / (1.0 + np.abs(oimg))
    assert (rel > 0.1).mean() <= 0.03, (rel > 0.1).mean()
    assert abs(rad.mean() - oimg.mean()) < 0.1 * (abs(oimg.mean()) + 0.1)


def test_matches_perpass_regen_statistically():
    """Same estimator, different (streaming vs per-pass) keying. The
    light quad's 12-radiance direct/indirect hits quantize pixel values
    in units of 12/spp, so the closeness atol is scaled in sample quanta
    (the cross-stream-comparison discipline of test_binned_aov)."""
    spp = 64
    cfg = CFG.replace(spp_per_cell=spp // 4)
    img_p = np.asarray(
        render(SCENE, smallpt_camera(), cfg, prng.base_key(1))
    ) / cfg.spp
    rad, w = _run(SCENE, CFG, spp=spp, seed=1, n_bounces=16)
    img_s = rad / np.maximum(w[..., None], 1)
    close = np.isclose(img_s, img_p, rtol=0.2, atol=3 * 12 / spp)
    assert close.mean() > 0.9, close.mean()
    assert abs(img_s.mean() - img_p.mean()) < 0.08 * (img_p.mean() + 0.05)


def test_intersect_backend_invariance():
    """Culled and brute mesh backends find identical hits (pinned at the
    kernel level); the streaming image must be bit-identical under either
    — and under the pure-JAX chunked intersector too (statistically: a
    different compiled reduction order can flip razor hits)."""
    from smallpt_tpu.config import Intersector

    cfg_p = CFG.replace(intersector=Intersector.PALLAS)
    a, wa = _run(SCENE, cfg_p, spp=2)
    # force the accel route regardless of the size threshold (the module
    # attribute is the live knob; the env var is only read at import time)
    from smallpt_tpu.engine import renderer as R

    old = R.MESH_ACCEL_MIN_TRIS
    R.MESH_ACCEL_MIN_TRIS = 1
    try:
        b, wb = _run(SCENE, cfg_p, spp=2)
    finally:
        R.MESH_ACCEL_MIN_TRIS = old
    assert (wa == wb).all()
    assert (a == b).all()


def test_streaming_mesh_nee_and_env():
    """The streaming engine serves the full feature matrix: triangle
    area-light NEE + env stay unbiased vs the plain estimator."""
    cfg = CFG.replace(nee_lights=(6,), env_emission=(0.1, 0.15, 0.25),
                      max_depth=6)
    # the 12-radiance light quad quantizes global means in ~12/(G*spp)
    # jumps: 256 spp puts 1 sigma of the mean at ~1.5% (measured 1.1%
    # nee-vs-plain agreement at 512 spp)
    rad_n, w_n = _run(SCENE, cfg, spp=256, seed=2, n_bounces=16)
    rad_p, w_p = _run(SCENE, cfg.replace(nee_lights=()), spp=256, seed=3,
                      n_bounces=16)
    m_n = rad_n.sum() / (3 * w_n.sum())
    m_p = rad_p.sum() / (3 * w_p.sum())
    assert abs(m_n - m_p) < 0.05 * (m_p + 0.05), (m_n, m_p)


def test_sphere_scene_supported_too():
    """Geometry-agnostic: the engine runs sphere scenes through the same
    XLA path (the Pallas streaming megakernel remains the fast choice)."""
    rad, w = _run(two_sphere_scene(), CFG, spp=2)
    assert (w == 2).all() and rad.sum() > 0


def test_rejects_unsupported_configs():
    cam = smallpt_camera()
    with pytest.raises(ValueError, match="split_budget"):
        WavefrontStreamingRenderer(SCENE, cam, CFG.replace(split_budget=2))
    with pytest.raises(ValueError, match="Mode.FULL"):
        WavefrontStreamingRenderer(SCENE, cam, CFG.replace(mode=Mode.NORMAL))


def test_checkpoint_resume_bitexact(tmp_path):
    """Save mid-stream, resume, finish: bit-equal to rendering straight
    through (the classic streaming checkpoint contract)."""
    ck = str(tmp_path / "ms_ck.npz")
    a = WavefrontStreamingRenderer(SCENE, smallpt_camera(), CFG, seed=11)
    a.step(n_bounces=5, add_samples=3)
    a.save_checkpoint(ck)
    a.step(n_bounces=5, add_samples=1)
    a.flush()

    b = WavefrontStreamingRenderer(SCENE, smallpt_camera(), CFG, seed=99)
    b.load_checkpoint(ck)
    b.step(n_bounces=5, add_samples=1)
    b.flush()

    rad_a, w_a = a.accumulators()
    rad_b, w_b = b.accumulators()
    assert (np.asarray(w_a) == np.asarray(w_b)).all()
    assert (np.asarray(rad_a) == np.asarray(rad_b)).all()


def test_v1_checkpoint_refused(tmp_path):
    ck = str(tmp_path / "old.npz")
    a = WavefrontStreamingRenderer(SCENE, smallpt_camera(), CFG, seed=0)
    a.step(n_bounces=2, add_samples=1)
    a.save_checkpoint(ck)
    data = dict(np.load(ck))
    data["stream_key_version"] = np.asarray(1)
    np.savez(ck, **data)
    b = WavefrontStreamingRenderer(SCENE, smallpt_camera(), CFG, seed=0)
    with pytest.raises(ValueError, match="keying"):
        b.load_checkpoint(ck)


def test_step_to_quality_mesh():
    """The shared equal-quality driver on the mesh streaming engine:
    terminates, drains, hits the target or the pool cap, and the adaptive
    allocation concentrates samples on high-variance pixels."""
    cfg = CFG.replace(max_depth=6)
    r = WavefrontStreamingRenderer(SCENE, smallpt_camera(), cfg, seed=4)
    q = r.step_to_quality(rel_err=0.3, quantile=0.9, max_spp=48,
                          min_spp=6, n_bounces=14)
    assert q["spp_min"] >= 6
    rad, w = r.accumulators()
    w = np.asarray(w)
    assert w.min() >= q["spp_min"]
    mean, var, n = r.moments()
    stderr = np.sqrt(np.maximum(var, 0) / np.maximum(n, 1)) / (
        np.abs(mean) + 1e-2
    )
    hit = float(np.quantile(stderr[n >= 2], 0.9)) <= 0.3
    assert hit or int(n.sum()) >= 48 * cfg.n_pixels * 0.95, q
    if q["spp_max"] > q["spp_min"]:
        assert w.max() > w.min()  # adaptive budgets engaged
