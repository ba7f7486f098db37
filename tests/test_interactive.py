"""Interactive session: the reference's two-thread JSON command protocol
(smallpt.cpp:890-920, 978-985) driven through a stream."""

import io
import json
import os
import subprocess
import sys
import time

import numpy as np
import pytest

from smallpt_tpu.config import RenderConfig, Filter, CameraModel
from smallpt_tpu.core.scene import cornell_box_scene
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.engine.progressive import ProgressiveRenderer
from smallpt_tpu.interactive import InteractiveSession

CFG = RenderConfig(width=12, height=10, spp_per_cell=1, max_depth=6,
                   camera_model=CameraModel.LEGACY, filter=Filter.TENT)


class SlowStream:
    """Stream that yields commands with small delays so the render loop
    interleaves with the reader thread (the two-thread architecture)."""

    def __init__(self, lines, delay=0.02):
        self.lines = lines
        self.delay = delay

    def __iter__(self):
        for line in self.lines:
            time.sleep(self.delay)
            yield line


def test_session_camera_update_resets_accumulation(tmp_path):
    r = ProgressiveRenderer(cornell_box_scene(), smallpt_camera(), CFG, seed=0)
    snap = str(tmp_path / "snap.ppm")
    stream = SlowStream([
        json.dumps({"action": "update_camera", "org": [50.0, 53.0, 295.6]}),
        json.dumps({"action": "snapshot", "path": snap}),
        json.dumps({"action": "quit"}),
    ])
    session = InteractiveSession(r, stream=stream)
    passes = session.run(max_passes=200)
    assert passes >= 1
    assert os.path.exists(snap)
    # camera actually moved
    assert float(np.asarray(r.camera.origin)[1]) == 53.0


def test_camera_update_resets_accumulation_deterministic():
    """The reset semantics pinned without reader-thread timing: a pass
    accumulates, the camera request invalidates, the next pass restarts the
    progressive count (smallpt.cpp:906-920,931-939)."""
    r = ProgressiveRenderer(cornell_box_scene(), smallpt_camera(), CFG, seed=0)
    r.step()
    assert r.sample_count == 1
    before = np.asarray(r.accum).copy()
    r.enqueue({"action": "update_camera", "org": [50.0, 53.0, 295.6]})
    r.step()
    assert r.sample_count == 1  # reset + exactly one fresh pass
    assert float(np.asarray(r.camera.origin)[1]) == 53.0
    assert not np.array_equal(before, np.asarray(r.accum))


def test_session_keyboard_nudges():
    r = ProgressiveRenderer(cornell_box_scene(), smallpt_camera(), CFG, seed=1)
    y0 = float(np.asarray(r.camera.origin)[1])
    stream = SlowStream(["u", "u", "d", json.dumps({"action": "quit"})])
    InteractiveSession(r, stream=stream).run(max_passes=300)
    y1 = float(np.asarray(r.camera.origin)[1])
    assert abs(y1 - (y0 + 0.01)) < 1e-4  # +0.01 +0.01 -0.01 (f32)


def test_session_eof_ends():
    r = ProgressiveRenderer(cornell_box_scene(), smallpt_camera(), CFG, seed=2)
    stream = SlowStream([])  # immediate EOF
    passes = InteractiveSession(r, stream=stream).run(max_passes=50)
    assert passes <= 50


# -- binned big-scene interactive surface (VERDICT r2 item 7): the
# reference's interactive app is scheduler-agnostic — its render thread
# loops the ACCELERATED backend too (smallpt.cpp:605,895-941) — so the
# protocol must drive scenes above the classic megakernel's sphere cap
# through the persistent grid-culled scheduler. -----------------------------

BIG_CFG = RenderConfig(width=24, height=16, spp_per_cell=1, max_depth=6,
                       camera_model=CameraModel.LEGACY, filter=Filter.TENT)


def _big_scene():
    from smallpt_tpu.core.scene import procedural_sphere_scene
    from smallpt_tpu.ops.megakernel import MEGA_MAX_SPHERES

    scene = procedural_sphere_scene(2100, seed=5)
    assert int(scene.center.shape[0]) > MEGA_MAX_SPHERES
    return scene


def _binned_progressive(scene=None, cfg=BIG_CFG, seed=0):
    from smallpt_tpu.engine.progressive import BinnedProgressiveRenderer

    if scene is None:
        scene = _big_scene()
    return BinnedProgressiveRenderer(scene, smallpt_camera(), cfg, seed=seed)


def test_binned_session_protocol_big_scene(tmp_path):
    """Full protocol on a >2048-sphere scene: camera update, snapshot,
    quit — through the same InteractiveSession the classic renderer uses."""
    r = _binned_progressive()
    snap = str(tmp_path / "snap_binned.ppm")
    stream = SlowStream([
        json.dumps({"action": "update_camera", "org": [50.0, 53.0, 295.6]}),
        json.dumps({"action": "snapshot", "path": snap}),
        json.dumps({"action": "quit"}),
    ], delay=0.05)
    passes = InteractiveSession(r, stream=stream).run(max_passes=60)
    assert passes >= 1
    assert os.path.exists(snap)
    assert float(np.asarray(r.camera.origin)[1]) == 53.0
    # the persistent binned wavefront was re-aimed, not left stale
    assert r._r.camera is r.camera


def test_binned_camera_update_resets_wavefront_deterministic():
    """Reset semantics without reader-thread timing: a camera request must
    restart the binned wavefront (fresh budgets, fresh planes, cam_vec
    recomputed) — smallpt.cpp:906-920,931-939 on the accelerated path."""
    r = _binned_progressive()
    r.step()
    assert r.sample_count == 1
    before = r.image.copy()
    cam_vec_before = np.asarray(r._r.cam_vec).copy()
    r.enqueue({"action": "update_camera", "org": [50.0, 53.0, 295.6]})
    r.step()
    assert r.sample_count == 1  # reset + exactly one fresh pass
    assert not np.array_equal(cam_vec_before, np.asarray(r._r.cam_vec))
    assert not np.array_equal(before, r.image)
    # budgets restarted: exactly one pass worth of samples outstanding
    assert r._r.budget == BIG_CFG.spp


def test_binned_scene_update_rebuilds_accel():
    """A geometry edit must rebuild the grid accel (chunk AABBs/reach
    tables are geometry-dependent) and restart accumulation."""
    from smallpt_tpu.core.scene import procedural_sphere_scene

    scene = procedural_sphere_scene(80, seed=3)
    cfg = RenderConfig(width=24, height=16, spp_per_cell=1, max_depth=6,
                       camera_model=CameraModel.LEGACY, filter=Filter.TENT)
    r = _binned_progressive(scene=scene, cfg=cfg)
    r.step()
    accel_before = r._r.accel
    new_center = np.asarray(scene.center).copy()
    new_center[9:, 0] += 3.0  # move the small spheres, keep the walls
    r.enqueue({"action": "update_scene", "center": new_center.tolist()})
    r.step()
    assert r._r.accel is not accel_before
    assert r.sample_count == 1
    np.testing.assert_allclose(
        np.asarray(r._r.scene.center), new_center, rtol=1e-6
    )


def test_binned_progressive_checkpoint_roundtrip(tmp_path):
    """(planes, budgets, key, stats) round-trip bit-exactly; resuming and
    finishing equals rendering straight through."""
    from smallpt_tpu.core.scene import procedural_sphere_scene

    scene = procedural_sphere_scene(80, seed=3)
    cfg = RenderConfig(width=24, height=16, spp_per_cell=1, max_depth=6,
                       camera_model=CameraModel.LEGACY, filter=Filter.TENT)
    ck = str(tmp_path / "binned_ck.npz")

    a = _binned_progressive(scene=scene, cfg=cfg)
    a.step()
    a.save_checkpoint(ck)

    b = _binned_progressive(scene=scene, cfg=cfg)
    b.load_checkpoint(ck)
    for s_a, s_b in zip(a._r.streams, b._r.streams):
        assert (np.asarray(s_a.f) == np.asarray(s_b.f)).all()
        assert (np.asarray(s_a.i) == np.asarray(s_b.i)).all()
    a.step()
    b.step()
    a.finalize()
    b.finalize()
    assert np.array_equal(a.image, b.image)


def test_binned_checkpoint_layout_mismatch_refused(tmp_path):
    from smallpt_tpu.core.scene import procedural_sphere_scene
    from smallpt_tpu.engine.binned import BinnedStreamingRenderer

    scene = procedural_sphere_scene(80, seed=3)
    cfg = RenderConfig(width=24, height=16, spp_per_cell=1, max_depth=6,
                       camera_model=CameraModel.LEGACY, filter=Filter.TENT)
    ck = str(tmp_path / "binned_ck2.npz")
    a = BinnedStreamingRenderer(scene, smallpt_camera(), cfg, seed=0,
                                n_streams=1, inflight=1)
    a.step(add_samples=1, n_bounces=2)
    a.save_checkpoint(ck)
    b = BinnedStreamingRenderer(scene, smallpt_camera(), cfg, seed=0,
                                n_streams=2, inflight=1)
    with pytest.raises(ValueError, match="stream layout mismatch"):
        b.load_checkpoint(ck)


def test_cli_interactive_end_to_end(tmp_path):
    """Full process: pipe the protocol into `python -m smallpt_tpu
    --interactive` — the reference's app loop driven headlessly."""
    out = str(tmp_path / "inter.ppm")
    cmds = "\n".join([
        json.dumps({"action": "update_camera", "org": [50.0, 52.5, 295.6]}),
        json.dumps({"action": "quit"}),
    ]) + "\n"
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-m", "smallpt_tpu", "4", "--interactive",
         "--width", "12", "--height", "10", "--max-depth", "5",
         "--quiet", "--out", out],
        input=cmds, text=True, env=env, capture_output=True, timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert os.path.exists(out)
