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


def test_load_scene_action(tmp_path):
    """load_scene swaps the whole scene from a JSON file (or inline spec)
    and resets accumulation; a bad file is logged and dropped without
    killing the render thread."""
    from smallpt_tpu.core.scene import two_sphere_scene
    from smallpt_tpu.core.scene_io import save_scene, scene_to_dict

    path = str(tmp_path / "two.json")
    save_scene(two_sphere_scene(), path)

    r = ProgressiveRenderer(cornell_box_scene(), smallpt_camera(), CFG, seed=3)
    r.step()
    img_cornell = r.image.copy()

    # file load
    r.enqueue({"action": "load_scene", "path": path})
    r.step()
    assert r.scene.n_spheres == 2
    assert r.sample_count == 1  # accumulation restarted
    assert not np.allclose(r.image, img_cornell)

    # inline spec load
    r.enqueue({"action": "load_scene",
               "scene": scene_to_dict(cornell_box_scene())})
    r.step()
    assert r.scene.n_spheres == 9

    # bad path: logged, dropped, scene unchanged
    r.enqueue({"action": "load_scene", "path": str(tmp_path / "nope.json")})
    r.step()
    assert r.scene.n_spheres == 9
    # missing payload: ditto
    r.enqueue({"action": "load_scene"})
    r.step()
    assert r.scene.n_spheres == 9


def test_load_scene_nee_range_guard(tmp_path):
    """A loaded scene too small for config.nee_lights is rejected (the
    light index would silently alias through clipped gathers)."""
    from smallpt_tpu.core.scene import two_sphere_scene
    from smallpt_tpu.core.scene_io import save_scene

    path = str(tmp_path / "two.json")
    save_scene(two_sphere_scene(), path)
    cfg = CFG.replace(nee_lights=(8,))
    r = ProgressiveRenderer(cornell_box_scene(), smallpt_camera(), cfg, seed=4)
    r.enqueue({"action": "load_scene", "path": path})
    r.step()
    assert r.scene.n_spheres == 9  # rejected, still Cornell


def test_session_load_scene_through_protocol(tmp_path):
    from smallpt_tpu.core.scene import two_sphere_scene
    from smallpt_tpu.core.scene_io import save_scene

    path = str(tmp_path / "two.json")
    save_scene(two_sphere_scene(), path)
    r = ProgressiveRenderer(cornell_box_scene(), smallpt_camera(), CFG, seed=5)
    stream = SlowStream([
        json.dumps({"action": "load_scene", "path": path}),
        json.dumps({"action": "quit"}),
    ])
    InteractiveSession(r, stream=stream).run(max_passes=200)
    assert r.scene.n_spheres == 2


def test_binned_load_scene_unsupported_keeps_old():
    """A load into the binned progressive renderer that the grid accel
    can't bin (no global spheres) keeps the previous scene."""
    import jax.numpy as jnp

    from smallpt_tpu.core.scene import SphereScene, Material
    from smallpt_tpu.core.scene_io import scene_to_dict

    r = _binned_progressive(seed=6)
    prev = r.scene
    small = SphereScene(
        center=jnp.asarray([[50.0, 40.0, 80.0]], jnp.float32),
        radius=jnp.asarray([2.0], jnp.float32),
        material=Material(jnp.zeros((1, 3), jnp.float32),
                          jnp.full((1, 3), 0.5, jnp.float32),
                          jnp.zeros((1,), jnp.int32)),
    )
    r.enqueue({"action": "load_scene", "scene": scene_to_dict(small)})
    r.step()
    assert r.scene is prev


def test_update_scene_after_mesh_load_is_dropped(tmp_path):
    """load_scene makes sphere->mesh transitions a normal runtime event:
    a subsequent sphere-field update_scene must be logged and dropped,
    not kill the render thread (review regression)."""
    from smallpt_tpu.core.scene import single_triangle_scene
    from smallpt_tpu.core.scene_io import save_scene

    path = str(tmp_path / "tri.json")
    save_scene(single_triangle_scene(), path)
    r = ProgressiveRenderer(cornell_box_scene(), smallpt_camera(), CFG,
                            seed=7)
    r.enqueue({"action": "load_scene", "path": path})
    r.step()
    assert hasattr(r.scene, "n_triangles")
    # sphere-field edit against a mesh scene: dropped, render continues
    r.enqueue({"action": "update_scene", "center": [[0.0, 0.0, 0.0]]})
    r.step()
    assert hasattr(r.scene, "n_triangles")


def test_binned_load_mesh_scene_keeps_old():
    """A mesh scene loaded into the BINNED progressive renderer (no
    .center -> AttributeError in the accel build) is dropped (review
    regression: the old catch missed AttributeError and killed the
    session)."""
    from smallpt_tpu.core.scene import single_triangle_scene
    from smallpt_tpu.core.scene_io import scene_to_dict

    r = _binned_progressive(seed=8)
    prev = r.scene
    r.enqueue({"action": "load_scene",
               "scene": scene_to_dict(single_triangle_scene())})
    r.step()
    assert r.scene is prev


def _mesh_stream_progressive(seed=0):
    from smallpt_tpu.core.scene import procedural_mesh_scene
    from smallpt_tpu.engine.progressive import MeshStreamProgressiveRenderer

    scene = procedural_mesh_scene(n_balls=2, subdiv_longitude=3, seed=1)
    cfg = RenderConfig(width=12, height=10, spp_per_cell=1, max_depth=6,
                       camera_model=CameraModel.LEGACY, filter=Filter.TENT)
    return MeshStreamProgressiveRenderer(scene, smallpt_camera(), cfg,
                                         seed=seed)


def test_mesh_stream_session_protocol(tmp_path):
    """Full protocol on a TRIANGLE scene through the persistent streaming
    wavefront: camera update, snapshot, quit."""
    r = _mesh_stream_progressive()
    snap = str(tmp_path / "snap_ms.ppm")
    stream = SlowStream([
        json.dumps({"action": "update_camera", "org": [50.0, 53.0, 295.6]}),
        json.dumps({"action": "snapshot", "path": snap}),
        json.dumps({"action": "quit"}),
    ], delay=0.05)
    passes = InteractiveSession(r, stream=stream).run(max_passes=60)
    assert passes >= 1
    assert os.path.exists(snap)
    assert float(np.asarray(r.camera.origin)[1]) == 53.0
    assert r._r.camera is r.camera  # wavefront re-aimed


def test_mesh_stream_camera_update_resets_deterministic():
    r = _mesh_stream_progressive()
    r.step()
    assert r.sample_count == 1
    before = r.image.copy()
    r.enqueue({"action": "update_camera", "org": [50.0, 53.0, 295.6]})
    r.step()
    assert r.sample_count == 1  # reset + one fresh pass
    assert not np.array_equal(before, r.image)
    assert r._r.budget == r.config.spp  # budgets restarted


def test_mesh_stream_load_scene_swaps_to_spheres():
    """The engine is geometry-agnostic: load_scene can swap a sphere scene
    into a mesh streaming session (accel/NEE tables rebuilt to None)."""
    from smallpt_tpu.core.scene import two_sphere_scene
    from smallpt_tpu.core.scene_io import scene_to_dict

    r = _mesh_stream_progressive(seed=3)
    r.step()
    r.enqueue({"action": "load_scene",
               "scene": scene_to_dict(two_sphere_scene())})
    r.step()
    assert hasattr(r.scene, "center")
    assert r.sample_count == 1
    assert np.isfinite(r.image).all()
