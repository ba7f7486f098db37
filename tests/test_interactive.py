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
