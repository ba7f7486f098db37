"""Interactive render session — the reference's two-thread app, headless.

The reference runs a render thread that loops Renderer::render forever and a
UI thread that polls keys, enqueues JSON render requests, and blits the
accumulation (main(), smallpt.cpp:840-1005; request protocol
{"action": "update_camera", "org": [x,y,z]}, smallpt.cpp:978-985). Here:

- the MAIN thread is the render loop (progressive passes on device);
- a READER thread consumes line-delimited JSON commands from a stream
  (stdin for `python -m smallpt_tpu --interactive`) and enqueues them on the
  ProgressiveRenderer's mutex-guarded queue — same two-thread split, but the
  shared state is one thread-safe queue instead of the reference's ad-hoc
  mutexed buffers (and its non-atomic `renderDone` flag, SURVEY.md App. A);
- frames stream to disk through the native async writer (a third,
  C++-side consumer thread).

Protocol (one JSON object per line):
    {"action": "update_camera", "org": [50, 53, 295.6]}   # + accum reset
    {"action": "update_scene", "center": [...], "radius": [...]}
    {"action": "load_scene", "path": "scene.json"}        # or "scene": {...}
    {"action": "reset"}
    {"action": "snapshot", "path": "now.png"}             # async-safe save
    {"action": "quit"}

Plus the reference's keyboard shortcuts as one-letter commands:
    "u" / "d"  — move camera origin y by +/- 0.01 (GLFW_KEY_UP/DOWN,
                 smallpt.cpp:968-976)
"""

from __future__ import annotations

import json
import sys
import threading

import numpy as np

from smallpt_tpu.engine.progressive import ProgressiveRenderer
from smallpt_tpu.utils import image as img_io
from smallpt_tpu.utils.metrics import log_json


def _camera_org(camera) -> np.ndarray:
    if hasattr(camera, "origin"):
        return np.asarray(camera.origin)
    return np.asarray(camera.local_to_world[:3, 3])


class InteractiveSession:
    def __init__(self, renderer: ProgressiveRenderer, stream=None,
                 frame_pattern: str | None = None, frame_every: int = 1):
        self.renderer = renderer
        self.stream = stream if stream is not None else sys.stdin
        self.frame_pattern = frame_pattern
        self.frame_every = frame_every
        self._quit = threading.Event()
        self._snapshots: list[str] = []
        self._snap_lock = threading.Lock()
        # UI-side camera origin copy: nudges mutate this and enqueue absolute
        # positions, exactly like the reference's UI thread owning cameraOrg
        # (smallpt.cpp:885,968-985) — reading renderer.camera from the reader
        # thread would race with in-flight request application
        self._ui_org = _camera_org(renderer.camera).copy()

    # -- reader thread (the UI thread's input half) --------------------------
    def _reader(self) -> None:
        for line in self.stream:
            line = line.strip()
            if not line:
                continue
            if line == "u" or line == "d":
                self._ui_org = self._ui_org + np.asarray(
                    [0.0, 0.01 if line == "u" else -0.01, 0.0]
                )
                self.renderer.enqueue(
                    {"action": "update_camera", "org": self._ui_org.tolist()}
                )
                continue
            try:
                req = json.loads(line)
            except json.JSONDecodeError as e:
                log_json("bad_request", {"error": str(e), "line": line[:200]})
                continue
            action = req.get("action")
            if action == "quit":
                self._quit.set()
                return
            if action == "snapshot":
                with self._snap_lock:
                    self._snapshots.append(req.get("path", "snapshot.png"))
                continue
            # validate before enqueueing: a malformed protocol message must
            # not kill the render thread (it is logged and dropped, like a
            # malformed JSON line)
            if action not in ("update_camera", "update_scene", "load_scene",
                              "reset"):
                log_json("bad_request", {"error": f"unknown action {action!r}"})
                continue
            if action == "update_camera":
                org = req.get("org")
                if not (isinstance(org, (list, tuple)) and len(org) == 3):
                    log_json("bad_request",
                             {"error": "update_camera needs org=[x,y,z]"})
                    continue
                # keep the UI-side origin copy in sync so subsequent u/d
                # nudges build on the explicitly-set position
                self._ui_org = np.asarray(org, dtype=np.float64)
            self.renderer.enqueue(req)
        self._quit.set()  # EOF ends the session (like closing the window)

    # -- render loop (the reference's render thread) -------------------------
    def run(self, max_passes: int | None = None) -> int:
        """Render until quit/EOF (or max_passes). Returns passes rendered."""
        reader = threading.Thread(target=self._reader, daemon=True)
        reader.start()
        writer = None
        if self.frame_pattern:
            import os

            from smallpt_tpu.utils import native

            os.makedirs(os.path.dirname(self.frame_pattern) or ".",
                        exist_ok=True)
            if native.available():
                writer = native.FrameWriter(
                    self.frame_pattern, self.renderer.config.width,
                    self.renderer.config.height,
                    binary=self.frame_pattern.endswith(".ppm"),
                )
        passes = 0
        try:
            while not self._quit.is_set():
                if max_passes is not None and passes >= max_passes:
                    break
                self.renderer.step()
                passes += 1
                with self._snap_lock:
                    snaps, self._snapshots = self._snapshots, []
                for path in snaps:
                    if path.endswith(".png"):
                        img_io.write_png(path, self.renderer.image)
                    else:
                        img_io.write_ppm(path, self.renderer.image)
                    log_json("snapshot", {"path": path, "passes": passes})
                if writer is not None and passes % self.frame_every == 0:
                    writer.push(self.renderer.image[::-1], passes)
                elif self.frame_pattern and writer is None and (
                    passes % self.frame_every == 0
                ):
                    img_io.write_ppm(self.frame_pattern % passes,
                                     self.renderer.image)
            # commands enqueued just before quit still take effect: apply
            # them with one final pass so the saved image reflects them
            if self.renderer._requests and (
                max_passes is None or passes < max_passes
            ):
                self.renderer.step()
                passes += 1
            with self._snap_lock:
                snaps, self._snapshots = self._snapshots, []
            for path in snaps:
                if path.endswith(".png"):
                    img_io.write_png(path, self.renderer.image)
                else:
                    img_io.write_ppm(path, self.renderer.image)
        finally:
            if writer is not None:
                if writer.errors:
                    log_json("frame_writer_errors", {"count": writer.errors})
                writer.close()
        return passes
