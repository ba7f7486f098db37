"""Progressive accumulation driver — the interactive app's render-thread
semantics (smallpt.cpp:895-941) without a window.

The reference loops Renderer::render forever, adding each 1-pass image into a
mutex-guarded accumBuffer and bumping sampleCount; a JSON request queue
carries camera updates which clear the accumulation (smallpt.cpp:906-920,
931-939); display/save normalizes by 1/(sampleCount*sppPerPass)
(smallpt.cpp:957,995-1001). Here:

- the accumulation buffer lives on device; each step is one jitted pass
  (async dispatch — the host can enqueue step N+1 while fetching a display
  frame of step N, replacing the reference's two-thread mutex dance)
- the command queue accepts JSON-compatible dicts; ``update_camera`` matches
  the reference's protocol {"action": "update_camera", "org": [x,y,z]}
  (smallpt.cpp:978-985) and extends to full camera/scene/config updates;
  any change that invalidates the accumulation resets it
- the progressive state (accum, sample_count, seed) is the checkpoint: save/
  load makes renders restartable (the reference's implicit resumable state,
  SURVEY.md §5.4).
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp

from smallpt_tpu.config import RenderConfig, CameraModel
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.camera import (
    LegacyCamera,
    MatrixCamera,
    matrix_camera_from_frame,
)
from smallpt_tpu.engine.renderer import render_with_stats
from smallpt_tpu.utils.metrics import RenderStats, log_json


class ProgressiveRenderer:
    def __init__(self, scene, camera, config: RenderConfig, seed: int = 0):
        self.scene = scene
        self.camera = camera
        self.config = config
        self.seed = seed
        self._base = prng.base_key(seed)
        self.accum = jnp.zeros(
            (config.height, config.width, 3), jnp.dtype(config.dtype)
        )
        self.sample_count = 0  # passes accumulated
        self._stats = RenderStats()  # structured telemetry (SURVEY.md §5.1/5.5)
        self._rays_dev = None  # device-side rays accumulator (no per-pass sync)
        self._t_first_step: float | None = None
        self.log_stats = False  # emit a JSON log line per step when True
        self._requests: list[dict] = []
        self._req_lock = threading.Lock()

    # -- command queue (smallpt.cpp:890-920 analog) ------------------------
    def enqueue(self, request: dict | str) -> None:
        if isinstance(request, str):
            request = json.loads(request)
        with self._req_lock:
            self._requests.append(request)

    def _apply_requests(self) -> bool:
        with self._req_lock:
            requests, self._requests = self._requests, []
        invalidate = False
        for req in requests:
            action = req.get("action")
            if action == "update_camera":
                org = req["org"]
                if isinstance(self.camera, MatrixCamera):
                    m = self.camera.local_to_world
                    m = m.at[:3, 3].set(jnp.asarray(org, m.dtype))
                    self.camera = self.camera._replace(local_to_world=m)
                else:
                    self.camera = self.camera._replace(
                        origin=jnp.asarray(org, self.camera.origin.dtype)
                    )
                invalidate = True
            elif action == "update_scene":
                # replace any subset of sphere-scene leaves; load_scene can
                # have swapped in a mesh scene since, so a field mismatch is
                # logged and dropped (never kills the render thread)
                prev = self.scene
                try:
                    for k in ("center", "radius"):
                        if k in req:
                            self.scene = self.scene._replace(
                                **{k: jnp.asarray(req[k], self.accum.dtype)}
                            )
                    mat = self.scene.material
                    for k in ("emission", "albedo"):
                        if k in req:
                            mat = mat._replace(
                                **{k: jnp.asarray(req[k], self.accum.dtype)}
                            )
                    self.scene = self.scene._replace(material=mat)
                    invalidate = True
                except (TypeError, ValueError, AttributeError) as e:
                    from smallpt_tpu.utils.metrics import log_json

                    log_json("bad_request",
                             {"action": "update_scene", "error": str(e)})
                    self.scene = prev
            elif action == "load_scene":
                # swap the whole scene from a JSON file ("path") or inline
                # spec ("scene") — core/scene_io.py format. New shapes mean
                # a recompile on the next pass; a bad file/spec is logged
                # and dropped so the render thread keeps its scene (the
                # reference's request drain has no error path at all,
                # smallpt.cpp:906-920).
                from smallpt_tpu.core.scene_io import (
                    load_scene, scene_from_dict,
                )
                from smallpt_tpu.utils.metrics import log_json

                try:
                    if "path" in req:
                        new_scene = load_scene(req["path"])
                    elif "scene" in req:
                        new_scene = scene_from_dict(req["scene"])
                    else:
                        raise ValueError("load_scene needs path or scene")
                    n = getattr(new_scene, "n_spheres", None)
                    if self.config.nee_lights and (
                        n is None
                        or max(self.config.nee_lights) >= n
                    ):
                        raise ValueError(
                            "config.nee_lights out of range for the loaded "
                            "scene"
                        )
                    self.scene = new_scene
                    invalidate = True
                except (OSError, ValueError, KeyError, TypeError) as e:
                    log_json("bad_request",
                             {"action": "load_scene", "error": str(e)})
            elif action == "reset":
                invalidate = True
            else:
                raise ValueError(f"unknown action {action!r}")
        return invalidate

    # -- progressive stepping ----------------------------------------------
    def step(self, n_passes: int = 1) -> None:
        """Run n_passes render passes and accumulate (one pass = config.spp
        samples/pixel, the reference's +1 progressive sample,
        smallpt.cpp:922-926)."""
        if self._apply_requests():
            self.reset_accumulation()
        for _ in range(n_passes):
            key = jax.random.fold_in(self._base, self.sample_count)
            if self._t_first_step is None:
                self._t_first_step = time.perf_counter()
            img, rays = render_with_stats(
                self.scene, self.camera, self.config, key
            )
            self.accum = self.accum + img
            # keep rays on device: passes pipeline back-to-back (the two-
            # thread producer/consumer overlap, SURVEY.md §2.3 strategy 4);
            # reading .stats is the sync point
            self._rays_dev = rays if self._rays_dev is None else self._rays_dev + rays
            self._stats.passes += 1
            self.sample_count += 1
            if self.log_stats:
                log_json("render_pass", {
                    "pass": self.sample_count, "pass_rays": int(rays),
                    **self.stats.as_dict(),
                })

    @property
    def stats(self) -> RenderStats:
        """Telemetry snapshot. Reading it synchronizes with the device;
        wall_s spans first step -> this read."""
        if self._rays_dev is not None:
            self._stats.rays = int(self._rays_dev)
            self._stats.wall_s = time.perf_counter() - self._t_first_step
        return self._stats

    def reset_accumulation(self) -> None:
        self.accum = jnp.zeros_like(self.accum)
        self.sample_count = 0

    @property
    def image(self) -> np.ndarray:
        """Normalized display image (smallpt.cpp:957): accum / (N * spp)."""
        n = max(self.sample_count, 1)
        return np.asarray(self.accum) / (n * self.config.spp)

    # -- checkpoint / resume (SURVEY.md §5.4: the full resumable state is
    # (accum, sample_count, rng seed, scene, camera)) -------------------------
    def save_checkpoint(self, path: str) -> None:
        np.savez(
            path,
            accum=np.asarray(self.accum),
            sample_count=self.sample_count,
            seed=self.seed,
            camera_kind=type(self.camera).__name__,
            camera_leaves=np.asarray(
                np.concatenate([np.ravel(x) for x in jax.tree.leaves(self.camera)])
            ),
            scene_leaves=np.asarray(
                np.concatenate([np.ravel(x) for x in jax.tree.leaves(self.scene)])
            ),
        )

    def load_checkpoint(self, path: str) -> None:
        data = np.load(path, allow_pickle=False)
        if int(data["seed"]) != self.seed:
            raise ValueError("checkpoint seed mismatch — resume would replay "
                             "different sample streams")
        self.accum = jnp.asarray(data["accum"])
        self.sample_count = int(data["sample_count"])

        def unflatten_like(template, flat):
            leaves = jax.tree.leaves(template)
            out, off = [], 0
            for leaf in leaves:
                n = int(np.prod(leaf.shape)) if leaf.shape else 1
                out.append(
                    jnp.asarray(flat[off: off + n])
                    .reshape(leaf.shape).astype(leaf.dtype)
                )
                off += n
            return jax.tree.unflatten(jax.tree.structure(template), out)

        self.camera = unflatten_like(self.camera, data["camera_leaves"])
        if "scene_leaves" in data:  # older checkpoints lack the scene
            self.scene = unflatten_like(self.scene, data["scene_leaves"])

    # -- finalization hook (overridden where draining matters) ---------------
    def finalize(self) -> None:
        """Make ``image`` the exact estimate of everything rendered so far.
        A no-op here (per-pass rendering is always complete); the binned
        subclass drains in-flight wavefronts."""

    # -- headless interactive loop ------------------------------------------
    def run(
        self,
        n_passes: int,
        on_frame: Callable[["ProgressiveRenderer"], Any] | None = None,
        frame_every: int = 1,
        frame_pattern: str | None = None,
    ) -> None:
        """Render n_passes progressively, invoking on_frame periodically —
        the UI-thread consumer slot (smallpt.cpp:946-988).

        If frame_pattern is given (e.g. "frames/f_%05d.ppm"), normalized
        frames are streamed to disk through the native async FrameWriter
        (falling back to synchronous writes): the device keeps rendering
        pass N+1 while the host thread encodes frame N — the reference's
        two-thread producer/consumer pipeline (SURVEY.md §2.3 strategy 4)."""
        from smallpt_tpu.utils import image as img_util
        from smallpt_tpu.utils import native

        writer = None
        if frame_pattern is not None and native.available():
            writer = native.FrameWriter(
                frame_pattern, self.config.width, self.config.height,
                binary=frame_pattern.endswith(".ppm"),
            )
        try:
            for i in range(n_passes):
                self.step()
                if (i + 1) % frame_every == 0:
                    if writer is not None:
                        writer.push(self.image[::-1], i + 1)
                    elif frame_pattern is not None:
                        img_util.write_ppm(frame_pattern % (i + 1), self.image)
                    if on_frame is not None:
                        on_frame(self)
        finally:
            if writer is not None:
                writer.close()


class _StreamBackedProgressive(ProgressiveRenderer):
    """Shared progressive/interactive surface over a PERSISTENT streaming
    renderer (``self._r``: step/step_timed/update_camera/update_scene/
    reset/flush/image/stats/checkpoints). Subclasses construct the engine
    and may refresh engine-side camera caches via _sync_camera()."""

    n_bounces: int
    target_ms: float | None

    def _sync_camera(self) -> None:
        self._r.camera = self.camera

    def step(self, n_passes: int = 1) -> None:
        if self._apply_requests():
            self.reset_accumulation()
        for _ in range(n_passes):
            if self._t_first_step is None:
                self._t_first_step = time.perf_counter()
            if self.target_ms is not None:
                rays = self._r.step_timed(
                    target_ms=self.target_ms, add_samples=self.config.spp
                )
            else:
                rays = self._r.step(
                    add_samples=self.config.spp, n_bounces=self.n_bounces
                )
            self._stats.passes += 1
            self.sample_count += 1
            if self.log_stats:
                log_json("render_pass", {
                    "pass": self.sample_count, "pass_rays": rays,
                    **self.stats.as_dict(),
                })

    def _apply_requests(self) -> bool:
        prev_scene, prev_camera = self.scene, self.camera
        invalidate = super()._apply_requests()
        if invalidate:
            # route the change to the persistent stream state: scene edits
            # rebuild the accel/light tables; camera moves only re-aim
            if self.scene is not prev_scene:
                self._sync_camera()
                try:
                    self._r.update_scene(self.scene)
                except (TypeError, ValueError, AttributeError) as e:
                    # e.g. load_scene swapped in a scene this engine cannot
                    # serve (mesh into the binned grid accel, unbinnable
                    # sphere sets): keep rendering the old scene rather
                    # than killing the render thread
                    from smallpt_tpu.utils.metrics import log_json

                    log_json("bad_request",
                             {"action": "update_scene", "error": str(e)})
                    self.scene = prev_scene
                    self._r.update_camera(self.camera)
            elif self.camera is not prev_camera:
                self._sync_camera()
                self._r.update_camera(self.camera)
            else:
                self._r.reset()
        return invalidate

    @property
    def stats(self):
        return self._r.stats

    def reset_accumulation(self) -> None:
        # the accumulation lives in the stream planes; reset() is
        # idempotent, so the double reset after update_* hooks is harmless
        self.sample_count = 0
        self._r.reset()

    def finalize(self) -> None:
        self._r.flush()

    @property
    def image(self) -> np.ndarray:
        return self._r.image

    def save_checkpoint(self, path: str) -> None:
        self._r.save_checkpoint(path)

    def load_checkpoint(self, path: str) -> None:
        self._r.load_checkpoint(path)
        self.sample_count = self._r.stats.passes


class BinnedProgressiveRenderer(_StreamBackedProgressive):
    """Progressive/interactive driver over the binned big-scene scheduler.

    The reference's interactive app is scheduler-agnostic: the render thread
    loops whatever Renderer::render is bound to — including the accelerated
    OptiX backend (smallpt.cpp:605,895-941) — and the UI's JSON requests
    reset accumulation on change. This subclass gives big sphere scenes the
    same surface: one PERSISTENT BinnedStreamingRenderer (grid accel built
    once, wavefront state carried across passes — no per-pass rebuild),
    driven either per-pass (each step adds spp samples/pixel) or equal-time
    (target_ms, the display cadence of smallpt.cpp:946-988).

    ``image`` is weight-normalized by completed sample counts, so a frame
    displayed mid-wavefront is a consistent estimate at any interruption
    point; ``finalize()`` drains for the exact image.
    """

    def __init__(self, scene, camera, config: RenderConfig, seed: int = 0,
                 n_bounces: int | None = None, target_ms: float | None = None,
                 **binned_kwargs):
        super().__init__(scene, camera, config, seed)
        from smallpt_tpu.engine.binned import BinnedStreamingRenderer

        self._binned_kwargs = binned_kwargs
        self._r = BinnedStreamingRenderer(
            scene, camera, config, seed=seed, **binned_kwargs
        )
        self.n_bounces = (
            2 * config.max_depth if n_bounces is None else n_bounces
        )
        self.target_ms = target_ms

    def _sync_camera(self) -> None:
        self._r.camera = self.camera
        self._r.cam_vec = _binned_cam_vec(self.camera, self.config)


def _binned_cam_vec(camera, config):
    from smallpt_tpu.ops.megakernel import build_camera_vec

    return build_camera_vec(camera, config)


class MeshStreamProgressiveRenderer(_StreamBackedProgressive):
    """Progressive/interactive driver over the mesh streaming engine
    (engine/mesh_stream.py) — the triangle-scene analog of
    BinnedProgressiveRenderer: one PERSISTENT wavefront carried across
    passes (accel + NEE tables built once), per-pass or equal-time
    (target_ms) stepping, the full JSON protocol with accumulation reset
    on change."""

    def __init__(self, scene, camera, config: RenderConfig, seed: int = 0,
                 n_bounces: int | None = None,
                 target_ms: float | None = None):
        super().__init__(scene, camera, config, seed)
        from smallpt_tpu.engine.mesh_stream import (
            WavefrontStreamingRenderer,
        )

        self._r = WavefrontStreamingRenderer(scene, camera, config,
                                             seed=seed)
        self.n_bounces = (
            2 * config.max_depth if n_bounces is None else n_bounces
        )
        self.target_ms = target_ms
