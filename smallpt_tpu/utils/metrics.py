"""Observability: render stats, per-bounce occupancy, profiler hooks.

The reference's observability is wall-clock prints and a 33 ms progress poll
(smallpt.cpp:270,316,363-373,695-697,809-811) plus a per-bounce "Trace rays"
log line (smallpt.cpp:781). Here those become structured, queryable data:

- ``RenderStats``: rays traced, wall seconds, rays/s, passes — the numbers
  the reference only ever printed to stderr.
- ``occupancy_profile``: per-bounce live-lane counts of the regenerative
  wavefront — the divergence-management metric (SURVEY.md §7 hard part #1)
  that the reference exposes only as the shrinking pathCount log.
- ``trace``: context manager around jax.profiler for device traces.
- ``log_json``: one-line JSON structured logging to stderr.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class RenderStats:
    """Accumulated render statistics (the reference's stderr telemetry,
    smallpt.cpp:366-373, as data)."""

    passes: int = 0
    rays: int = 0
    wall_s: float = 0.0

    @property
    def rays_per_s(self) -> float:
        return self.rays / self.wall_s if self.wall_s > 0 else 0.0

    def as_dict(self) -> dict:
        return {
            "passes": self.passes,
            "rays": self.rays,
            "wall_s": round(self.wall_s, 4),
            "rays_per_s": round(self.rays_per_s),
        }


def log_json(event: str, payload: dict, stream=None) -> None:
    """One structured JSON log line (replaces fprintf(stderr, ...) telemetry)."""
    stream = stream or sys.stderr
    print(json.dumps({"event": event, "t": time.time(), **payload}),
          file=stream, flush=True)


@contextlib.contextmanager
def trace(log_dir: str):
    """Device profiler trace (view with TensorBoard / xprof) — the profiler
    hook the reference lacks (SURVEY.md §5.1)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def occupancy_profile(scene, camera, config, key) -> np.ndarray:
    """Per-bounce live-lane counts for one regenerative pass.

    Returns an int array of length <= config.spp * config.max_depth, trimmed
    to the iterations actually executed. occupancy[i] / n_pixels is the lane
    utilization at wavefront iteration i — the metric that motivated the
    persistent megakernel's per-tile drain (ops/megakernel.py).
    """
    from smallpt_tpu.core import camera as cam_mod
    from smallpt_tpu.core import rng as prng
    from smallpt_tpu.engine.renderer import make_intersect_fn
    from smallpt_tpu.ops.wavefront import PathState, bounce_step

    G = config.n_pixels
    pixel = jnp.arange(G, dtype=jnp.int32)
    col = pixel % config.width
    row = pixel // config.width
    k_samples = config.spp
    max_it = k_samples * config.max_depth
    intersect_fn = make_intersect_fn(scene, config)
    dtype = jnp.dtype(config.dtype)

    @jax.jit
    def profiled():
        state = PathState(
            org=jnp.zeros((G, 3), dtype), dir=jnp.ones((G, 3), dtype),
            weight=jnp.zeros((G, 3), dtype), depth=jnp.zeros((G,), jnp.int32),
            hist=jnp.zeros((G,), jnp.int32), alive=jnp.zeros((G,), bool),
            radiance=jnp.zeros((G, 3), dtype),
            suppress=jnp.zeros((G,), jnp.int32),
        )
        occ0 = jnp.zeros((max_it,), jnp.int32)

        def cond(c):
            st, s_idx, sid, bounce, occ = c
            return (bounce < max_it) & jnp.any(st.alive | (s_idx < k_samples - 1))

        def body(c):
            st, s_idx, sid, bounce, occ = c
            need = (~st.alive) & (s_idx < k_samples - 1)
            s_new = jnp.where(need, s_idx + 1, s_idx)
            ip = s_new
            sid_new = pixel * config.spp + ip
            group = ip // config.spp_per_cell
            cx = group % config.jitter_size
            cy = group // config.jitter_size
            u_cam = prng.camera_uniforms(key, sid_new, dtype)
            u_lens = (
                prng.lens_uniforms(key, sid_new, dtype)
                if config.aperture > 0.0 else None
            )
            org0, dir0 = cam_mod.generate_rays(camera, u_cam, config, col, row,
                                               cx, cy, u_lens=u_lens)
            nm = need[:, None]
            st = PathState(
                org=jnp.where(nm, org0, st.org), dir=jnp.where(nm, dir0, st.dir),
                weight=jnp.where(nm, 1.0, st.weight),
                depth=jnp.where(need, 0, st.depth),
                hist=jnp.where(need, 0, st.hist),
                alive=st.alive | need, radiance=st.radiance,
                suppress=jnp.where(need, 0, st.suppress),
            )
            sid = jnp.where(need, sid_new, sid)
            occ = occ.at[bounce].set(jnp.sum(st.alive.astype(jnp.int32)))
            nee_scene = scene if config.nee_lights else None
            st = bounce_step(st, intersect_fn, scene.material, config, key, sid,
                             nee_scene=nee_scene)
            st = st._replace(alive=st.alive & (st.depth < config.max_depth))
            return st, s_new, sid, bounce + 1, occ

        c = (state, jnp.full((G,), -1, jnp.int32), jnp.zeros((G,), jnp.int32),
             jnp.asarray(0, jnp.int32), occ0)
        _, _, _, bounce, occ = jax.lax.while_loop(cond, body, c)
        return bounce, occ

    bounce, occ = profiled()
    return np.asarray(occ)[: int(bounce)]
