"""Binned streaming renderer — the big-scene scheduler.

Couples the continuous-wavefront stream (engine/streaming.py semantics:
per-pixel budgets, completed-sample weights, exact after flush) with the
grid-binned culled sweep (ops/accel.py + ops/megakernel.py::
stream_step_binned). This is the acceleration-structure slot of the
reference — OptiX Prime's GPU BVH build + closest-hit query
(/root/reference/smallpt.cpp:489-530,578-582) — rebuilt TPU-first: tile
coherence by periodic bin sort, conservative per-tile chunk lists, and a
bounce kernel that sweeps only what a tile can reach.

Sample streams are identical to the classic streaming scheduler (keying v2
is placement-invariant: a lane's uniforms depend only on (pixel, sample
index)), and sorting/culling are pure scheduling: within the binned path,
sorting on/off and culled/full-sweep produce BIT-EQUAL images (tests pin
this). Against the CLASSIC megakernel the match is exact up to the
codebase's documented razor-flip floor: the two kernels compile the same
citardauq sweep with different FMA contraction, so wall-sphere hit
positions differ at the ~1e-4 cancellation scale, which flips rare
discrete path events on deep paths (the same noise class as the
megakernel-vs-JAX-scheduler precedent, ops/megakernel.py docstring).

Restrictions (v2 of the binned path): Mode.FULL, split_budget == 1, no
next-event estimation yet (the shadow sweep needs its own toward-the-light
chunk lists). Thin-lens DoF is supported (regen_binned carries the same
lens block as the classic streaming kernel's in-kernel regen; the accel
grid bounds cover the aperture disc), and adaptive sampling works via
step_adaptive / per-pixel budget arrays gathered through the pixel plane.
"""

from __future__ import annotations

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from smallpt_tpu.config import RenderConfig, Mode
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.scene import SphereScene
from smallpt_tpu.ops import accel as acc
from smallpt_tpu.ops.megakernel import (
    binned_image,
    build_camera_vec,
    build_scene_table,
    init_binned_state,
    set_binned_budget,
    stream_pending,
    stream_step_binned,
)
from smallpt_tpu.utils.metrics import RenderStats


class BinnedStreamingRenderer:
    """Continuous-wavefront renderer with grid-binned sweep culling.

    step(add_samples, n_bounces): extend every pixel's budget and advance
    the wavefront n_bounces culled bounces (one kernel launch each; chunk
    lists recomputed per bounce, state re-sorted every ``sort_every``
    bounces to keep tiles bin-coherent).
    """

    def __init__(
        self,
        scene: SphereScene,
        camera,
        config: RenderConfig,
        seed: int = 0,
        accel: acc.GridAccel | None = None,
        sort_every: int = 2,
        k_near: int | None = None,
    ):
        if config.mode != Mode.FULL or config.split_budget != 1:
            raise ValueError("binned streaming: Mode.FULL, split_budget=1")
        if config.nee_lights:
            raise ValueError(
                "binned streaming does not support nee_lights yet (the "
                "shadow sweep needs its own chunk lists)"
            )
        if not isinstance(scene, SphereScene):
            raise TypeError("binned streaming renders SphereScenes")
        self.scene = scene
        self.camera = camera
        self.config = config
        if accel is None:
            # include the primary-ray origins in the grid bounds so camera
            # rays bin into FINITE cells (an origin clamped into an
            # infinite-extent border cell reaches every chunk)
            cv = np.asarray(build_camera_vec(camera, config)).reshape(16)
            a_v, b_v, c_v, o_v, push = (
                cv[0:3], cv[3:6], cv[6:9], cv[9:12], cv[12]
            )
            from smallpt_tpu.config import CameraModel

            sc = 2.0 if config.camera_model == CameraModel.MATRIX else 1.0
            pts = [o_v]
            for sx in (-0.5 * sc, 0.5 * sc):
                for sy in (-0.5 * sc, 0.5 * sc):
                    d = sx * a_v + sy * b_v + c_v
                    pts.append(o_v + push * d)
            if config.aperture > 0:
                # thin-lens origins sit on an aperture disc around each
                # base origin (regen_binned's lens block); cover its
                # extent so lens-jittered camera rays bin into finite cells
                ap = float(config.aperture)
                ra = a_v / max(np.linalg.norm(a_v), 1e-12)
                rb = b_v / max(np.linalg.norm(b_v), 1e-12)
                pts = [
                    p + s * ap * e
                    for p in pts
                    for s, e in ((0, ra), (-1, ra), (1, ra), (-1, rb), (1, rb))
                ]
            accel = acc.build_grid_accel(scene, extra_points=np.asarray(pts))
        self.accel = accel
        self.sort_every = sort_every
        # near-prefix length per non-pending tile; a device scalar so tuning
        # sweeps re-use one compiled program (value, not shape)
        from smallpt_tpu.ops.megakernel import K_NEAR

        self.k_near = jnp.asarray(
            K_NEAR if k_near is None else k_near, jnp.int32
        )
        self.key = prng.base_key(seed)
        base_table = build_scene_table(scene, config)
        self.table = jnp.take(base_table, self.accel.order, axis=0)
        self.cam_vec = build_camera_vec(camera, config)
        self.f, self.i = init_binned_state(config)
        self.budget = 0
        self._budgets = None  # per-pixel budgets once adaptive stepping used
        self._bounce_idx = 0
        self.stats = RenderStats()
        self._bounce = self._make_bounce()

    def _make_bounce(self):
        config, accel = self.config, self.accel

        @jax.jit
        def lists_of(f, i, k_near):
            return acc.tile_work_lists(f, i, config, accel, k_near=k_near)

        def bounce(table, cam_vec, key, f, i):
            # THREE separate programs, not one fused jit: on this
            # toolchain monolithic programs mixing XLA sorts/argsorts with
            # a pallas_call hit multi-ten-minute remote-compile
            # pathologies, while the pieces compile in seconds
            # (regen ~1s, lists ~24s, kernel ~2s measured). The extra
            # dispatches are async and fetch-free.
            from smallpt_tpu.ops.megakernel import regen_binned

            f, i = regen_binned(f, i, cam_vec, config, key)
            lists, stops, dcut = lists_of(f, i, self.k_near)
            return stream_step_binned(
                table, config, key, f, i, lists, stops, dcut,
                n_glob_chunks=accel.n_glob_chunks,
                n_chunks=accel.n_chunks,
            )

        @jax.jit
        def keys_of(f, i):
            return acc.state_bin_keys(f, i, accel)

        def shuffle(f, i):
            return acc.shuffle_state(f, i, keys_of(f, i))

        return bounce, shuffle

    def _advance(self, n_bounces: int) -> int:
        bounce, shuffle = self._bounce
        t0 = time.perf_counter()
        rays_dev = []
        for _ in range(n_bounces):
            if self.sort_every and self._bounce_idx % self.sort_every == 0:
                self.f, self.i = shuffle(self.f, self.i)
            self.f, self.i, rays = bounce(
                self.table, self.cam_vec, self.key, self.f, self.i
            )
            # keep the counter on device: each host fetch pays a full axon
            # tunnel round-trip (~30 ms measured), which dominated the loop
            rays_dev.append(rays)
            self._bounce_idx += 1
        total = int(sum(rays_dev))
        self.stats.rays += total
        self.stats.wall_s += time.perf_counter() - t0
        self.stats.passes += 1
        return total

    def step(self, add_samples: int = 1, n_bounces: int = 8) -> int:
        """Returns rays traced this step."""
        self.budget += add_samples
        self.i = set_binned_budget(self.i, self.budget, self.config)
        return self._advance(n_bounces)

    def step_adaptive(self, n_bounces: int = 8,
                      add_samples_total: int | None = None) -> int:
        """Variance-adaptive step (engine/streaming.py::step_adaptive
        semantics on the binned path): distribute a pool of new samples
        across pixels proportional to their luminance standard deviation
        (capped at 8x the mean share, uniform floor of 1 when affordable),
        then advance n_bounces culled bounces."""
        from smallpt_tpu.ops.megakernel import binned_variance

        G = self.config.n_pixels
        if add_samples_total is None:
            add_samples_total = G
        _, var, _n = binned_variance(self.f, self.i, self.config)
        sigma = np.sqrt(np.asarray(var).reshape(-1)) + 1e-3
        base = 1 if add_samples_total >= 2 * G else 0
        pool = add_samples_total - base * G
        w_alloc = np.minimum(sigma, 8.0 * sigma.mean())
        alloc = w_alloc / w_alloc.sum() * pool
        extra = np.floor(alloc).astype(np.int64)
        short = int(pool - extra.sum())
        if short > 0:
            order = np.argsort(alloc - extra)[::-1][:short]
            extra[order] += 1
        extra = (extra + base).astype(np.int32)
        if self._budgets is None:
            self._budgets = np.full((G,), self.budget, np.int32)
        self._budgets = (np.asarray(self._budgets) + extra).astype(np.int32)
        self.i = set_binned_budget(
            self.i, jnp.asarray(self._budgets), self.config
        )
        self.budget = int(self._budgets.min())
        return self._advance(n_bounces)

    def flush(self) -> None:
        """Drain all in-flight paths and remaining budget; afterwards
        image() is the exact per-pixel MC estimate."""
        while True:
            pending = stream_pending(self.i)
            if pending == (0, 0):
                return
            # progress = rays traced: pending counts alone can legitimately
            # repeat (lanes die and regenerate in equal numbers)
            if self._advance(8) == 0:
                raise RuntimeError("flush made no progress (paths stuck?)")

    def accumulators(self):
        """(radiance sums (H,W,3), completed-sample weights (H,W))."""
        return binned_image(self.f, self.i, self.config)

    def reset(self) -> None:
        self.f, self.i = init_binned_state(self.config)
        self.budget = 0
        self._budgets = None
        self._bounce_idx = 0

    def update_camera(self, camera) -> None:
        self.camera = camera
        self.cam_vec = build_camera_vec(camera, self.config)
        self.reset()

    @property
    def image(self) -> np.ndarray:
        from smallpt_tpu.engine.accum import normalize_weighted

        rad, w = self.accumulators()
        return np.asarray(normalize_weighted(rad, w))
