"""Binned streaming renderer — the big-scene scheduler.

Couples the continuous-wavefront stream (engine/streaming.py semantics:
per-pixel budgets, completed-sample weights, exact after flush) with the
grid-binned culled sweep (ops/accel.py + ops/megakernel.py::
stream_step_binned). This is the acceleration-structure slot of the
reference — OptiX Prime's GPU BVH build + closest-hit query
(/root/reference/smallpt.cpp:489-530,578-582) — rebuilt TPU-first:
conservative per-tile chunk lists, a distance-ordered bounce kernel that
sweeps only what a tile can reach, and PIPELINED SAMPLE STREAMS.

Why multiple streams (measured, round 3): one bounce is a 3-program chain
(regen -> lists -> kernel) whose device compute is ~8 ms at 512x384, but a
DEPENDENT program launch through the axon tunnel adds ~8 ms latency per
hop — a single chained stream runs at ~28 ms/bounce while independent
launches pipeline at compute cost (measured: kernel-only 4.9 ms,
independent alternation 5.3 ms, dependent chain 28.4 ms). Splitting the
sample budget into n_streams independent wavefronts (disjoint sample-index
ranges via per-stream ip_offset) keeps the pipeline fed: stream B's bounce
dispatches while stream A's executes. The estimator is unchanged — each
pixel's samples are a disjoint union over streams, and per-pixel completed
counts weight the image exactly.

Determinism carve-out (mirrors parallel/stream_shard.py): a lane's
uniforms depend only on (pixel, ip_offset + sample index), so images are
deterministic for a FIXED n_streams but change if n_streams changes
(n_streams=1 reproduces the round-2 single-stream images bit-for-bit).

Sorting (sort_every > 0) is available but DEFAULTS OFF: the round-3 sweep
measured the row-wise bin sort at 56 ms against a 4.9 ms kernel whose cost
it does not reduce (pixel-block tiles stay origin-coherent without it);
within the binned path, sorting on/off and culled/full-sweep remain
BIT-EQUAL per stream (tests pin this). Against the CLASSIC megakernel the
match is exact up to the documented razor-flip floor (~1e-4 FMA
contraction differences flipping rare discrete events on deep paths).

Restrictions (v5 of the binned path): split_budget == 1 only. All AOV
modes incl. UV run in-kernel (lat/long via the polynomial atan2 in
ops/megakernel.py::_atan2_poly — Mosaic-proven ops only).
Next-event estimation IS supported (fused mode): a diffuse vertex marks
per-slot pending bits and the shadow resolves ONE LAUNCH LATER — the XLA
prep stage draws the light-cone direction from the concrete vertex point,
the list builder unions the shadow rays' reach into the tile lists
(forced into the swept prefix), and the kernel folds per-slot occluder
minima through the same chunk walk as the main sweep (see
ops/megakernel.py NEE plane comments). Thin-lens DoF is supported
(regen_binned carries the same lens block as the classic streaming
kernel's in-kernel regen; the accel grid bounds cover the aperture disc),
and adaptive sampling works via step_adaptive / per-pixel budget arrays
gathered through the pixel plane.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from smallpt_tpu.config import RenderConfig, Mode
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.scene import SphereScene
from smallpt_tpu.ops import accel as acc
from smallpt_tpu.ops.megakernel import (
    _stream_pending_dev,
    binned_image,
    build_camera_vec,
    build_scene_table,
    init_binned_state,
    set_binned_budget,
    stream_step_binned,
)
from smallpt_tpu.utils.metrics import RenderStats

# Sample-index stride between streams: stream j draws ip in
# [j*IP_STRIDE, ...). Keying v2 is injective in ip, so streams never
# collide while per-stream ids stay below the stride. Must exceed
# inflight * _BINNED_SUB_STRIDE (sub-lanes stride 2^20 within a stream):
# 2^26 leaves room for 64 sub-lanes x 2^20 sample ids, and 16 streams
# still fit int32.
IP_STRIDE = 1 << 26


@dataclasses.dataclass
class _Stream:
    f: jnp.ndarray
    i: jnp.ndarray
    budget: int = 0
    budgets: np.ndarray | None = None  # per-pixel (adaptive), else None
    ip_offset: int = 0


def build_accel_for_camera(scene, camera, config) -> acc.GridAccel:
    """Grid accel whose bounds cover the scene AND the camera's primary-ray
    origins (pushed-forward image-plane corners, plus the aperture disc
    extent under thin-lens DoF) so camera rays bin into FINITE cells — an
    origin clamped into an infinite-extent border cell reaches every
    chunk."""
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
        ap = float(config.aperture)
        ra = a_v / max(np.linalg.norm(a_v), 1e-12)
        rb = b_v / max(np.linalg.norm(b_v), 1e-12)
        pts = [
            p + s * ap * e
            for p in pts
            for s, e in ((0, ra), (-1, ra), (1, ra), (-1, rb), (1, rb))
        ]
    return acc.build_grid_accel(scene, extra_points=np.asarray(pts))


def _default_streams() -> int:
    # measured round 3: the tunnel client blocks in-thread at each
    # dependent dispatch, so host-side stream interleaving cannot overlap
    # chains — oversubscription (inflight) is the lever that works
    return 1


def _default_inflight() -> int:
    # 4 lanes per pixel on TPU amortizes the ~24 ms 3-hop bounce latency
    # over 4x rays; 1 on CPU (tests run the interpreter; bit-exact
    # compatibility with the single-lane layout)
    return 4 if jax.default_backend() == "tpu" else 1


class BinnedStreamingRenderer:
    """Continuous-wavefront renderer with grid-binned sweep culling and
    pipelined sample streams.

    step(add_samples, n_bounces): extend every pixel's budget (split
    across streams) and advance every stream n_bounces culled bounces
    (one kernel launch each; chunk lists recomputed per bounce)."""

    def __init__(
        self,
        scene: SphereScene,
        camera,
        config: RenderConfig,
        seed: int = 0,
        accel: acc.GridAccel | None = None,
        sort_every: int = 0,
        k_near: int | None = None,
        n_streams: int | None = None,
        inflight: int | None = None,
        fused: bool = True,
    ):
        if config.split_budget != 1:
            raise ValueError("binned streaming: split_budget=1 (the FLAT "
                             "scheduler is the splitting fidelity mode)")
        if config.nee_lights and config.mode != Mode.FULL:
            raise ValueError("binned streaming: nee_lights require Mode.FULL")
        if config.nee_lights and not fused:
            raise ValueError(
                "binned NEE needs the fused bounce (shadow rays resolve in "
                "one launch via full-reach shadow lists; the 3-program "
                "distance-ordered path has no shadow marching)"
            )
        if not isinstance(scene, SphereScene):
            raise TypeError("binned streaming renders SphereScenes")
        self.scene = scene
        self.camera = camera
        self.config = config
        if accel is None:
            accel = build_accel_for_camera(scene, camera, config)
        self.accel = accel
        self.sort_every = sort_every
        # near-prefix length per non-pending tile; a device scalar so tuning
        # sweeps re-use one compiled program (value, not shape)
        from smallpt_tpu.ops.megakernel import K_NEAR

        self.k_near = jnp.asarray(
            K_NEAR if k_near is None else k_near, jnp.int32
        )
        self.fused = fused
        self.n_streams = (
            _default_streams() if n_streams is None else int(n_streams)
        )
        # samples in flight per pixel (power of two): oversubscribes lanes
        # M-fold inside ONE state so each launch carries M x the rays —
        # amortizing the tunnel's fixed per-bounce latency, which a
        # multi-stream host loop cannot hide (dispatch blocks in-thread)
        self.inflight = (
            _default_inflight() if inflight is None else int(inflight)
        )
        self.key = prng.base_key(seed)
        base_table = build_scene_table(scene, config)
        self.table = jnp.take(base_table, self.accel.order, axis=0)
        self.nee_rows = self._light_rows()
        self.cam_vec = build_camera_vec(camera, config)
        self.streams = [
            _Stream(*init_binned_state(config, self.inflight),
                    ip_offset=j * IP_STRIDE)
            for j in range(self.n_streams)
        ]
        self._bounce_idx = 0
        self.stats = RenderStats()
        self._bounce = self._make_bounce()

    # ---- single-stream compatibility views (tests, stage benches) --------
    @property
    def f(self):
        return self.streams[0].f

    @f.setter
    def f(self, v):
        self.streams[0].f = v

    @property
    def i(self):
        return self.streams[0].i

    @i.setter
    def i(self, v):
        self.streams[0].i = v

    @property
    def budget(self) -> int:
        return sum(s.budget for s in self.streams)

    @property
    def _budgets(self):
        if all(s.budgets is None for s in self.streams):
            return None
        g = self.config.n_pixels
        tot = np.zeros((g,), np.int64)
        for s in self.streams:
            tot += (
                s.budgets if s.budgets is not None
                else np.full((g,), s.budget, np.int64)
            )
        return tot.astype(np.int32)

    def _light_rows(self) -> tuple:
        """config.nee_lights are ORIGINAL scene indices; the binned table
        is permuted by accel.order, so the kernel's static light rows are
        each light's first occurrence in the reordered table (padding
        duplicates sit after the originals and never win the strict-<
        min-fold)."""
        if not self.config.nee_lights:
            return ()
        order = np.asarray(self.accel.order)
        return tuple(
            int(np.nonzero(order == li)[0][0])
            for li in self.config.nee_lights
        )

    def _make_bounce(self):
        config, accel = self.config, self.accel
        table, inflight = self.table, self.inflight
        nee_rows = self.nee_rows

        import functools

        from smallpt_tpu.ops.megakernel import regen_binned

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def fused_bounce(f, i, cam_vec, key, ip_offset, k_near):
            # ONE program per bounce: regen + reach lists + kernel fused.
            # Same-program dependent relaunches run at pure compute cost on
            # the tunnel, while distinct-program dependency hops cost
            # ~0.65 ms/MB of state (measured round 3: 3-program chain
            # 68 ms vs 18 ms of compute at 786k lanes). No lax.sort /
            # argsort / scatter inside (remote-compile pathology / TPU
            # serialization): lists come from the bucketed one-hot ranking
            # (tile_work_lists_bucketed), which keeps the near-first
            # prefix + pending mechanism — a dcut-free full-reach sweep
            # measured ~198 ms/bounce vs ~12 ms for the prefix kernel.
            f, i = regen_binned(f, i, cam_vec, config, key,
                                ip_offset=ip_offset, inflight=inflight)
            shadow_keys = None
            if nee_rows:
                # deferred NEE: draw shadow directions (once — bin keys
                # and the kernel sweep must see bit-identical rays) and
                # union their reach into this launch's lists
                f, shadow_keys = acc.nee_shadow_prep(
                    f, i, table, config, accel, key,
                    ip_offset=ip_offset, inflight=inflight,
                    nee_rows=nee_rows,
                )
            lists, stops, dcut = acc.tile_work_lists_bucketed(
                f, i, config, accel, k_near=k_near,
                shadow_keys=shadow_keys,
            )
            return stream_step_binned(
                table, config, key, f, i, lists, stops, dcut,
                ip_offset=ip_offset,
                n_glob_chunks=accel.n_glob_chunks,
                n_chunks=accel.n_chunks,
                inflight=inflight,
                geo_lo=accel.geo_lo,
                geo_hi=accel.geo_hi,
                nee_rows=nee_rows,
            )

        @jax.jit
        def lists_of(f, i, k_near):
            return acc.tile_work_lists(f, i, config, accel, k_near=k_near)

        def bounce_3prog(table, cam_vec, key, f, i, ip_offset):
            # THREE separate programs, not one fused jit: on this
            # toolchain monolithic programs mixing XLA sorts/argsorts with
            # a pallas_call hit multi-ten-minute remote-compile
            # pathologies, while the pieces compile in seconds
            # (regen ~1s, lists ~20s, kernel ~2s measured). The extra
            # dispatches are async and fetch-free; the per-hop dependency
            # latency is hidden by interleaving the OTHER streams.
            from smallpt_tpu.ops.megakernel import regen_binned

            f, i = regen_binned(f, i, cam_vec, config, key,
                                ip_offset=ip_offset,
                                inflight=self.inflight)
            lists, stops, dcut = lists_of(f, i, self.k_near)
            return stream_step_binned(
                table, config, key, f, i, lists, stops, dcut,
                ip_offset=ip_offset,
                n_glob_chunks=accel.n_glob_chunks,
                n_chunks=accel.n_chunks,
                inflight=self.inflight,
                geo_lo=accel.geo_lo,
                geo_hi=accel.geo_hi,
            )

        @jax.jit
        def keys_of(f, i):
            return acc.state_bin_keys(f, i, accel)

        def shuffle(f, i):
            return acc.shuffle_state(f, i, keys_of(f, i))

        if self.fused:
            def bounce(table, cam_vec, key, f, i, ip_offset):
                return fused_bounce(f, i, cam_vec, key, ip_offset,
                                    self.k_near)
        else:
            bounce = bounce_3prog

        return bounce, shuffle

    def _advance_dev(self, n_bounces: int):
        """Advance n_bounces without any host fetch; returns the rays-traced
        total as a DEVICE scalar so callers can fold it into their own
        single fetch (each host fetch pays a full ~30 ms axon tunnel
        round-trip)."""
        bounce, shuffle = self._bounce
        rays_dev = []
        for _ in range(n_bounces):
            do_sort = (
                self.sort_every and self._bounce_idx % self.sort_every == 0
            )
            # stream-interleaved dispatch: the device executes stream j
            # while the host enqueues stream j+1 (independent chains)
            for s in self.streams:
                if do_sort:
                    s.f, s.i = shuffle(s.f, s.i)
                s.f, s.i, rays = bounce(
                    self.table, self.cam_vec, self.key, s.f, s.i,
                    s.ip_offset,
                )
                # keep counters on device (see docstring)
                rays_dev.append(rays)
            self._bounce_idx += 1
        return sum(rays_dev)

    def _advance(self, n_bounces: int) -> int:
        t0 = time.perf_counter()
        total = int(self._advance_dev(n_bounces))
        self.stats.rays += total
        self.stats.wall_s += time.perf_counter() - t0
        self.stats.passes += 1
        return total

    def _split(self, add: int) -> list[int]:
        d, rem = divmod(add, self.n_streams)
        return [d + (1 if j < rem else 0) for j in range(self.n_streams)]

    def step(self, add_samples: int = 1, n_bounces: int = 8) -> int:
        """Returns rays traced this step."""
        for s, extra in zip(self.streams, self._split(add_samples)):
            s.budget += extra
            s.i = set_binned_budget(
                s.i, s.budget, self.config, inflight=self.inflight
            )
        return self._advance(n_bounces)

    def step_timed(self, target_ms: float = 33.0,
                   add_samples: int = 1) -> int:
        """Equal-time display step (engine/streaming.py::step_timed on the
        binned path): advance the culled wavefront for ~target_ms of wall
        clock by converting the EMA-tracked bounce rate into a bounce
        budget. This is the interactive cadence of the reference's UI loop
        (one render pass per display frame, smallpt.cpp:946-988) for
        big scenes: each display frame costs ~target_ms regardless of
        sphere count, and the completed-sample weights keep the displayed
        estimate consistent at any interruption point. Returns rays."""
        rate = getattr(self, "_bounces_per_s", None)
        if rate is None:
            n = 4  # bootstrap guess; corrected after one measurement
        else:
            n = max(1, int(rate * target_ms / 1e3))
        t0 = time.perf_counter()
        rays = self.step(add_samples=add_samples, n_bounces=n)
        dt = max(time.perf_counter() - t0, 1e-4)
        inst = n / dt
        self._bounces_per_s = (
            inst if rate is None else 0.7 * rate + 0.3 * inst
        )
        return rays

    def _combined_moments(self):
        """Per-pixel (mean, var, n) of completed-sample luminances combined
        over streams (m1/m2/n all add) — the adaptive/quality signal."""
        from smallpt_tpu.ops.megakernel import binned_variance

        G = self.config.n_pixels
        m1 = np.zeros((G,), np.float64)
        m2 = np.zeros((G,), np.float64)
        nn = np.zeros((G,), np.float64)
        for s in self.streams:
            mean_j, var_j, n_j = binned_variance(
                s.f, s.i, self.config, inflight=self.inflight
            )
            mean_j = np.asarray(mean_j, np.float64).reshape(-1)
            var_j = np.asarray(var_j, np.float64).reshape(-1)
            n_j = np.asarray(n_j, np.float64).reshape(-1)
            m1 += mean_j * n_j
            m2 += (var_j + mean_j * mean_j) * n_j
            nn += n_j
        n_safe = np.maximum(nn, 1.0)
        mean = m1 / n_safe
        var = np.maximum(m2 / n_safe - mean * mean, 0.0)
        return mean, var, nn

    def step_to_quality(self, rel_err: float = 0.02, quantile: float = 0.95,
                        max_spp: int = 4096, min_spp: int = 16,
                        n_bounces: int = 8, adaptive: bool = True) -> dict:
        """engine/streaming.py::step_to_quality on the binned path: add
        samples (adaptively by default) until the per-pixel relative
        stderr of the luminance mean is <= rel_err at the given pixel
        quantile, then drain. max_spp bounds the TOTAL pool (see
        engine/quality.py::drive_to_quality, which both renderers share).
        Returns {"spp_min", "spp_max", "rel_err_q", "rounds"} measured
        AFTER the drain."""
        from smallpt_tpu.engine.quality import drive_to_quality

        return drive_to_quality(
            n_pixels=self.config.n_pixels,
            have_spp=sum(s.budget for s in self.streams),
            moments=self._combined_moments,
            step_uniform=lambda add: self.step(
                add_samples=add, n_bounces=n_bounces
            ),
            step_adaptive=lambda total: self.step_adaptive(
                n_bounces=n_bounces, add_samples_total=total
            ),
            flush=self.flush,
            rel_err=rel_err, quantile=quantile,
            max_spp=max_spp, min_spp=min_spp, adaptive=adaptive,
        )

    def step_adaptive(self, n_bounces: int = 8,
                      add_samples_total: int | None = None) -> int:
        """Variance-adaptive step (engine/streaming.py::step_adaptive
        semantics on the binned path): distribute a pool of new samples
        across pixels proportional to their luminance standard deviation
        (capped at 8x the mean share, uniform floor of 1 when affordable),
        then advance n_bounces culled bounces. Per-pixel allocations are
        split round-robin across streams (exact totals)."""
        from smallpt_tpu.engine.quality import adaptive_allocation

        G = self.config.n_pixels
        if add_samples_total is None:
            add_samples_total = G
        mean, var, nn = self._combined_moments()
        sigma = np.sqrt(var) + 1e-3
        extra = adaptive_allocation(sigma, add_samples_total, G)
        for j, s in enumerate(self.streams):
            # pixel p's extra split round-robin, offset by j so remainders
            # rotate across streams
            share = (extra + (self.n_streams - 1 - j)) // self.n_streams
            if s.budgets is None:
                s.budgets = np.full((G,), s.budget, np.int64)
            s.budgets = s.budgets + share
            s.i = set_binned_budget(
                s.i, jnp.asarray(s.budgets, jnp.int32), self.config,
                inflight=self.inflight,
            )
            s.budget = int(s.budgets.min())
        return self._advance(n_bounces)

    def pending(self) -> tuple:
        """(n_alive, n_can_regen) summed over streams — ONE device fetch.
        With NEE, lanes holding unresolved deferred-shadow bits count as
        alive so flush() drains them."""
        has_nee = bool(self.config.nee_lights)
        both = np.asarray(
            jnp.stack([
                _stream_pending_dev(s.i, has_nee=has_nee)
                for s in self.streams
            ])
        ).sum(axis=0)
        return (int(both[0]), int(both[1]))

    def flush(self) -> None:
        """Drain all in-flight paths and remaining budget; afterwards
        image() is the exact per-pixel MC estimate.

        One host fetch per drain iteration: the advance's rays-traced total
        rides the SAME fetch as the pending counts (each fetch is a ~30 ms
        tunnel round-trip, so the old pending-then-advance pair of fetches
        cost as much host time as a whole 8-bounce advance computes)."""
        has_nee = bool(self.config.nee_lights)
        p = self.pending()
        if p == (0, 0):
            return
        while True:
            t0 = time.perf_counter()
            rays_d = self._advance_dev(8)
            packed = np.asarray(jnp.concatenate([
                jnp.asarray(rays_d, jnp.int32)[None],
                sum(
                    _stream_pending_dev(s.i, has_nee=has_nee)
                    for s in self.streams
                ),
            ]))
            rays, p_new = int(packed[0]), (int(packed[1]), int(packed[2]))
            self.stats.rays += rays
            self.stats.wall_s += time.perf_counter() - t0
            self.stats.passes += 1
            if p_new == (0, 0):
                return
            # progress = rays traced OR the pending counts changed: ray
            # counts alone miss the NEE tail (a launch that only resolves
            # deferred shadows finalizes zero rays), and pending counts
            # alone can legitimately repeat (lanes die and regenerate in
            # equal numbers)
            if rays == 0 and p_new == p:
                raise RuntimeError("flush made no progress (paths stuck?)")
            p = p_new

    def accumulators(self):
        """(radiance sums (H,W,3), completed-sample weights (H,W)), summed
        over streams (disjoint sample ranges => exact union estimator)."""
        rad = None
        w = None
        for s in self.streams:
            rad_j, w_j = binned_image(
                s.f, s.i, self.config, inflight=self.inflight
            )
            rad = rad_j if rad is None else rad + rad_j
            w = w_j if w is None else w + w_j
        return rad, w

    def reset(self, seed: int | None = None) -> None:
        """Fresh render state (streams, budgets, accumulators, stats; new
        key if seed is given) WITHOUT rebuilding the bounce closures:
        _make_bounce's per-instance jits cost a re-trace per renderer,
        the bulk of the product-surface drain gap the r3 verdict measured
        (bench.py --procedural at 0.18 Mrays/s vs 1.46 engine-level —
        renderer rebuilt per round)."""
        if seed is not None:
            self.key = prng.base_key(seed)
        for s in self.streams:
            s.f, s.i = init_binned_state(self.config, self.inflight)
            s.budget = 0
            s.budgets = None
        self._bounce_idx = 0
        self.stats = RenderStats()

    def update_camera(self, camera) -> None:
        self.camera = camera
        self.cam_vec = build_camera_vec(camera, self.config)
        self.reset()

    def update_scene(self, scene: SphereScene) -> None:
        """Swap scene geometry/materials: rebuild the grid accel (chunk
        AABBs, reach tables and the chunk-sorted scene table all depend on
        geometry) and restart the wavefront — the reference's
        accumulation-reset-on-change semantics (smallpt.cpp:931-939).

        Exception-safe: everything is built into locals first, so a scene
        the accel can't bin leaves self fully consistent on the OLD scene
        (callers catch and keep rendering — engine/progressive.py)."""
        accel = build_accel_for_camera(scene, self.camera, self.config)
        base_table = build_scene_table(scene, self.config)
        self.scene = scene
        self.accel = accel
        self.table = jnp.take(base_table, accel.order, axis=0)
        self.nee_rows = self._light_rows()
        self._bounce = self._make_bounce()
        self.reset()

    # -- checkpoint / resume (SURVEY.md §5.4 on the binned path): the full
    # resumable state is every stream's plane state + budgets + key ----------
    def save_checkpoint(self, path: str) -> None:
        G = self.config.n_pixels
        budgets = np.stack([
            np.asarray(s.budgets) if s.budgets is not None
            else np.full((G,), s.budget, np.int64)
            for s in self.streams
        ])
        np.savez(
            path,
            f=np.stack([np.asarray(s.f) for s in self.streams]),
            i=np.stack([np.asarray(s.i) for s in self.streams]),
            budget=np.asarray([s.budget for s in self.streams]),
            budgets=budgets,
            has_budgets=np.asarray(
                [s.budgets is not None for s in self.streams]
            ),
            key=np.asarray(jax.random.key_data(self.key)),
            n_streams=self.n_streams,
            inflight=self.inflight,
            bounce_idx=self._bounce_idx,
            stats_rays=self.stats.rays,
            stats_passes=self.stats.passes,
            stats_wall=self.stats.wall_s,
            stream_key_version=prng.STREAM_KEY_VERSION,
        )

    def load_checkpoint(self, path: str) -> None:
        data = np.load(path)
        ck_ver = (int(data["stream_key_version"])
                  if "stream_key_version" in data else 1)
        if ck_ver != prng.STREAM_KEY_VERSION:
            raise ValueError(
                f"binned checkpoint uses sample-keying v{ck_ver}; this "
                f"build uses v{prng.STREAM_KEY_VERSION} (resuming would "
                "mix incompatible sample streams) — re-render from scratch"
            )
        if int(data["n_streams"]) != self.n_streams or (
            int(data["inflight"]) != self.inflight
        ):
            raise ValueError(
                "binned checkpoint stream layout mismatch: saved "
                f"n_streams={int(data['n_streams'])}/inflight="
                f"{int(data['inflight'])} vs this renderer's "
                f"{self.n_streams}/{self.inflight} (lane->sample keying "
                "differs; images would mix streams)"
            )
        for j, s in enumerate(self.streams):
            if data["f"][j].shape != s.f.shape or (
                data["i"][j].shape != s.i.shape
            ):
                raise ValueError(
                    "incompatible binned checkpoint plane layout: "
                    f"f{data['f'][j].shape}/i{data['i'][j].shape} vs "
                    f"current f{s.f.shape}/i{s.i.shape}"
                )
            s.f = jnp.asarray(data["f"][j])
            s.i = jnp.asarray(data["i"][j])
            s.budget = int(data["budget"][j])
            s.budgets = (
                np.asarray(data["budgets"][j])
                if bool(data["has_budgets"][j]) else None
            )
        self.key = jax.random.wrap_key_data(jnp.asarray(data["key"]))
        self._bounce_idx = int(data["bounce_idx"])
        self.stats.rays = int(data["stats_rays"])
        self.stats.passes = int(data["stats_passes"])
        self.stats.wall_s = float(data["stats_wall"])

    @property
    def image(self) -> np.ndarray:
        from smallpt_tpu.engine.accum import normalize_weighted

        rad, w = self.accumulators()
        return np.asarray(normalize_weighted(rad, w))
