"""Streaming progressive renderer — full-occupancy continuous wavefront.

The per-pass schedulers (FLAT/REGEN/MEGA) drain every sample before
returning, so each pass ends with a long tail of near-empty wavefront
iterations (mean lane occupancy ~40% on the Cornell box — see
utils/metrics.occupancy_profile). The reference has the same structure: its
render thread runs Renderer::render to completion per pass
(smallpt.cpp:922).

Streaming removes the per-pass drain barrier: path state persists across
steps (ops/megakernel.py stream_step), dead lanes immediately regenerate the
next sample of their pixel, and a step is just "advance the wavefront N
iterations". Occupancy stays ~100% until the final flush. Display uses
per-pixel COMPLETED-sample weights (engine/accum.py WeightedAccum semantics
— the reference's unused RenderOutputs design, smallpt.cpp:644-674):

    image = radiance_sums / completed_counts

While streaming, the live image includes the in-flight sample's partial
radiance (a mild brightness underestimate on deep-path pixels, exactly the
kind of approximation a live viewer shows); ``flush()`` drains all in-flight
paths, after which the estimate is the exact per-pixel MC mean. Sample
streams use the v2 streaming keying (core/rng.py::stream_key_words): pixel
and the unbounded in-pixel sample index enter PCG4D as separate words, so
streams stay unique for any budget (< 2^32 spp) at any resolution. v1
packed both into one int32 word and collided inside config 5's
1920x1080@5000spp envelope; v1 checkpoints are refused on load.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from smallpt_tpu.config import RenderConfig
from smallpt_tpu.core import rng as prng
from smallpt_tpu.ops.megakernel import (
    init_stream_state,
    set_sample_budget,
    stream_image,
    stream_pending,
    stream_step,
    stream_variance,
)
from smallpt_tpu.utils.metrics import RenderStats


class StreamingRenderer:
    """Continuous-wavefront progressive renderer (sphere scenes, Mode.FULL).

    step(n_iters, add_samples): extend every pixel's sample budget by
    add_samples and advance the wavefront n_iters bounce iterations.
    """

    def __init__(self, scene, camera, config: RenderConfig, seed: int = 0,
                 dda=None):
        """dda: None = auto (per-ray DDA traversal kernel for big local-
        sphere scenes, ops/stream_dda.py — the measured big-scene winner);
        False = always classic; True = force-build tables; or pass
        prebuilt StreamDDATables. DDA iterations are finer-grained than
        classic bounces (one cell step each) — step() scales n_iters by
        _DDA_ITER_SCALE so callers keep bounce-denominated budgets."""
        self.scene = scene
        self.camera = camera
        self.config = config
        self.key = prng.base_key(seed)  # ONE key for the whole stream
        self._dda = self._dda_tables_for(dda)
        self.f, self.i = self._init()
        self.budget = 0  # scalar allowance (uniform mode); min of budgets
        self._budget_max = 0
        self._budgets = None  # per-pixel budgets once adaptive stepping used
        self.stats = RenderStats()
        # Per-LAUNCH iteration cap (bounce units; None = uncapped). A single
        # kernel launch whose while_loop runs minutes of device time crashes
        # the TPU worker through the axon tunnel (r5e config-5 soak:
        # 10,000 DDA iterations x 254 tiles at 1920x1080 = "TPU worker
        # process crashed"). Long steps/flushes are split into chained
        # launches of at most this many iterations, with a host fetch
        # between chunks so no single RPC blocks for minutes. Large-frame
        # drivers (scripts/config5_soak.py) set this; benchmarks at
        # measured shapes leave it None so numbers stay comparable.
        self.max_launch_iters: int | None = None

    _DDA_ITER_SCALE = 5  # ~ mean walk steps + resolve per bounce

    def _dda_tables_for(self, dda):
        from smallpt_tpu.core.scene import SphereScene
        from smallpt_tpu.ops.stream_dda import (StreamDDATables,
                                                build_stream_dda_tables)

        if dda is False or dda is None and not self._dda_auto():
            return None
        if isinstance(dda, StreamDDATables):
            return dda
        return build_stream_dda_tables(self.scene, self.config)

    def _dda_auto(self) -> bool:
        """Route big local-sphere scenes through the DDA kernel: measured
        winner above the classic megakernel's scene-size sweet spot
        (BASELINE.md r5 section); classic keeps multi-light NEE scenes
        (the DDA shadow walk carries one slot) and small scenes (sweep
        beats gather setup)."""
        from smallpt_tpu.core.scene import SphereScene
        from smallpt_tpu.ops.megakernel import MEGA_MAX_SPHERES

        return (
            isinstance(self.scene, SphereScene)
            and len(self.config.nee_lights or ()) <= 1
            and self.scene.n_spheres > MEGA_MAX_SPHERES
        )

    def _init(self):
        if self._dda is not None:
            from smallpt_tpu.ops.stream_dda import init_stream_dda_state

            return init_stream_dda_state(self.config)
        return init_stream_state(self.config)

    def _advance(self, budget, n_iters):
        """One kernel launch: classic bounces or scaled DDA iterations."""
        if self._dda is not None:
            from smallpt_tpu.ops.stream_dda import stream_step_dda

            return stream_step_dda(
                self.scene, self.camera, self.config, self.key,
                self.f, self.i, budget, n_iters * self._DDA_ITER_SCALE,
                self._dda,
            )
        return stream_step(
            self.scene, self.camera, self.config, self.key,
            self.f, self.i, budget, n_iters,
        )

    def step(self, n_iters: int = 64, add_samples: int = 1) -> int:
        """Returns rays traced this step."""
        self.budget += add_samples
        self._budget_max = max(self._budget_max, self.budget)
        t0 = time.perf_counter()
        n = 0
        budget = self.budget
        for chunk in self._launch_chunks(n_iters):
            self.f, self.i, rays = self._advance(budget, chunk)
            n += int(rays)
            budget = None  # budget plane already raised by the first launch
        self.stats.rays += n
        self.stats.wall_s += time.perf_counter() - t0
        self.stats.passes += 1
        return n

    def _launch_chunks(self, n_iters: int):
        """Split an iteration budget into per-launch chunks of at most
        max_launch_iters (single chunk when uncapped)."""
        cap = self.max_launch_iters
        if cap is None or n_iters <= cap:
            yield n_iters
            return
        done = 0
        while done < n_iters:
            yield min(cap, n_iters - done)
            done += cap

    def step_timed(self, target_ms: float = 33.0, add_samples: int = 1) -> int:
        """Equal-time display step: advance the wavefront for ~target_ms of
        wall clock by converting the measured iteration rate into an
        iteration budget (EMA-tracked across steps). This is the interactive
        cadence the reference's UI loop implies (one render pass per display
        frame, smallpt.cpp:946-988) without tying frame time to pass
        structure: each display frame costs ~target_ms regardless of scene
        or resolution, and the streaming weights keep the displayed estimate
        consistent at any interruption point.

        A larger budget also amortizes the per-launch state round-trip
        (every stream_step reads+writes the full plane state through HBM
        once per launch — the dominant cost of tiny steps at 1080p+).
        Returns rays traced."""
        rate = getattr(self, "_iters_per_s", None)
        if rate is None:
            n = 32  # bootstrap guess; corrected after one measurement
        else:
            n = max(1, int(rate * target_ms / 1e3))
        t0 = time.perf_counter()
        rays = self.step(n_iters=n, add_samples=add_samples)
        dt = max(time.perf_counter() - t0, 1e-4)
        inst = n / dt
        self._iters_per_s = (
            inst if rate is None else 0.7 * rate + 0.3 * inst
        )
        return rays

    def step_adaptive(self, n_iters: int = 256, add_samples_total: int | None = None) -> int:
        """Variance-adaptive step: distribute a pool of new samples across
        pixels proportionally to their luminance standard deviation (the
        near-optimal allocation for per-pixel MC error), then advance the
        wavefront. Uses the in-kernel per-sample moments (stream_variance)
        and the per-lane budget plane — the capability the reference's
        RenderOutputs design points at but never uses (smallpt.cpp:644-674).

        Caveat (documented estimator property): allocating by observed
        variance correlates sample counts with sample values, which the
        per-pixel weight normalization (completed counts) handles; the
        residual adaptive-sampling bias is the standard one and vanishes as
        budgets grow."""
        G = self.config.n_pixels
        if add_samples_total is None:
            add_samples_total = G  # ~1 sample/pixel worth of new work
        from smallpt_tpu.engine.quality import adaptive_allocation

        _, var, n = stream_variance(self.f, self.i, self.config)
        sigma = np.sqrt(np.asarray(var).reshape(-1)) + 1e-3
        extra = adaptive_allocation(sigma, add_samples_total, G).astype(
            np.int32
        )
        budgets = np.asarray(
            jnp.asarray(self._budgets) if self._budgets is not None
            else np.full((G,), self.budget, np.int32)
        ) + extra
        self._budgets = jnp.asarray(budgets, jnp.int32)
        self.i = set_sample_budget(self.i, self._budgets, self.config)
        self.budget = int(budgets.min())
        self._budget_max = int(budgets.max())
        t0 = time.perf_counter()
        n_rays = 0
        for chunk in self._launch_chunks(n_iters):
            self.f, self.i, rays = self._advance(None, chunk)
            n_rays += int(rays)
        self.stats.rays += n_rays
        self.stats.wall_s += time.perf_counter() - t0
        self.stats.passes += 1
        return n_rays

    def step_to_quality(self, rel_err: float = 0.02, quantile: float = 0.95,
                        max_spp: int = 4096, min_spp: int = 16,
                        n_iters: int = 256, adaptive: bool = True) -> dict:
        """Equal-QUALITY driver: add samples until the per-pixel relative
        standard error of the luminance mean is <= rel_err at the given
        pixel quantile (or max_spp is reached), then drain.

        The reference's only stopping rules are a fixed spp count (legacy,
        smallpt.cpp:276) and "run forever" (interactive); this is the
        production-render third mode the RenderOutputs accumulator design
        points toward. Budget grows geometrically (one host fetch of the
        moment planes per doubling), allocated adaptively by default
        (step_adaptive's sigma-proportional split). rel stderr uses
        sqrt(var/n) / (|mean| + 1e-2): the epsilon keeps near-black pixels
        from demanding unbounded samples for invisible error.

        max_spp bounds the TOTAL sample pool at max_spp * n_pixels (the
        cost of a uniform max_spp render): adaptive allocation may push
        hot pixels above it and leave converged ones below. Returns
        {"spp_min", "spp_max", "rel_err_q", "rounds"} measured AFTER the
        final drain (engine/quality.py::drive_to_quality)."""
        from smallpt_tpu.engine.quality import drive_to_quality

        def moments():
            mean, var, n = stream_variance(self.f, self.i, self.config)
            return (
                np.asarray(mean, np.float64).reshape(-1),
                np.asarray(var, np.float64).reshape(-1),
                np.asarray(n, np.float64).reshape(-1),
            )

        return drive_to_quality(
            n_pixels=self.config.n_pixels,
            have_spp=self.budget,
            moments=moments,
            step_uniform=lambda add: self.step(
                n_iters=n_iters, add_samples=add
            ),
            step_adaptive=lambda total: self.step_adaptive(
                n_iters=n_iters, add_samples_total=total
            ),
            flush=self.flush,
            rel_err=rel_err, quantile=quantile,
            max_spp=max_spp, min_spp=min_spp, adaptive=adaptive,
        )

    def flush(self) -> None:
        """Drain all in-flight paths (no new budget): after this, image() is
        the exact MC estimate over each pixel's budgeted sample count."""
        # per-round iteration cap scaled to the OUTSTANDING work (a lane may
        # still owe up to its whole budget of samples x max_depth bounces);
        # progress is monitored via the pending counters, so a healthy
        # stream always terminates and a genuinely stuck one raises
        cap = self.config.max_depth * max(self._budget_max, 1) + 64
        capped = self.max_launch_iters is not None and self.max_launch_iters < cap
        if capped:
            cap = self.max_launch_iters
        # Stall detection: with the UNCAPPED cap, one advance over-covers all
        # outstanding work, so identical pending counts across two rounds
        # mean a genuinely stuck stream. With capped rounds the counts are
        # NOT a per-round progress signal — while a backlog drains, every
        # lane still owes work and (n_alive, n_can_regen) legitimately sits
        # constant for many rounds (the r5f config-5 solo flush crashed on
        # exactly this after rendering all 5000 spp). Allow enough identical
        # rounds to cover one worst-case bounce of the last pending lane
        # (DDA walk <= ~2x grid diameter per bounce) across max_depth.
        stall_limit = (
            1 if not capped
            else max(3, (self.config.max_depth * 40) // max(cap, 1) + 2)
        )
        last_pending = None
        unchanged = 0
        while True:
            pending = stream_pending(self.i)
            if pending == (0, 0):
                return
            if pending == last_pending:
                unchanged += 1
                if unchanged >= stall_limit:
                    raise RuntimeError(
                        "flush made no progress (paths stuck?)"
                    )
            else:
                unchanged = 0
            last_pending = pending
            self.f, self.i, rays = self._advance(None, cap)
            self.stats.rays += int(rays)

    def accumulators(self):
        """(radiance sums, completed-sample weights) — WeightedAccum pair."""
        return stream_image(self.f, self.i, self.config)

    # -- invalidation (the reference's camera-update accumulation reset,
    # smallpt.cpp:906-920) -----------------------------------------------------
    def reset(self) -> None:
        self.f, self.i = self._init()
        self.budget = 0
        self._budget_max = 0
        self._budgets = None

    def update_camera(self, camera) -> None:
        self.camera = camera
        self.reset()

    def update_scene(self, scene) -> None:
        self.scene = scene
        if self._dda is not None:
            # grid tables are per-scene; rebuild (stays on the DDA path —
            # interactive scene edits don't re-litigate the routing choice)
            from smallpt_tpu.ops.stream_dda import build_stream_dda_tables

            self._dda = build_stream_dda_tables(self.scene, self.config)
        self.reset()

    # -- checkpoint / resume (SURVEY.md §5.4): the full stream state ---------
    def save_checkpoint(self, path: str) -> None:
        np.savez(
            path,
            f=np.asarray(self.f),
            i=np.asarray(self.i),
            budget=self.budget,
            key=np.asarray(jax.random.key_data(self.key)),
            stats_rays=self.stats.rays,
            stats_passes=self.stats.passes,
            stats_wall=self.stats.wall_s,
            stream_key_version=prng.STREAM_KEY_VERSION,
            dda=self._dda is not None,
        )

    def load_checkpoint(self, path: str) -> None:
        from smallpt_tpu.ops import megakernel as mk

        data = np.load(path)
        ck_ver = int(data["stream_key_version"]) if "stream_key_version" in data else 1
        if ck_ver != prng.STREAM_KEY_VERSION:
            raise ValueError(
                f"stream checkpoint uses sample-keying v{ck_ver}; this build "
                f"uses v{prng.STREAM_KEY_VERSION} (resuming would mix "
                "incompatible sample streams) — re-render from scratch"
            )
        f = jnp.asarray(data["f"])
        i = jnp.asarray(data["i"])
        ck_dda = bool(data["dda"]) if "dda" in data else False
        if ck_dda != (self._dda is not None):
            raise ValueError(
                f"stream checkpoint traversal mode (dda={ck_dda}) does not "
                f"match this renderer (dda={self._dda is not None}) — "
                "construct the renderer with the matching dda= option"
            )
        if ck_dda:
            from smallpt_tpu.ops import stream_dda as sd

            nf, ni = sd._nf_d(self.config), sd._NI_D
        else:
            nf, ni = mk._NF, mk._NI
        from smallpt_tpu.ops.megakernel import _stream_geometry

        # validate the FULL shape, lane count included: a checkpoint from a
        # different resolution passes a rows-only check and then fails deep
        # inside set_sample_budget on the first step (r5e part2 resumed a
        # stale toy-shape npz at 1920x1080 and broadcast-crashed)
        _, _, _, n_cols = _stream_geometry(self.config, None)
        want_f = (8 * nf, n_cols)
        want_i = (8 * ni, n_cols)
        if f.shape != want_f or i.shape != want_i:
            raise ValueError(
                f"incompatible stream checkpoint: f{tuple(f.shape)}/"
                f"i{tuple(i.shape)} vs this renderer's {want_f}/{want_i} "
                "(plane rows x padded lanes) — resolution/mode mismatch or "
                "a stale checkpoint file"
            )
        self.f, self.i = f, i
        # per-pixel budgets live in the checkpointed budget plane — restore
        # the host-side bookkeeping from it
        G = self.config.n_pixels
        plane = np.asarray(
            i[8 * mk._I_BUDGET:8 * mk._I_BUDGET + 8]
        ).reshape(-1)[:G]
        self._budgets = jnp.asarray(plane, jnp.int32)
        self.budget = int(plane.min())
        self._budget_max = int(plane.max())
        _ = int(data["budget"])  # legacy field, superseded by the plane
        self.key = jax.random.wrap_key_data(jnp.asarray(data["key"]))
        self.stats.rays = int(data["stats_rays"])
        self.stats.passes = int(data["stats_passes"])
        self.stats.wall_s = float(data["stats_wall"])

    @property
    def image(self) -> np.ndarray:
        """Weight-normalized display image (normalization happens on device
        — engine/accum.py::normalize_weighted, the uWeight-shader analog)."""
        from smallpt_tpu.engine.accum import normalize_weighted

        rad, w = self.accumulators()
        return np.asarray(normalize_weighted(rad, w))
