"""Continuous-wavefront streaming for MESH scenes (and any scene the
pure-JAX/XLA shading path serves).

The sphere schedulers got the streaming treatment in round 1 (persistent
Pallas megakernel, engine/streaming.py); mesh scenes were left on the
per-pass REGEN scheduler, whose occupancy decays within a pass and whose
state is rebuilt every pass. This engine closes that asymmetry WITHOUT a
new Mosaic kernel: the bounce is ONE jitted XLA program — stream-keyed
lane regeneration + the existing intersect backend (incl. the grid-culled
mesh kernel, ops/mesh_pallas.py) + the existing shading implementation
(ops/wavefront.py::bounce_step with injected stream-keyed uniforms) —
relaunched per bounce. Same-program dependent relaunches cost pure
compute on the axon tunnel (BASELINE.md tunnel-economics table), so the
XLA composition keeps the streaming schedule's ~100% occupancy without
hand-fused shading.

Keying is the streaming v2 scheme (core/rng.py::stream_*_uniforms): a
lane's uniforms depend only on (key, pixel, ip=sample index, depth) —
placement-invariant, unbounded ip, and replayable by the f64 oracle's
StreamUniformProvider (pinned by tests/test_mesh_stream.py).

Reference slots: the render-forever progressive loop (smallpt.cpp:
901-941) over the accelerated TRIANGLE backend (smallpt.cpp:489-530) —
the reference's primary workload shape.
"""

from __future__ import annotations

import functools
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from smallpt_tpu.config import Mode, RenderConfig
from smallpt_tpu.core import camera as cam
from smallpt_tpu.core import rng as prng
from smallpt_tpu.engine.renderer import (
    _mesh_nee_for,
    _nee_scene_for,
    _render_mesh_accel,
    make_intersect_fn,
)
from smallpt_tpu.ops import wavefront
from smallpt_tpu.utils.metrics import RenderStats


class StreamState(NamedTuple):
    ps: wavefront.PathState  # one lane per pixel
    s_idx: jnp.ndarray  # (G,) int32 current sample index, -1 = not started
    budget: jnp.ndarray  # (G,) int32 per-pixel sample allowance
    acc_rad: jnp.ndarray  # (G,3) completed-sample radiance sums
    acc_w: jnp.ndarray  # (G,) int32 completed-sample counts
    m1: jnp.ndarray  # (G,) completed-sample luminance sums (adaptive signal)
    m2: jnp.ndarray  # (G,) completed-sample luminance square sums


def _init_state(config: RenderConfig) -> StreamState:
    G = config.n_pixels
    dtype = jnp.dtype(config.dtype)
    # distinct buffers (no aliasing): the bounce donates the whole state
    z3 = lambda: jnp.zeros((G, 3), dtype)
    ps = wavefront.PathState(
        org=z3(), dir=z3(), weight=jnp.ones((G, 3), dtype),
        depth=jnp.zeros((G,), jnp.int32), hist=jnp.zeros((G,), jnp.int32),
        alive=jnp.zeros((G,), bool), radiance=z3(),
        suppress=jnp.zeros((G,), jnp.int32),
    )
    return StreamState(
        ps=ps, s_idx=jnp.full((G,), -1, jnp.int32),
        budget=jnp.zeros((G,), jnp.int32), acc_rad=z3(),
        acc_w=jnp.zeros((G,), jnp.int32),
        m1=jnp.zeros((G,), dtype), m2=jnp.zeros((G,), dtype),
    )


@functools.partial(
    jax.jit, static_argnames=("config",), donate_argnums=(3,)
)
def _bounce(scene, camera, key, st: StreamState, config: RenderConfig,
            mesh_accel=None, mesh_nee=None):
    """One streaming bounce: regen dead lanes onto their next sample
    (stream-keyed camera rays), advance everyone one trace+shade step.
    Returns (state, rays_traced_this_bounce)."""
    G = config.n_pixels
    dtype = jnp.dtype(config.dtype)
    pixel = jnp.arange(G, dtype=jnp.int32)
    cols = pixel % config.width
    rows = pixel // config.width

    ps = st.ps
    dead = ~ps.alive
    need = dead & (st.s_idx < st.budget - 1)
    # fold the finished sample of lanes about to regenerate (idle lanes'
    # final samples are folded view-side in accumulators())
    started = st.s_idx >= 0
    fold = need & started
    acc_rad = st.acc_rad + jnp.where(fold[:, None], ps.radiance, 0.0)
    acc_w = st.acc_w + fold.astype(jnp.int32)
    lum = jnp.sum(ps.radiance, axis=-1) * jnp.asarray(1.0 / 3.0, dtype)
    m1 = st.m1 + jnp.where(fold, lum, 0.0)
    m2 = st.m2 + jnp.where(fold, lum * lum, 0.0)
    s_idx = jnp.where(need, st.s_idx + 1, st.s_idx)
    ip = s_idx

    # stream-keyed camera rays for the regenerating lanes
    u_cam = prng.stream_camera_uniforms(key, pixel, ip, dtype)
    js = config.jitter_size
    group = (ip // config.spp_per_cell) % (js * js)
    cell_x = group % js
    cell_y = group // js
    u_lens = (
        prng.stream_lens_uniforms(key, pixel, ip, dtype)
        if config.aperture > 0.0 else None
    )
    org, dirs = cam.generate_rays(
        camera, u_cam, config, cols, rows, cell_x, cell_y, u_lens=u_lens,
    )
    n3 = need[:, None]
    ps = wavefront.PathState(
        org=jnp.where(n3, org, ps.org),
        dir=jnp.where(n3, dirs, ps.dir),
        weight=jnp.where(n3, 1.0, ps.weight).astype(dtype),
        depth=jnp.where(need, 0, ps.depth),
        hist=ps.hist,
        alive=ps.alive | need,
        radiance=jnp.where(n3, 0.0, ps.radiance).astype(dtype),
        suppress=jnp.where(need, 0, ps.suppress),
    )
    rays = jnp.sum(ps.alive.astype(jnp.int32))

    intersect_fn = make_intersect_fn(scene, config, mesh_accel=mesh_accel)
    nee_scene = _nee_scene_for(scene, config, mesh_nee)
    shade_u = lambda depth: prng.stream_shade_uniforms(
        key, pixel, ip, depth, dtype
    )
    nee_u = lambda depth, slot: prng.stream_nee_uniforms(
        key, pixel, ip, depth, slot, dtype
    )
    ps = wavefront.bounce_step(
        ps, intersect_fn, scene.material, config, key, pixel,
        nee_scene=nee_scene, uniform_fns=(shade_u, nee_u),
    )
    ps = ps._replace(alive=ps.alive & (ps.depth < config.max_depth))
    return StreamState(ps, s_idx, st.budget, acc_rad, acc_w, m1, m2), rays


@functools.partial(jax.jit, static_argnames=())
def _pending(ps_alive, s_idx, budget):
    alive = jnp.sum(ps_alive.astype(jnp.int32))
    can = jnp.sum((~ps_alive & (s_idx < budget - 1)).astype(jnp.int32))
    return jnp.stack([alive, can])


class WavefrontStreamingRenderer:
    """Streaming continuous-wavefront renderer over the XLA shading path —
    the mesh-scene analog of engine/streaming.py's StreamingRenderer
    (which remains the faster choice for sphere scenes via the persistent
    Pallas megakernel)."""

    def __init__(self, scene, camera, config: RenderConfig, seed: int = 0):
        if config.split_budget != 1:
            raise ValueError("streaming wavefront: split_budget=1 (FLAT is "
                             "the splitting fidelity mode)")
        if config.mode != Mode.FULL:
            raise ValueError("streaming wavefront renders Mode.FULL")
        self.scene = scene
        self.camera = camera
        self.config = config
        self.key = prng.base_key(seed)
        self.mesh_accel = _render_mesh_accel(scene, config)
        self.mesh_nee = _mesh_nee_for(scene, config)
        self.st = _init_state(config)
        self.budget = 0
        self.stats = RenderStats()

    def reset(self) -> None:
        self.st = _init_state(self.config)
        self.budget = 0
        self.stats = RenderStats()

    def update_camera(self, camera) -> None:
        """Re-aim and restart the wavefront (the reference's accumulation-
        reset-on-change semantics, smallpt.cpp:931-939)."""
        self.camera = camera
        self.reset()

    def update_scene(self, scene) -> None:
        """Swap scene geometry/materials: rebuild the mesh accel and NEE
        triangle-light tables, restart the wavefront. Exception-safe:
        builds into locals first (progressive callers catch and keep the
        old scene on failure)."""
        accel = _render_mesh_accel(scene, self.config)
        nee = _mesh_nee_for(scene, self.config)
        self.scene = scene
        self.mesh_accel = accel
        self.mesh_nee = nee
        self.reset()

    def step_timed(self, target_ms: float = 33.0,
                   add_samples: int = 1) -> int:
        """Equal-time display step (engine/streaming.py::step_timed
        semantics): EMA-tracked bounce rate converts the wall-clock target
        into a bounce budget. Returns rays traced."""
        rate = getattr(self, "_bounces_per_s", None)
        n = 4 if rate is None else max(1, int(rate * target_ms / 1e3))
        t0 = time.perf_counter()
        rays = self.step(n_bounces=n, add_samples=add_samples)
        dt = max(time.perf_counter() - t0, 1e-4)
        inst = n / dt
        self._bounces_per_s = (
            inst if rate is None else 0.7 * rate + 0.3 * inst
        )
        return rays

    def step(self, n_bounces: int = 64, add_samples: int = 1) -> int:
        """Extend every pixel's budget by add_samples and advance the
        wavefront n_bounces. Returns rays traced (ONE host fetch)."""
        self.budget += add_samples
        # ADD to per-pixel budgets (step_adaptive may have made them
        # non-uniform; overwriting with a uniform value could revoke
        # already-granted samples)
        self.st = self.st._replace(budget=self.st.budget + add_samples)
        self.stats.passes += 1
        return self._advance(n_bounces)

    def _advance_dev(self, n_bounces: int):
        """Advance without any host fetch; returns the rays total as a
        device scalar (binned-engine discipline: counters stay on device,
        ~30 ms tunnel RTT per fetch)."""
        rays_dev = []
        for _ in range(n_bounces):
            self.st, rays = _bounce(
                self.scene, self.camera, self.key, self.st, self.config,
                self.mesh_accel, self.mesh_nee,
            )
            rays_dev.append(rays)
        return sum(rays_dev)

    def _advance(self, n_bounces: int) -> int:
        t0 = time.perf_counter()
        total = int(self._advance_dev(n_bounces))  # one fetch closes it
        self.stats.rays += total
        self.stats.wall_s += time.perf_counter() - t0
        return total

    def moments(self):
        """Per-pixel (mean, var, n) of completed-sample luminances — idle
        lanes' final samples folded view-side (stream_variance
        semantics)."""
        st = self.st
        idle = ~st.ps.alive & (st.s_idx >= 0)
        lum = jnp.sum(st.ps.radiance, axis=-1) / 3.0
        m1 = np.asarray(st.m1 + jnp.where(idle, lum, 0.0), np.float64)
        m2 = np.asarray(st.m2 + jnp.where(idle, lum * lum, 0.0), np.float64)
        n = np.asarray(st.acc_w + idle.astype(jnp.int32), np.float64)
        n_safe = np.maximum(n, 1.0)
        mean = m1 / n_safe
        var = np.maximum(m2 / n_safe - mean * mean, 0.0)
        return mean, var, n

    def step_adaptive(self, n_bounces: int = 64,
                      add_samples_total: int | None = None) -> int:
        """Variance-adaptive step (engine/streaming.py semantics): the
        shared sigma-proportional allocation over per-pixel budgets."""
        from smallpt_tpu.engine.quality import adaptive_allocation

        G = self.config.n_pixels
        if add_samples_total is None:
            add_samples_total = G
        _, var, _ = self.moments()
        sigma = np.sqrt(var) + 1e-3
        extra = adaptive_allocation(sigma, add_samples_total, G)
        budgets = np.asarray(self.st.budget, np.int64) + extra
        self.st = self.st._replace(
            budget=jnp.asarray(budgets, jnp.int32)
        )
        self.budget = int(budgets.min())
        return self._advance(n_bounces)

    def step_to_quality(self, rel_err: float = 0.02, quantile: float = 0.95,
                        max_spp: int = 4096, min_spp: int = 16,
                        n_bounces: int = 64, adaptive: bool = True) -> dict:
        """Equal-quality stopping (engine/quality.py::drive_to_quality —
        the same driver the sphere streaming and binned renderers use)."""
        from smallpt_tpu.engine.quality import drive_to_quality

        return drive_to_quality(
            n_pixels=self.config.n_pixels,
            have_spp=self.budget,
            moments=self.moments,
            step_uniform=lambda add: self.step(
                n_bounces=n_bounces, add_samples=add
            ),
            step_adaptive=lambda total: self.step_adaptive(
                n_bounces=n_bounces, add_samples_total=total
            ),
            flush=self.flush,
            rel_err=rel_err, quantile=quantile,
            max_spp=max_spp, min_spp=min_spp, adaptive=adaptive,
        )

    def pending(self) -> tuple:
        both = np.asarray(
            _pending(self.st.ps.alive, self.st.s_idx, self.st.budget)
        )
        return (int(both[0]), int(both[1]))

    def flush(self) -> None:
        """Drain to the exact per-pixel budget (no new samples).

        ONE host fetch per drain round (the rays total rides the same
        fetch as the pending counts — binned flush economics: each fetch
        is a ~30 ms tunnel round-trip). Round cap = max_depth + 8: every
        launch sweeps ALL lanes whether alive or not, so overshooting the
        drain by a multiple of max_depth burns full-width launches on
        dead lanes — measured r4 on the 10k-sphere scene, the old
        4*max_depth cap spent ~2/3 of flush wall on empty launches
        (3.87 vs an 8 Mrays/s intersect-bound ceiling), the same
        flush-economics inversion the r3 verdict flagged on mesh
        streaming (0.48 vs 0.71 per-pass). One fetch per max_depth
        launches is ~30 ms vs ~600 ms of launches — cheap insurance."""
        p = self.pending()
        if p == (0, 0):
            return
        cap = self.config.max_depth + 8
        last = None
        while True:
            t0 = time.perf_counter()
            rays_dev = self._advance_dev(cap)
            packed = np.asarray(jnp.concatenate([
                jnp.asarray(rays_dev, jnp.int32)[None],
                _pending(self.st.ps.alive, self.st.s_idx, self.st.budget),
            ]))
            rays, p_new = int(packed[0]), (int(packed[1]), int(packed[2]))
            self.stats.rays += rays
            self.stats.wall_s += time.perf_counter() - t0
            if p_new == (0, 0):
                return
            # progress = rays traced; raw pending counts can coincide
            # across healthy rounds (steady-state occupancy)
            if rays == 0 and p_new == p:
                raise RuntimeError("flush made no progress (paths stuck?)")
            p = p_new

    def accumulators(self):
        """(radiance sums, completed-sample counts), (H, W, ...) — idle
        lanes' final samples folded view-side (binned_image semantics)."""
        st = self.st
        idle = ~st.ps.alive & (st.s_idx >= 0)
        rad = st.acc_rad + jnp.where(idle[:, None], st.ps.radiance, 0.0)
        w = st.acc_w + idle.astype(jnp.int32)
        H, W = self.config.height, self.config.width
        return rad.reshape(H, W, 3), w.reshape(H, W)

    @property
    def image(self) -> np.ndarray:
        from smallpt_tpu.engine.accum import normalize_weighted

        rad, w = self.accumulators()
        return np.asarray(normalize_weighted(rad, w))

    # -- checkpoint / resume (SURVEY.md §5.4): the full resumable state is
    # the stream state + uniform budget + key, version-gated like the
    # classic streaming checkpoints -----------------------------------------
    def save_checkpoint(self, path: str) -> None:
        st = self.st
        np.savez(
            path,
            org=np.asarray(st.ps.org), dir=np.asarray(st.ps.dir),
            weight=np.asarray(st.ps.weight),
            depth=np.asarray(st.ps.depth), hist=np.asarray(st.ps.hist),
            alive=np.asarray(st.ps.alive),
            radiance=np.asarray(st.ps.radiance),
            suppress=np.asarray(st.ps.suppress),
            s_idx=np.asarray(st.s_idx), budgets=np.asarray(st.budget),
            acc_rad=np.asarray(st.acc_rad), acc_w=np.asarray(st.acc_w),
            m1=np.asarray(st.m1), m2=np.asarray(st.m2),
            budget=self.budget,
            key=np.asarray(jax.random.key_data(self.key)),
            stats_rays=self.stats.rays,
            stats_passes=self.stats.passes,
            stats_wall=self.stats.wall_s,
            stream_key_version=prng.STREAM_KEY_VERSION,
        )

    def load_checkpoint(self, path: str) -> None:
        data = np.load(path)
        if "org" not in data:
            raise ValueError(
                "not a mesh-streaming checkpoint (no stream state): it was "
                "probably saved by the per-pass progressive engine — resume "
                "it with an explicit --scheduler (flat/regen/mega), which "
                "keeps the per-pass path"
            )
        ck_ver = (
            int(data["stream_key_version"])
            if "stream_key_version" in data else 1
        )
        if ck_ver != prng.STREAM_KEY_VERSION:
            raise ValueError(
                f"stream checkpoint uses sample-keying v{ck_ver}; this "
                f"build uses v{prng.STREAM_KEY_VERSION} (resuming would "
                "mix incompatible sample streams) — re-render from scratch"
            )
        dtype = jnp.dtype(self.config.dtype)
        ps = wavefront.PathState(
            org=jnp.asarray(data["org"], dtype),
            dir=jnp.asarray(data["dir"], dtype),
            weight=jnp.asarray(data["weight"], dtype),
            depth=jnp.asarray(data["depth"], jnp.int32),
            hist=jnp.asarray(data["hist"], jnp.int32),
            alive=jnp.asarray(data["alive"], bool),
            radiance=jnp.asarray(data["radiance"], dtype),
            suppress=jnp.asarray(data["suppress"], jnp.int32),
        )
        self.st = StreamState(
            ps=ps,
            s_idx=jnp.asarray(data["s_idx"], jnp.int32),
            budget=jnp.asarray(data["budgets"], jnp.int32),
            acc_rad=jnp.asarray(data["acc_rad"], dtype),
            acc_w=jnp.asarray(data["acc_w"], jnp.int32),
            m1=jnp.asarray(data["m1"], dtype),
            m2=jnp.asarray(data["m2"], dtype),
        )
        self.budget = int(data["budget"])
        self.key = jax.random.wrap_key_data(jnp.asarray(data["key"]))
        self.stats.rays = int(data["stats_rays"])
        self.stats.passes = int(data["stats_passes"])
        self.stats.wall_s = float(data["stats_wall"])
