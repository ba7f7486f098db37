"""Multi-chip BINNED streaming: the accelerated big-scene scheduler over a
(tile, sample) device mesh.

BASELINE.json config 5 names "10k procedural spheres over >= 2 hosts"; the
round-2 sharded path (parallel/stream_shard.py) would brute-sweep all S
spheres on every device. This module runs the grid-binned culled bounce
(ops/accel.py + ops/megakernel.py::stream_step_binned — the OptiX-Prime
slot, /root/reference/smallpt.cpp:489-530,578-582) per device instead:

- ``tile`` axis: contiguous image ROW BANDS. Each device holds a binned
  state whose lane-id plane carries GLOBAL pixel ids for its band, so
  regen keying, raster positions, and kernel uniforms are bit-identical
  to the same pixels in a whole-image state (placement invariance comes
  free — streams key off the id plane, never off the shard layout).
- ``sample`` axis: independent sample streams via per-shard
  ip_offset = shard * IP_STRIDE — exactly the single-chip multi-stream
  decomposition (engine/binned.py), laid across devices. Deterministic
  for a fixed mesh; re-sharding the sample axis changes stream
  assignment (the documented streaming carve-out, CLAUDE.md).
- The accel tables (reach masks, chunk AABBs, reordered scene table) are
  REPLICATED — they are O(bins x chunks) bitmasks, small next to path
  state, and read-only. Per-bounce chunk lists are computed per device
  from its own band's frontier boxes: narrower bands see narrower bin
  ranges, so sharding *tightens* culling rather than loosening it.
- The only collectives are psums: ray counters per bounce, (radiance,
  weight) pairs at display, pending counts at flush — all riding ICI.

Bit-consistency contract (pinned by tests/test_stream_shard.py): a
(T x S) sharded render equals the single-device BinnedStreamingRenderer
with n_streams=S, row-band tiling being invisible (same lane keying, and
the culled kernel's min-fold is sweep-set-invariant — the culled==full
bit-exactness property).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from smallpt_tpu.config import RenderConfig, Mode
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.scene import SphereScene
from smallpt_tpu.engine.binned import IP_STRIDE, build_accel_for_camera
from smallpt_tpu.ops import accel as acc
from smallpt_tpu.ops.megakernel import (
    K_NEAR,
    _stream_pending_dev,
    binned_image,
    build_camera_vec,
    build_scene_table,
    init_binned_state,
    regen_binned,
    set_binned_budget,
    stream_step_binned,
)
from smallpt_tpu.utils.metrics import RenderStats


def _band_pixels(config: RenderConfig, mesh) -> int:
    n_tile = mesh.shape["tile"]
    if config.height % n_tile:
        raise ValueError(
            f"height {config.height} not divisible by tile axis {n_tile}"
        )
    return (config.height // n_tile) * config.width


class ShardedBinnedRenderer:
    """Binned streaming over a (tile, sample) mesh (parallel/shard.py::
    make_mesh). Mirrors BinnedStreamingRenderer's surface: step / flush /
    accumulators / image, uniform budgets (adaptive allocation stays a
    single-chip feature for now)."""

    def __init__(self, scene, camera, config: RenderConfig, mesh,
                 seed: int = 0, accel: acc.GridAccel | None = None,
                 k_near: int | None = None, inflight: int = 1):
        if config.mode != Mode.FULL or config.split_budget != 1:
            raise ValueError("binned streaming: Mode.FULL, split_budget=1")
        if not isinstance(scene, SphereScene):
            raise TypeError("binned streaming renders SphereScenes")
        if inflight & (inflight - 1):
            raise ValueError("inflight must be a power of two")
        self.scene = scene
        self.camera = camera
        self.config = config
        self.mesh = mesh
        self.inflight = inflight
        self.accel = (
            accel if accel is not None
            else build_accel_for_camera(scene, camera, config)
        )
        self.k_near = jnp.asarray(
            K_NEAR if k_near is None else k_near, jnp.int32
        )
        self.key = prng.base_key(seed)
        base_table = build_scene_table(scene, config)
        self.table = jnp.take(base_table, self.accel.order, axis=0)
        # NEE light rows in the permuted table (engine/binned.py
        # _light_rows semantics: first occurrence wins the strict-< fold)
        order_np = np.asarray(self.accel.order)
        self.nee_rows = tuple(
            int(np.nonzero(order_np == li)[0][0])
            for li in config.nee_lights
        )
        self.cam_vec = build_camera_vec(camera, config)
        self.band = _band_pixels(config, mesh)
        self._fns = self._make_fns()
        self.F, self.I = self._fns["init"]()
        self.budget = 0  # per sample-shard allowance
        self.stats = RenderStats()

    @property
    def spp_total(self) -> int:
        return self.budget * self.mesh.shape["sample"]

    def _make_fns(self):
        config, accel, mesh = self.config, self.accel, self.mesh
        table, inflight, band = self.table, self.inflight, self.band
        nee_rows = self.nee_rows
        state_spec = P("tile", "sample", None, None)

        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=(),
            out_specs=(state_spec, state_spec), check_vma=False,
        )
        def init():
            t = jax.lax.axis_index("tile")
            f0, i0 = init_binned_state(
                config, inflight, pixel_lo=t * band, n_pix=band
            )
            return f0[None, None], i0[None, None]

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(state_spec, state_spec, P(), P(), P()),
            out_specs=(state_spec, state_spec, P()),
            check_vma=False,
        )
        def bounce(F, I, cam_vec, key, k_near):
            s = jax.lax.axis_index("sample")
            ip_offset = s * jnp.int32(IP_STRIDE)
            f, i = F[0, 0], I[0, 0]
            f, i = regen_binned(f, i, cam_vec, config, key,
                                ip_offset=ip_offset, inflight=inflight)
            shadow_keys = None
            if nee_rows:
                # deferred NEE, per shard: accel tables are replicated and
                # the prep is pure per-lane arithmetic, so the sharded
                # bounce stays collective-free during bounces
                f, shadow_keys = acc.nee_shadow_prep(
                    f, i, table, config, accel, key,
                    ip_offset=ip_offset, inflight=inflight,
                    nee_rows=nee_rows,
                )
            lists, stops, dcut = acc.tile_work_lists_bucketed(
                f, i, config, accel, k_near=k_near,
                shadow_keys=shadow_keys,
            )
            f, i, rays = stream_step_binned(
                table, config, key, f, i, lists, stops, dcut,
                ip_offset=ip_offset,
                n_glob_chunks=accel.n_glob_chunks,
                n_chunks=accel.n_chunks,
                inflight=inflight,
                geo_lo=accel.geo_lo,
                geo_hi=accel.geo_hi,
                nee_rows=nee_rows,
            )
            rays = jax.lax.psum(jax.lax.psum(rays, "sample"), "tile")
            return f[None, None], i[None, None], rays

        @jax.jit
        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=(state_spec, P()),
            out_specs=state_spec, check_vma=False,
        )
        def add_budget(I, budget):
            t = jax.lax.axis_index("tile")
            i = set_binned_budget(
                I[0, 0], budget, config, inflight=inflight,
                pixel_hi=(t + 1) * jnp.int32(band),
            )
            return i[None, None]

        @jax.jit
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(state_spec, state_spec),
            out_specs=(P("tile", None, None), P("tile", None)),
            check_vma=False,
        )
        def accum(F, I):
            rad, w = binned_image(
                F[0, 0], I[0, 0], config, inflight=inflight, n_pix=band
            )
            return (
                jax.lax.psum(rad, "sample"),
                jax.lax.psum(w, "sample"),
            )

        @jax.jit
        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=(state_spec,),
            out_specs=P(), check_vma=False,
        )
        def pending(I):
            both = _stream_pending_dev(
                I[0, 0], has_nee=bool(nee_rows)
            )
            return jax.lax.psum(jax.lax.psum(both, "sample"), "tile")

        return dict(init=init, bounce=bounce, add_budget=add_budget,
                    accum=accum, pending=pending)

    def _advance_dev(self, n_bounces: int):
        """Advance without a host fetch; rays total stays a device scalar
        (engine/binned.py::_advance_dev semantics)."""
        rays_dev = []
        for _ in range(n_bounces):
            self.F, self.I, rays = self._fns["bounce"](
                self.F, self.I, self.cam_vec, self.key, self.k_near
            )
            rays_dev.append(rays)
        return sum(rays_dev)

    def _advance(self, n_bounces: int) -> int:
        import time

        t0 = time.perf_counter()
        total = int(self._advance_dev(n_bounces))  # ONE fetch closes the step
        self.stats.rays += total
        self.stats.wall_s += time.perf_counter() - t0
        self.stats.passes += 1
        return total

    def step(self, add_samples: int = 1, n_bounces: int = 8) -> int:
        """add_samples is per SAMPLE-shard (total spp/pixel grows by
        add_samples * n_sample). Returns rays traced."""
        self.budget += add_samples
        self.I = self._fns["add_budget"](
            self.I, jnp.asarray(self.budget, jnp.int32)
        )
        return self._advance(n_bounces)

    def pending(self) -> tuple:
        both = np.asarray(self._fns["pending"](self.I))
        return (int(both[0]), int(both[1]))

    def flush(self) -> None:
        """One host fetch per drain iteration: the rays total rides the
        same fetch as the pending counts (engine/binned.py::flush)."""
        import time

        p = self.pending()
        if p == (0, 0):
            return
        while True:
            t0 = time.perf_counter()
            rays_d = self._advance_dev(8)
            packed = np.asarray(jnp.concatenate([
                jnp.asarray(rays_d, jnp.int32)[None],
                self._fns["pending"](self.I),
            ]))
            rays, p_new = int(packed[0]), (int(packed[1]), int(packed[2]))
            self.stats.rays += rays
            self.stats.wall_s += time.perf_counter() - t0
            self.stats.passes += 1
            if p_new == (0, 0):
                return
            # NEE tail: a launch resolving only deferred shadows finalizes
            # zero rays (engine/binned.py flush semantics)
            if rays == 0 and p_new == p:
                raise RuntimeError("sharded binned flush made no progress")
            p = p_new

    def accumulators(self):
        return self._fns["accum"](self.F, self.I)

    @property
    def image(self) -> np.ndarray:
        from smallpt_tpu.engine.accum import normalize_weighted

        rad, w = self.accumulators()
        return np.asarray(normalize_weighted(rad, w))
