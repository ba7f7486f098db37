"""Multi-chip streaming: every device runs its own continuous wavefront.

The single-chip streaming renderer (engine/streaming.py) holds persistent
path state and regenerates lanes at ~100% occupancy. Sharded version: the
(tile, sample) mesh (parallel/shard.py) assigns each device one image row
band (tile axis) and one independent sample stream of that band (sample
axis). Per-device state is a leading (tile, sample) pair of axes on the
plane buffers, sharded with shard_map — no cross-device traffic during
stepping; the only collective is the psum of (radiance, weight) pairs at
display time (weighted accumulation, engine/accum.py semantics, makes the
heterogeneous per-device sample counts exact).

Sample decorrelation across the sample axis uses per-shard keys
(fold_in(key, sample_index)) — deterministic for a fixed mesh shape;
re-sharding to a different sample-axis size changes the streams (unlike the
per-pass path's globally-indexed samples), which is the documented trade for
unbounded streaming budgets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from smallpt_tpu.config import RenderConfig
from smallpt_tpu.core import rng as prng
from smallpt_tpu.ops.megakernel import (
    init_stream_state,
    stream_image,
    stream_step,
    _I_ALIVE,
    _I_BUDGET,
    _I_SIDX,
)


def _rows_per_shard(config: RenderConfig, mesh) -> int:
    n_tile = mesh.shape["tile"]
    if config.height % n_tile:
        raise ValueError(
            f"height {config.height} not divisible by tile axis {n_tile}"
        )
    return config.height // n_tile


def init_sharded_stream(config: RenderConfig, mesh, dda: bool = False):
    """(F, I) with leading (tile, sample) axes, device-placed via shard_map."""
    n_tile = mesh.shape["tile"]
    n_sample = mesh.shape["sample"]
    rows = _rows_per_shard(config, mesh)
    if dda:
        from smallpt_tpu.ops.stream_dda import init_stream_dda_state

        f0, i0 = init_stream_dda_state(config, rows)
    else:
        f0, i0 = init_stream_state(config, rows)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(),
        out_specs=(P("tile", "sample", None, None),
                   P("tile", "sample", None, None)),
        check_vma=False,
    )
    def init():
        return f0[None, None], i0[None, None]

    return init()


@functools.partial(
    jax.jit, static_argnames=("config", "mesh", "n_rows")
)
def stream_step_sharded(
    scene, camera, config: RenderConfig, key, F, I, sample_budget, n_iters,
    mesh, n_rows: int | None = None,
):
    """One streaming step on every device. sample_budget is the PER-SHARD
    allowance (total spp per pixel = n_sample * budget). Returns (F, I,
    total rays traced this step)."""
    rows = _rows_per_shard(config, mesh)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(),
                  P("tile", "sample", None, None),
                  P("tile", "sample", None, None)),
        out_specs=(P("tile", "sample", None, None),
                   P("tile", "sample", None, None), P()),
        check_vma=False,
    )
    def body(scene, camera, key, F, I):
        t = jax.lax.axis_index("tile")
        s = jax.lax.axis_index("sample")
        k = jax.random.fold_in(key, s)  # independent stream per sample shard
        f, i, rays = stream_step(
            scene, camera, config, k, F[0, 0], I[0, 0],
            sample_budget, n_iters,
            row_offset=t * rows, n_rows=rows,
        )
        rays = jax.lax.psum(jax.lax.psum(rays, "sample"), "tile")
        return f[None, None], i[None, None], rays

    return body(scene, camera, key, F, I)


@functools.partial(
    jax.jit,
    static_argnames=("config", "mesh", "n_rows", "k", "nb", "lo", "cell",
                     "eps_local", "light_rows"),
)
def stream_step_sharded_dda(
    scene, camera, config: RenderConfig, key, F, I, sample_budget, n_iters,
    mesh, always_tbl, cells3, k, nb, lo, cell, eps_local,
    light_rows=(), n_rows: int | None = None,
):
    """stream_step_sharded with the per-ray DDA traversal kernel
    (ops/stream_dda.py) — same (tile, sample) mesh, same per-shard keying
    caveat. Grid tables replicate into every shard (they are per-SCENE
    constants, exactly like the binned accel's tables)."""
    from smallpt_tpu.ops.stream_dda import StreamDDATables, stream_step_dda

    rows = _rows_per_shard(config, mesh)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(),
                  P("tile", "sample", None, None),
                  P("tile", "sample", None, None), P(), P()),
        out_specs=(P("tile", "sample", None, None),
                   P("tile", "sample", None, None), P()),
        check_vma=False,
    )
    def body(scene, camera, key, F, I, atbl, c3):
        t = jax.lax.axis_index("tile")
        s = jax.lax.axis_index("sample")
        k_ = jax.random.fold_in(key, s)
        tables = StreamDDATables(
            always_tbl=atbl, cells3=c3, k=k, nb=nb, lo=lo, cell=cell,
            eps_local=eps_local, n_always=0, n_local=0, n_overflow=0,
            light_rows=light_rows,
        )
        f, i, rays = stream_step_dda(
            scene, camera, config, k_, F[0, 0], I[0, 0],
            sample_budget, n_iters, tables,
            row_offset=t * rows, n_rows=rows,
        )
        rays = jax.lax.psum(jax.lax.psum(rays, "sample"), "tile")
        return f[None, None], i[None, None], rays

    return body(scene, camera, key, F, I, always_tbl, cells3)


@functools.partial(jax.jit, static_argnames=("config", "mesh"))
def stream_accumulators_sharded(F, I, config: RenderConfig, mesh):
    """Global (radiance sums, completed-sample weights): per-shard pairs
    psum-reduced over the sample axis, tile bands concatenated."""
    rows = _rows_per_shard(config, mesh)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("tile", "sample", None, None),
                  P("tile", "sample", None, None)),
        out_specs=(P("tile", None, None), P("tile", None)),
        check_vma=False,
    )
    def body(F, I):
        rad, w = stream_image(F[0, 0], I[0, 0], config, rows)
        rad = jax.lax.psum(rad, "sample")
        w = jax.lax.psum(w, "sample")
        return rad, w

    rad, w = body(F, I)
    return rad, w


def stream_pending_sharded(I, config: RenderConfig, mesh):
    """Total (alive, can-regen) across all shards."""

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("tile", "sample", None, None),),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def body(I):
        i = I[0, 0]
        s_idx = jax.lax.dynamic_slice_in_dim(i, 8 * _I_SIDX, 8, axis=0)
        alive = jax.lax.dynamic_slice_in_dim(i, 8 * _I_ALIVE, 8, axis=0)
        bud = jax.lax.dynamic_slice_in_dim(i, 8 * _I_BUDGET, 8, axis=0)
        a = jnp.sum((alive != 0).astype(jnp.int32))
        c = jnp.sum(((alive == 0) & (s_idx < bud - 1)).astype(jnp.int32))
        a = jax.lax.psum(jax.lax.psum(a, "sample"), "tile")
        c = jax.lax.psum(jax.lax.psum(c, "sample"), "tile")
        return a, c

    a, c = body(I)
    return int(a), int(c)


class ShardedStreamingRenderer:
    """Multi-device continuous-wavefront renderer over a (tile, sample)
    mesh — the production serving path for BASELINE.json config 5."""

    def __init__(self, scene, camera, config: RenderConfig, mesh,
                 seed: int = 0, dda=None):
        """dda: None = auto (per-ray DDA kernel for big local-sphere
        scenes, mirroring engine/streaming.StreamingRenderer's routing);
        False = classic; True/tables = force."""
        from smallpt_tpu.ops.stream_dda import (StreamDDATables,
                                                build_stream_dda_tables)

        self.scene = scene
        self.camera = camera
        self.config = config
        self.mesh = mesh
        self.key = prng.base_key(seed)
        if dda is None:
            from smallpt_tpu.core.scene import SphereScene
            from smallpt_tpu.ops.megakernel import MEGA_MAX_SPHERES

            dda = (isinstance(scene, SphereScene)
                   and len(config.nee_lights or ()) <= 1
                   and scene.n_spheres > MEGA_MAX_SPHERES)
        if isinstance(dda, StreamDDATables):
            self._dda = dda
        elif dda:
            self._dda = build_stream_dda_tables(scene, config)
        else:
            self._dda = None
        self.F, self.I = init_sharded_stream(config, mesh,
                                             dda=self._dda is not None)
        self.budget = 0  # per-shard allowance

    _DDA_ITER_SCALE = 5

    @property
    def spp_total(self) -> int:
        return self.budget * self.mesh.shape["sample"]

    def _advance(self, n_iters):
        if self._dda is not None:
            tb = self._dda
            return stream_step_sharded_dda(
                self.scene, self.camera, self.config, self.key,
                self.F, self.I, self.budget,
                n_iters * self._DDA_ITER_SCALE, self.mesh,
                tb.always_tbl, tb.cells3, k=tb.k, nb=tb.nb, lo=tb.lo,
                cell=tb.cell, eps_local=tb.eps_local,
                light_rows=tb.light_rows,
            )
        return stream_step_sharded(
            self.scene, self.camera, self.config, self.key,
            self.F, self.I, self.budget, n_iters, self.mesh,
        )

    def step(self, n_iters: int = 256, add_samples: int = 1) -> int:
        """add_samples is per sample-shard (total spp/pixel grows by
        add_samples * n_sample). Returns rays traced."""
        self.budget += add_samples
        self.F, self.I, rays = self._advance(n_iters)
        return int(rays)

    def flush(self) -> None:
        cap = self.config.max_depth * max(self.budget, 1) + 64
        last = None
        while True:
            pending = stream_pending_sharded(self.I, self.config, self.mesh)
            if pending == (0, 0):
                return
            if pending == last:
                raise RuntimeError("sharded flush made no progress")
            last = pending
            self.F, self.I, _ = self._advance(cap)

    def accumulators(self):
        return stream_accumulators_sharded(self.F, self.I, self.config, self.mesh)

    @property
    def image(self) -> np.ndarray:
        rad, w = self.accumulators()
        rad, w = np.asarray(rad), np.asarray(w)[..., None]
        return np.where(w > 0, rad / np.maximum(w, 1), 0.0)
