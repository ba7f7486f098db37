"""Multi-host distributed rendering — jax.distributed + the (tile, sample)
mesh spanning hosts.

The reference is strictly single-process, single-GPU (device=0 hardcoded,
smallpt.cpp:480-481; SURVEY.md §2.3 "Absent"). The TPU build's multi-host
story (BASELINE.json config 5: 1920x1080 @ 5000 spp over >= 2 hosts):

- ``initialize()``: one call per process wires jax.distributed (coordinator
  TCP rendezvous); after it, jax.devices() spans all hosts and the SPMD
  programs below run unchanged.
- mesh layout: put the ``tile`` (image row band) axis on the DCN/host
  boundary and the ``sample`` axis on intra-host ICI — the per-pass psum of
  per-pixel accumulators (parallel/shard.py) then rides ICI, and the only
  cross-host traffic is the final tile gather (or nothing, if each host
  writes its own band).
- per-host I/O: ``host_tile_rows`` gives each process its row band so hosts
  fetch only their local shard (jax.experimental.multihost_utils has the
  generic gathers; renders usually want per-band PPM writes instead).
- failure/elastic recovery: progressive state is the checkpoint
  (engine/progressive.py save/load); a failed host restarts, re-initializes,
  loads the checkpoint, and the deterministic sample keying (core/rng.py)
  resumes the exact stream — SURVEY.md §5.3/§5.4.
"""

from __future__ import annotations

import jax

from smallpt_tpu.parallel.shard import make_mesh


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kwargs,
) -> None:
    """Wire this process into the multi-host runtime.

    With no arguments, uses the environment/TPU-pod auto-detection
    (jax.distributed's default); arguments mirror
    jax.distributed.initialize."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def global_mesh(n_sample: int = 1):
    """(tile, sample) mesh over ALL processes' devices. Keep n_sample <=
    devices-per-host so the sample-axis psum stays on ICI; the tile axis then
    lands on the host (DCN) boundary where no per-bounce traffic flows."""
    return make_mesh(n_sample=n_sample)


def host_tile_rows(config_height: int, mesh) -> tuple[int, int]:
    """(row_start, n_rows) of this process's image band under a mesh whose
    tile axis is host-major (the make_mesh default ordering): each host owns
    height / (n_tile / hosts-per-tile-slot) contiguous rows.

    For per-host PPM band writes and data loading; the jitted render itself
    needs no such bookkeeping (GSPMD owns placement)."""
    n_tile = mesh.shape["tile"]
    if config_height % n_tile:
        raise ValueError(f"height {config_height} % tile axis {n_tile} != 0")
    rows_per_shard = config_height // n_tile
    # device order in make_mesh is jax.devices() order == process-major
    my_first_shard = None
    devs = mesh.devices.reshape(n_tile, -1)
    for t in range(n_tile):
        if any(d.process_index == jax.process_index() for d in devs[t]):
            my_first_shard = t
            break
    if my_first_shard is None:
        return 0, 0
    n_my = sum(
        1
        for t in range(n_tile)
        if any(d.process_index == jax.process_index() for d in devs[t])
    )
    return my_first_shard * rows_per_shard, n_my * rows_per_shard
