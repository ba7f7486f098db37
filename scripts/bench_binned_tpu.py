"""Per-stage timing + tuning sweep for the binned scheduler on real TPU.

The round-2 verdict's top item: the binned (grid-culled, distance-ordered)
scheduler had bit-exact correctness tests but ZERO recorded TPU throughput.
This script produces (a) the per-stage cost table (kernel vs tile_work_lists
vs row-sort vs regen), (b) end-to-end rays/s for the drive loop, and (c) a
tuning sweep over (sort_every, k_near, n_bounces) — all in ONE process
(interleaved variants, best-of-N) per the axon-tunnel methodology notes in
CLAUDE.md: value fetches (not block_until_ready) close every timed region,
and counters stay on device inside loops.

Usage:
  python scripts/bench_binned_tpu.py stages            # per-stage table
  python scripts/bench_binned_tpu.py e2e               # end-to-end rays/s
  python scripts/bench_binned_tpu.py sweep             # tuning sweep
  python scripts/bench_binned_tpu.py crossover         # vs classic MEGA
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax

import os

if os.environ.get("SMALLPT_TPU_BENCH_CPU"):
    # JAX_PLATFORMS=cpu is unreliable under the axon plugin (CLAUDE.md);
    # the config update is the dependable switch for CPU smoke runs
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_smallpt_tpu")
# cache EVERYTHING including sub-second eager-op programs: through the
# remote compile helper even trivial compiles cost tens of seconds when the
# service is cold, and scene construction is a dozen tiny eager ops
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

from smallpt_tpu.config import RenderConfig, Filter, CameraModel
from smallpt_tpu.core.scene import procedural_sphere_scene
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.engine.binned import BinnedStreamingRenderer


def fetch(x):
    """Force a real device fetch (block_until_ready lies on the tunnel)."""
    return float(jnp.sum(x)) if hasattr(x, "dtype") else float(x)


def make_renderer(args, sort_every=0, n_streams=None, fused=True):
    config = RenderConfig(
        width=args.width, height=args.height, spp_per_cell=1,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
        max_depth=args.depth,
        # procedural scenes embed the Cornell base; sphere 8 is the light
        nee_lights=(8,) if getattr(args, "nee", False) else (),
    )
    scene = procedural_sphere_scene(args.n)
    return BinnedStreamingRenderer(
        scene, smallpt_camera(), config, seed=0, sort_every=sort_every,
        n_streams=n_streams if n_streams is not None else args.streams,
        inflight=args.inflight, fused=fused,
    )


def time_loop(fn, iters, fetch_out, inner_chain=1):
    """Median-of-3 windows of `iters` sequential calls; returns s/call.
    fetch_out(result) must force the value fetch that closes the window."""
    res = None
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            res = fn(res)
        fetch_out(res)
        times.append((time.perf_counter() - t0) / iters)
    return min(times), res


def cmd_stages(args):
    from smallpt_tpu.ops import accel as acc
    from smallpt_tpu.ops.megakernel import (
        regen_binned, stream_step_binned,
    )

    r = make_renderer(args, n_streams=1)
    accel = r.accel
    config = r.config
    print(f"# scene n={args.n} {args.width}x{args.height} depth={args.depth}",
          file=sys.stderr)
    print(f"# accel: nb={accel.nb} bins={accel.n_bins} "
          f"chunks={accel.n_chunks} glob={accel.n_glob_chunks} "
          f"l_max={accel.l_max}", file=sys.stderr)

    def stamp(msg, t0):
        print(f"# {msg}: {time.perf_counter()-t0:.1f}s", file=sys.stderr,
              flush=True)

    # Compile each program separately (serial, stamped) so a pathological
    # remote compile is identifiable.
    bounce, shuffle = r._bounce
    t0 = time.perf_counter()
    r.step(add_samples=args.spp, n_bounces=0)  # budget only, no advance
    fetch(r.i)
    stamp("budget compile", t0)

    t0 = time.perf_counter()
    f1, i1 = regen_binned(r.f, r.i, r.cam_vec, config, r.key)
    fetch(i1)
    stamp("regen compile", t0)

    @jax.jit
    def lists_of(f, i):
        return acc.tile_work_lists(f, i, config, accel)

    t0 = time.perf_counter()
    lists, stops, dcut = lists_of(f1, i1)
    fetch(stops)
    stamp("lists compile", t0)

    t0 = time.perf_counter()
    f2, i2, rays = stream_step_binned(
        r.table, config, r.key, f1, i1, lists, stops, dcut,
        n_glob_chunks=accel.n_glob_chunks, n_chunks=accel.n_chunks,
    )
    fetch(rays)
    stamp("kernel compile", t0)

    t0 = time.perf_counter()
    fs, is_ = shuffle(f2, i2)
    fetch(is_[0])
    stamp("shuffle compile", t0)

    # Produce a REALISTIC mid-render state: several bounces in.
    r.f, r.i = f2, i2
    r._bounce_idx = 1
    r._advance(5)
    f0, i0 = r.f, r.i
    fetch(f0)
    stamp("state prep", t0)

    lists, stops, dcut = lists_of(f0, i0)
    fetch(stops)

    # regen alone (idempotent enough for timing: reruns on same state)
    def regen_only(_):
        return regen_binned(f0, i0, r.cam_vec, config, r.key)

    t_regen, _ = time_loop(regen_only, 20, lambda res: fetch(res[1]))

    # lists alone
    def lists_only(_):
        return lists_of(f0, i0)

    t_lists, _ = time_loop(lists_only, 20, lambda res: fetch(res[1]))

    # kernel alone (same lists every time; state does evolve via output
    # but we re-feed f0/i0 so shapes/occupancy stay constant)
    def kernel_only(_):
        return stream_step_binned(
            r.table, config, r.key, f0, i0, lists, stops, dcut,
            n_glob_chunks=accel.n_glob_chunks, n_chunks=accel.n_chunks,
        )

    t_kernel, _ = time_loop(kernel_only, 20, lambda res: fetch(res[2]))

    # shuffle (row-wise sort) alone
    def shuffle_only(_):
        return shuffle(f0, i0)

    t_shuffle, _ = time_loop(shuffle_only, 20, lambda res: fetch(res[1][0]))

    # stops distribution (how many tiles sweep full lists?) and the
    # per-tile REACH size (what a dcut-free full-reach sweep would cost)
    st = np.asarray(stops)
    from smallpt_tpu.ops import megakernel as mk

    def plane(buf, idx):
        return jax.lax.dynamic_slice_in_dim(buf, 8 * idx, 8, axis=0)

    key_live = acc.ray_bin_keys(
        plane(f0, mk._F_OX), plane(f0, mk._F_OY), plane(f0, mk._F_OZ),
        plane(f0, mk._F_DX), plane(f0, mk._F_DY), plane(f0, mk._F_DZ),
        accel,
    )
    alive0 = plane(i0, mk._I_ALIVE) != 0
    lo1, hi1 = acc._masked_minmax(key_live, alive0, accel.n_bins)
    bins = jnp.arange(accel.n_bins, dtype=jnp.int32)
    in1 = (bins[None, :] >= lo1[:, None]) & (bins[None, :] <= hi1[:, None])
    reach = jax.lax.dot(
        in1.astype(jnp.bfloat16), accel.masks.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) > 0.0
    n_reach = np.asarray(jnp.sum(reach, axis=1).astype(jnp.int32))
    rows = {
        "regen_ms": round(t_regen * 1e3, 2),
        "lists_ms": round(t_lists * 1e3, 2),
        "kernel_ms": round(t_kernel * 1e3, 2),
        "shuffle_ms": round(t_shuffle * 1e3, 2),
        "tiles": int(st.size),
        "stops_full": int((st < 0).sum()),
        "stops_mean": float(st[st >= 0].mean()) if (st >= 0).any() else -1,
        "stops_max": int(st.max()),
        "n_reach_mean": float(n_reach.mean()),
        "n_reach_med": float(np.median(n_reach)),
        "n_reach_max": int(n_reach.max()),
    }
    print(json.dumps(rows))


def cmd_trace(args):
    """Per-advance trace of one full drive: where does the wall go?"""
    r = make_renderer(args, sort_every=args.sort_every)
    print(f"# n_streams={r.n_streams} inflight={r.inflight} "
          f"fused={r.fused}", file=sys.stderr)
    drive(r, args.spp, args.bounces)  # compile+warm
    r.reset(); r.stats.rays = 0; r.stats.wall_s = 0.0
    t00 = time.perf_counter()
    t0 = time.perf_counter()
    rays = r.step(add_samples=args.spp, n_bounces=args.bounces)
    print(f"# step: {time.perf_counter()-t0:.3f}s rays={rays}",
          file=sys.stderr, flush=True)
    it = 0
    while True:
        t0 = time.perf_counter()
        pend = r.pending()
        t_p = time.perf_counter() - t0
        if pend == (0, 0):
            break
        t0 = time.perf_counter()
        rays = r._advance(args.bounces)
        dt = time.perf_counter() - t0
        print(f"# adv{it}: pend={pend} t_pend={t_p*1e3:.0f}ms "
              f"adv={dt*1e3:.0f}ms rays={rays} "
              f"({rays/max(dt,1e-9)/1e6:.2f}M)", file=sys.stderr, flush=True)
        it += 1
    total = time.perf_counter() - t00
    print(json.dumps({"total_s": round(total, 3), "rays": r.stats.rays,
                      "rays_per_s": round(r.stats.rays / total)}))


def cmd_chain(args):
    """Isolate per-bounce overhead: same-program pipelining vs the real
    alternating 3-program chain vs the full drive loop."""
    from smallpt_tpu.ops import accel as acc
    from smallpt_tpu.ops.megakernel import stream_step_binned

    r = make_renderer(args, sort_every=0, n_streams=1, fused=False)
    config, accel = r.config, r.accel
    r.step(add_samples=args.spp, n_bounces=6)  # warm + realistic state
    bounce, shuffle = r._bounce
    f0, i0 = r.f, r.i
    fetch(f0)

    @jax.jit
    def lists_of(f, i, kn):
        return acc.tile_work_lists(f, i, config, accel, k_near=kn)

    lists, stops, dcut = lists_of(f0, i0, r.k_near)
    fetch(stops)

    # (a) same kernel re-launched (stage-style pipelining)
    def kernel_only(_):
        return stream_step_binned(
            r.table, config, r.key, f0, i0, lists, stops, dcut,
            n_glob_chunks=accel.n_glob_chunks, n_chunks=accel.n_chunks,
            inflight=r.inflight,
        )

    t_k, _ = time_loop(kernel_only, 16, lambda res: fetch(res[2]))

    # (a2) regen alone and lists alone (same-program pipelining)
    from smallpt_tpu.ops.megakernel import regen_binned as _rg

    def regen_only(_):
        return _rg(f0, i0, r.cam_vec, config, r.key, 0, r.inflight)

    t_r, _ = time_loop(regen_only, 16, lambda res: fetch(res[1]))

    def lists_only(_):
        return lists_of(f0, i0, r.k_near)

    t_l, _ = time_loop(lists_only, 16, lambda res: fetch(res[1]))

    # (b) real chained bounce (regen -> lists -> kernel, state evolves)
    def chain(_):
        fi = (f0, i0) if _ is None else (_[0], _[1])
        return bounce(r.table, r.cam_vec, r.key, fi[0], fi[1], 0)

    t_c, _ = time_loop(chain, 16, lambda res: fetch(res[2]))

    # (c) alternating programs, NO cross-bounce dependency
    def alt(_):
        f1, i1 = regen_binned(f0, i0, r.cam_vec, config, r.key, 0,
                              r.inflight)
        l2, s2, d2 = lists_of(f1, i1, r.k_near)
        return stream_step_binned(
            r.table, config, r.key, f1, i1, l2, s2, d2,
            n_glob_chunks=accel.n_glob_chunks, n_chunks=accel.n_chunks,
            inflight=r.inflight,
        )

    from smallpt_tpu.ops.megakernel import regen_binned
    t_a, _ = time_loop(alt, 16, lambda res: fetch(res[2]))

    # (e) SAME-program dependent chain: kernel feeding its own output
    def kchain(prev):
        fi = (f0, i0) if prev is None else (prev[0], prev[1])
        return stream_step_binned(
            r.table, config, r.key, fi[0], fi[1], lists, stops, dcut,
            n_glob_chunks=accel.n_glob_chunks, n_chunks=accel.n_chunks,
            inflight=r.inflight,
        )

    t_kc, _ = time_loop(kchain, 16, lambda res: fetch(res[2]))

    # (f) regen feeding its own output (same program, no donation)
    def rchain(prev):
        fi = (f0, i0) if prev is None else (prev[0], prev[1])
        return _rg(fi[0], fi[1], r.cam_vec, config, r.key, 0, r.inflight)

    t_rc, _ = time_loop(rchain, 16, lambda res: fetch(res[1]))

    # (g0) sort-free list builder alone on the mid-render state
    @jax.jit
    def nosort_of(f, i):
        return acc.tile_work_lists_nosort(f, i, config, accel)

    def nosort_only(_):
        return nosort_of(f0, i0)

    t_ns, res_ns = time_loop(nosort_only, 16, lambda res: fetch(res[1]))
    st_ns = np.asarray(res_ns[1])
    print(f"# nosort stops: mean={st_ns[st_ns>=0].mean():.0f} "
          f"max={st_ns.max()} overflow={(st_ns<0).sum()}", file=sys.stderr)

    # (g1) kernel alone driven by the NOSORT (full-reach) lists
    ln, sn, dn = res_ns

    def kernel_nosort(_):
        return stream_step_binned(
            r.table, config, r.key, f0, i0, ln, sn, dn,
            n_glob_chunks=accel.n_glob_chunks, n_chunks=accel.n_chunks,
            inflight=r.inflight,
        )

    t_kn, _ = time_loop(kernel_nosort, 16, lambda res: fetch(res[2]))

    # (g) fused one-program bounce, chained on its own output
    rf = make_renderer(args, sort_every=0, n_streams=1)
    rf.step(add_samples=args.spp, n_bounces=0)
    fbounce, _ = rf._bounce
    import copy as _copy

    def fchain(prev):
        fi = (rf.f, rf.i) if prev is None else (prev[0], prev[1])
        return fbounce(rf.table, rf.cam_vec, rf.key, fi[0], fi[1], 0)

    t_f, _ = time_loop(fchain, 16, lambda res: fetch(res[2]))

    # (d) real advance(16)
    t0 = time.perf_counter()
    r.f, r.i = f0, i0
    r._advance(16)
    t_adv = (time.perf_counter() - t0) / 16

    print(json.dumps({
        "inflight": r.inflight,
        "kernel_only_ms": round(t_k * 1e3, 2),
        "regen_only_ms": round(t_r * 1e3, 2),
        "lists_only_ms": round(t_l * 1e3, 2),
        "chain_ms": round(t_c * 1e3, 2),
        "kernel_chain_ms": round(t_kc * 1e3, 2),
        "regen_chain_ms": round(t_rc * 1e3, 2),
        "fused_chain_ms": round(t_f * 1e3, 2),
        "nosort_lists_ms": round(t_ns * 1e3, 2),
        "kernel_fullreach_ms": round(t_kn * 1e3, 2),
        "alt_nodep_ms": round(t_a * 1e3, 2),
        "advance_ms": round(t_adv * 1e3, 2),
    }))


def drive(r, spp, n_bounces, max_iters=400):
    """Drive to exact drain; returns (rays, wall_s)."""
    t0 = time.perf_counter()
    r.step(add_samples=spp, n_bounces=n_bounces)
    r.flush()
    dt = time.perf_counter() - t0
    return r.stats.rays, dt


def cmd_e2e(args):
    best = None
    r = make_renderer(args, sort_every=args.sort_every)
    print(f"# n_streams={r.n_streams} inflight={r.inflight} "
          f"fused={r.fused}", file=sys.stderr)
    # warm: compile + clock ramp
    drive(r, args.spp, args.bounces)
    for t in range(args.rounds):
        r.reset()
        r.stats.rays = 0
        r.stats.wall_s = 0.0
        rays, dt = drive(r, args.spp, args.bounces)
        rate = rays / dt
        print(f"# round {t}: {rays} rays in {dt:.3f}s = {rate/1e6:.2f} M",
              file=sys.stderr)
        if best is None or rate > best[0]:
            best = (rate, rays, dt)
    # reach-set size stats on the final state (what the dcut-free fused
    # kernel actually sweeps per tile)
    from smallpt_tpu.ops import accel as acc
    _, stops, _ = acc.tile_work_lists_nosort(r.f, r.i, r.config, r.accel)
    st = np.asarray(stops)
    print(json.dumps({
        "metric": f"binned_{args.n}sph_{args.width}x{args.height}"
                  + ("_nee" if args.nee else ""),
        "rays_per_s": round(best[0]),
        "rays": best[1], "wall_s": round(best[2], 3),
        "sort_every": args.sort_every, "bounces": args.bounces,
        "inflight": r.inflight,
        "nreach_mean": float(st[st >= 0].mean()) if (st >= 0).any() else -1,
        "nreach_max": int(st.max()),
        "nreach_overflow": int((st < 0).sum()),
    }))


def cmd_sweep(args):
    """Interleaved variants in one process; report each variant's best.
    Axes: sort_every (shuffle amortization) x k_near (prefix length).
    One renderer, reconfigured per variant — all programs cached after the
    first variant (k_near is a device scalar, not a shape)."""
    import jax.numpy as jnp

    variants = [
        (se, kn)
        for se in (0, 4, 8, 16)
        for kn in (64, 128)
    ]
    r = make_renderer(args, sort_every=2)
    drive(r, args.spp, args.bounces)  # compile+warm
    results = {v: 0.0 for v in variants}
    for rep in range(args.rounds):
        for v in variants:
            se, kn = v
            r.sort_every = se
            r.k_near = jnp.asarray(kn, jnp.int32)
            r.reset()
            r.stats.rays = 0
            r.stats.wall_s = 0.0
            rays, dt = drive(r, args.spp, args.bounces)
            rate = rays / dt
            results[v] = max(results[v], rate)
            print(f"# se={se} kn={kn} rep={rep}: {rate/1e6:.2f} M",
                  file=sys.stderr, flush=True)
    for v, rate in sorted(results.items(), key=lambda kv: -kv[1]):
        print(json.dumps({"sort_every": v[0], "k_near": v[1],
                          "bounces": args.bounces,
                          "rays_per_s": round(rate)}))


def cmd_brute(args):
    """The round-1 brute split-sweep baseline, same process (for honest
    same-thermal-window comparison)."""
    from smallpt_tpu.config import Intersector
    from smallpt_tpu.core import rng as prng
    from smallpt_tpu.engine.renderer import _render_with_stats_jit

    config = RenderConfig(
        width=args.width, height=args.height, spp_per_cell=1,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
        max_depth=args.depth, intersector=Intersector.PALLAS,
    )
    scene = procedural_sphere_scene(args.n)
    camera = smallpt_camera()
    base = prng.base_key(0)
    img, rays = _render_with_stats_jit(scene, camera, config, base)
    fetch(rays)
    best = 0.0
    for t in range(args.rounds):
        t0 = time.perf_counter()
        img, rays = _render_with_stats_jit(
            scene, camera, config, jax.random.fold_in(base, t))
        n = fetch(rays)
        dt = time.perf_counter() - t0
        best = max(best, n / dt)
        print(f"# brute round {t}: {n/dt/1e6:.2f} M", file=sys.stderr)
    print(json.dumps({"metric": "brute", "rays_per_s": round(best)}))


def cmd_crossover(args):
    """VERDICT r2 item 5: measure classic-vs-binned at several sphere
    counts IN ONE PROCESS (interleaved, best-of-rounds — never A/B across
    processes on the thermally-ramping tunnel chip) so the router's
    MEGA_MAX_SPHERES cliff can be set where the data says.

    classic = the classic streaming megakernel (brute sweep of all
    spheres, SMEM/VMEM table) — only eligible up to its table cap;
    binned = the grid-culled fused scheduler."""
    from smallpt_tpu.engine.streaming import StreamingRenderer
    from smallpt_tpu.ops.megakernel import MEGA_MAX_SPHERES

    counts = [int(x) for x in args.counts.split(",")]
    config = RenderConfig(
        width=args.width, height=args.height, spp_per_cell=1,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
        max_depth=args.depth,
    )
    cam = smallpt_camera()
    runners = {}
    for n in counts:
        scene = procedural_sphere_scene(n)
        variants = {}
        if n <= MEGA_MAX_SPHERES:
            variants["classic"] = StreamingRenderer(scene, cam, config,
                                                    seed=0)
        variants["binned"] = BinnedStreamingRenderer(
            scene, cam, config, seed=0, inflight=args.inflight or None,
        )
        runners[n] = variants

    def drive_one(r):
        t0 = time.perf_counter()
        if isinstance(r, StreamingRenderer):
            r.step(n_iters=1_000_000, add_samples=args.spp)
        else:
            r.step(add_samples=args.spp, n_bounces=args.bounces)
        r.flush()
        return r.stats.rays, time.perf_counter() - t0

    # compile+warm every variant first (stamped: remote compiles are slow)
    for n, variants in runners.items():
        for name, r in variants.items():
            t0 = time.perf_counter()
            drive_one(r)
            print(f"# warm n={n} {name}: {time.perf_counter()-t0:.1f}s",
                  file=sys.stderr, flush=True)

    best = {(n, name): 0.0 for n, vs in runners.items() for name in vs}
    for rep in range(args.rounds):
        for n, variants in runners.items():
            for name, r in variants.items():
                r.reset()
                r.stats.rays = 0
                r.stats.wall_s = 0.0
                rays, dt = drive_one(r)
                rate = rays / dt
                best[(n, name)] = max(best[(n, name)], rate)
                print(f"# rep{rep} n={n} {name}: {rate/1e6:.2f} M",
                      file=sys.stderr, flush=True)
    for (n, name), rate in sorted(best.items()):
        print(json.dumps({"n_spheres": n, "path": name,
                          "rays_per_s": round(rate)}))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["stages", "e2e", "sweep", "brute",
                                   "chain", "trace", "crossover"])
    p.add_argument("--counts", default="512,1024,2048,4096,10000")
    p.add_argument("--n", type=int, default=10_000)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--depth", type=int, default=24)
    p.add_argument("--spp", type=int, default=4)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--sort-every", type=int, default=0)
    p.add_argument("--streams", type=int, default=None)
    p.add_argument("--inflight", type=int, default=None)
    p.add_argument("--bounces", type=int, default=8)
    p.add_argument("--nee", action="store_true")
    args = p.parse_args()
    print(f"# backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)
    dict(stages=cmd_stages, e2e=cmd_e2e, sweep=cmd_sweep,
         brute=cmd_brute, chain=cmd_chain, trace=cmd_trace,
         crossover=cmd_crossover)[args.cmd](args)


if __name__ == "__main__":
    main()
