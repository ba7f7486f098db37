"""BASELINE config-5 workload soak: 1920x1080 @ 5000 spp, single chip,
streaming scheduler, with a mid-run checkpoint -> kill -> resume exercise.

The r3 verdict: "the config-5 workload as specified has never been run";
this script runs it for real and produces the evidence BASELINE.md's
config-5 row cites:
  - wall time + sustained rays/s + a thermal curve (per-window rates)
  - a mid-run checkpoint, simulated crash (hard process exit), resume,
    and bit-continuity check: resume(ckpt) + remaining work must equal
    the uninterrupted render's accumulators EXACTLY (streaming keying is
    placement- and restart-invariant).

Phases (driven by --phase, so the kill is a REAL process death):
  solo    : render to completion, no interruption; save accumulators.
  part1   : render the first --kill-spp samples, checkpoint, hard-exit.
  part2   : resume the checkpoint, finish, save accumulators, compare
            with solo if its npz is present.

The default scene is the 10k-sphere procedural (the config-5 scene). Note
chip count: config 5 names >=2 hosts; this bench has ONE chip — the soak
is the single-chip evidence + the pod projection lives in BASELINE.md.

Usage:
  python scripts/config5_soak.py --phase solo --spp 5000
  python scripts/config5_soak.py --phase part1 --spp 5000 --kill-spp 2500
  python scripts/config5_soak.py --phase part2 --spp 5000
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax

if os.environ.get("SMALLPT_TPU_BENCH_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_smallpt_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np

from smallpt_tpu.config import (CameraModel, Filter, Intersector,
                                RenderConfig)
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core.scene import procedural_sphere_scene
from smallpt_tpu.engine.streaming import StreamingRenderer

OUT = "bench_logs/config5"


def log(obj):
    print(json.dumps(obj), flush=True)


def make_renderer(args):
    # config 5 runs on the per-ray DDA streaming engine (r5 flagship:
    # 15.5 Mrays/s at 512x384 on this scene vs 4.51 for the prior brute
    # path — BASELINE.md r5 section); StreamingRenderer auto-routes the
    # 10k-sphere scene to ops/stream_dda.py
    config = RenderConfig(
        width=args.width, height=args.height, spp_per_cell=1,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
        max_depth=args.depth, intersector=Intersector.PALLAS,
    )
    scene = procedural_sphere_scene(args.n)
    r = StreamingRenderer(scene, smallpt_camera(), config, seed=0)
    # split long advances into bounded launches: a single launch whose
    # while_loop runs minutes of device time crashes the TPU worker
    # (r5e: one 10,000-DDA-iteration launch over 254 tiles at 1080p)
    r.max_launch_iters = args.launch_iters
    log({"event": "engine", "dda": r._dda is not None,
         "launch_iters": args.launch_iters})
    return r


def _with_hang_watchdog(fn, timeout_s, label):
    """Run fn() in a worker thread; if it blocks past timeout_s, hard-exit
    with code 3 so the driver's retry loop restarts from the last progress
    checkpoint. The axon tunnel has been observed to hang a device fetch
    INDEFINITELY mid-soak (r5f: two part2 runs stalled 18+ min on one
    window with ~0% CPU) — a blocked C call cannot be interrupted from
    Python, so the only safe recovery is process death + resume."""
    import threading

    result = {}

    def run():
        result["v"] = fn()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_s)
    if "v" not in result:
        log({"event": "hang", "label": label, "timeout_s": timeout_s})
        os._exit(3)
    return result["v"]


def drive(r, args, spp_target, label, t_start, progress_path=None):
    """Advance to spp_target TOTAL budget in windows, logging per-window
    sustained rates (the thermal curve). Saves a progress checkpoint every
    --ckpt-every windows (resume-from-checkpoint is the validated
    bit-exact mechanism, so a retry after a tunnel hang loses at most
    that many windows)."""
    done = r.budget
    n_win = 0
    while done < spp_target:
        add = min(args.window_spp, spp_target - done)
        t0 = time.perf_counter()
        rays = _with_hang_watchdog(
            lambda: r.step(n_iters=args.iters_per_spp * add,
                           add_samples=add),
            args.window_timeout, label,
        )
        dt = time.perf_counter() - t0
        done += add
        n_win += 1
        log({"event": "window", "label": label, "spp_done": done,
             "rays": int(rays), "window_s": round(dt, 2),
             "mrays_s": round(rays / dt / 1e6, 2),
             "t_total_s": round(time.perf_counter() - t_start, 1)})
        if progress_path and n_win % args.ckpt_every == 0:
            r.save_checkpoint(progress_path)
            log({"event": "progress_ckpt", "label": label, "spp": done})
    t0 = time.perf_counter()
    _with_hang_watchdog(r.flush, args.flush_timeout, label + "-flush")
    log({"event": "flush", "label": label,
         "flush_s": round(time.perf_counter() - t0, 2),
         "rays_total": int(r.stats.rays)})


def maybe_resume(r, path):
    """Resume from a progress checkpoint when one exists and is loadable;
    silently start fresh otherwise."""
    if path and os.path.exists(path):
        try:
            r.load_checkpoint(path)
            log({"event": "resumed_progress", "path": path,
                 "budget": r.budget})
        except (ValueError, KeyError, OSError) as e:
            log({"event": "progress_ckpt_rejected", "path": path,
                 "error": str(e)[:160]})


def save_acc(r, path):
    rad, w = r.accumulators()
    np.savez(path, rad=np.asarray(rad), w=np.asarray(w))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["solo", "part1", "part2"],
                    required=True)
    ap.add_argument("--spp", type=int, default=5000)
    ap.add_argument("--kill-spp", type=int, default=2500)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--depth", type=int, default=24)
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--window-spp", type=int, default=50)
    ap.add_argument("--iters-per-spp", type=int, default=8)
    ap.add_argument("--ckpt-every", type=int, default=10,
                    help="save a progress checkpoint every N windows — a "
                    "tunnel-hang retry loses at most N windows")
    ap.add_argument("--window-timeout", type=float, default=900.0,
                    help="hard-exit(3) if one window blocks this long "
                    "(normal window ~47 s; first-after-compile ~100 s)")
    ap.add_argument("--flush-timeout", type=float, default=2400.0)
    ap.add_argument("--launch-iters", type=int, default=16,
                    help="max bounce-iterations per kernel launch (the DDA "
                    "kernel runs 5x this in walk steps); ~2 s of device "
                    "time per launch at 1920x1080 — keeps every launch far "
                    "under the tunnel watchdog")
    args = ap.parse_args()

    os.makedirs(OUT, exist_ok=True)
    t_start = time.perf_counter()
    log({"event": "start", "phase": args.phase,
        "backend": jax.default_backend(),
        "shape": [args.width, args.height, args.spp, args.n]})

    r = make_renderer(args)
    # artifacts are shape-tagged: the r5e part2 run silently resumed a
    # stale TOY-shape soak_ck.npz left by a CPU validation run
    tag = f"{args.width}x{args.height}_{args.spp}"

    prog = f"{OUT}/progress_{args.phase}_{tag}.npz"

    if args.phase == "solo":
        maybe_resume(r, prog)
        drive(r, args, args.spp, "solo", t_start, progress_path=prog)
        save_acc(r, f"{OUT}/solo_acc_{tag}.npz")
        if os.path.exists(prog):
            os.remove(prog)
        log({"event": "done", "phase": "solo",
             "wall_s": round(time.perf_counter() - t_start, 1),
             "rays": int(r.stats.rays)})
    elif args.phase == "part1":
        maybe_resume(r, prog)
        drive(r, args, args.kill_spp, "part1", t_start, progress_path=prog)
        r.save_checkpoint(f"{OUT}/soak_ck_{tag}.npz")
        if os.path.exists(prog):
            os.remove(prog)
        log({"event": "checkpointed", "spp": args.kill_spp,
             "wall_s": round(time.perf_counter() - t_start, 1)})
        # simulated crash: hard exit, no cleanup
        os._exit(0)
    else:  # part2
        # a part2 progress checkpoint (from a retried run) supersedes the
        # part1 kill-point checkpoint — resume-from-checkpoint is the
        # bit-exact mechanism either way, so continuity claims hold across
        # any number of retries
        if os.path.exists(prog):
            maybe_resume(r, prog)
        if r.budget == 0:
            r.load_checkpoint(f"{OUT}/soak_ck_{tag}.npz")
        log({"event": "resumed", "budget": r.budget})
        drive(r, args, args.spp, "part2", t_start, progress_path=prog)
        save_acc(r, f"{OUT}/resumed_acc_{tag}.npz")
        if os.path.exists(prog):
            os.remove(prog)
        log({"event": "done", "phase": "part2",
             "wall_s": round(time.perf_counter() - t_start, 1),
             "rays": int(r.stats.rays)})
        solo = f"{OUT}/solo_acc_{tag}.npz"
        if os.path.exists(solo):
            a = np.load(solo)
            b = np.load(f"{OUT}/resumed_acc_{tag}.npz")
            bit_equal = (np.array_equal(a["rad"], b["rad"])
                         and np.array_equal(a["w"], b["w"]))
            log({"event": "bit_continuity", "equal": bool(bit_equal)})


if __name__ == "__main__":
    main()
