"""Weak-scaling efficiency harness for the sharded renderers.

BASELINE.json config 5 targets >= 90% scaling efficiency over >= 2 hosts;
no pod hardware exists in this environment, so this script IS the
measurement machinery, runnable on any mesh:

- today: a virtual N-device CPU mesh (``--cpu-devices 8``) exercises the
  code path and the methodology end to end (CPU numbers are NOT the claim
  — XLA:CPU collective costs differ from ICI — they validate harness +
  determinism);
- on a pod: run unmodified; jax.devices() supplies the real chips and the
  same JSON lines become the config-5 scaling evidence.

Methodology (weak scaling): per device count d, each device renders a fixed
per-device workload W_d (rows of the image band for the tile axis, or an
independent sample stream for the sample axis), so total work grows with d.
Efficiency(d) = T(1) / T(d) — perfect scaling holds T(d) flat.

Also asserts the determinism contract: the per-pass sharded render must be
bit-identical across mesh shapes (placement-invariant sample keying), which
is what makes multi-host failure recovery by re-sharding sound.

Usage:
    python scripts/scaling_harness.py --cpu-devices 8 --width 128 --height 96
    python scripts/scaling_harness.py            # real devices (pod)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force an N-device virtual CPU mesh (0 = real devices)")
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--max-depth", type=int, default=12)
    ap.add_argument("--mode", choices=("perpass", "streaming", "binned"),
                    default="perpass")
    ap.add_argument("--scene", choices=("cornell", "procedural"),
                    default="cornell",
                    help="procedural implies the binned (grid-culled) "
                         "sharded scheduler — the config-5 big-scene path")
    ap.add_argument("--n-spheres", type=int, default=2000)
    args = ap.parse_args()
    if args.scene == "procedural":
        args.mode = "binned"

    if args.cpu_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_devices}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import numpy as np

    from smallpt_tpu.config import RenderConfig, Filter, CameraModel
    from smallpt_tpu.core import rng as prng
    from smallpt_tpu.core.camera import smallpt_camera
    from smallpt_tpu.core.scene import cornell_box_scene
    from smallpt_tpu.parallel import shard
    from smallpt_tpu.parallel.stream_shard import ShardedStreamingRenderer
    from smallpt_tpu.parallel.binned_shard import ShardedBinnedRenderer

    if args.scene == "procedural":
        from smallpt_tpu.core.scene import procedural_sphere_scene

        scene = procedural_sphere_scene(args.n_spheres)
    else:
        scene = cornell_box_scene()
    camera = smallpt_camera()
    n_dev = len(jax.devices())
    counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]

    results = []
    baseline_t = None
    ref_img = None
    for d in counts:
        # weak scaling on the tile axis: rows per device fixed, image grows
        height = args.height * d
        config = RenderConfig(
            width=args.width, height=height, spp_per_cell=1,
            camera_model=CameraModel.LEGACY, filter=Filter.TENT,
            max_depth=args.max_depth,
        )
        mesh = shard.make_mesh(n_tile=d, devices=jax.devices()[:d])
        key = prng.base_key(0)
        if args.mode == "perpass":
            run = lambda: np.asarray(
                shard.render_sharded(scene, camera, config, key, mesh)
            )
        elif args.mode == "binned":
            def run():
                r = ShardedBinnedRenderer(scene, camera, config, mesh)
                r.step(add_samples=args.spp, n_bounces=args.max_depth)
                r.flush()
                return r.image
        else:
            def run():
                r = ShardedStreamingRenderer(scene, camera, config, mesh)
                r.step(n_iters=args.max_depth * args.spp + 32,
                       add_samples=args.spp)
                r.flush()
                return r.image

        run()  # compile + warm
        t0 = time.perf_counter()
        img = run()
        dt = time.perf_counter() - t0
        if baseline_t is None:
            baseline_t = dt
        eff = baseline_t / dt
        results.append({"devices": d, "wall_s": round(dt, 4),
                        "efficiency": round(eff, 4)})
        print(json.dumps({"event": "weak_scaling", **results[-1]}),
              flush=True)

    # determinism across mesh shapes (per-pass path contract): same image
    # bits from a 1-device and a d-device mesh at the SAME config
    config = RenderConfig(
        width=args.width, height=args.height, spp_per_cell=1,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
        max_depth=args.max_depth,
    )
    key = prng.base_key(0)
    imgs = {}
    for d in counts:
        if args.height % d:
            continue
        mesh = shard.make_mesh(n_tile=d, devices=jax.devices()[:d])
        if args.mode == "binned":
            # tile-axis invariance of the sharded binned scheduler (the
            # sample axis is fixed at 1: its re-sharding carve-out must
            # not excuse tile-placement sensitivity)
            r = ShardedBinnedRenderer(scene, camera, config, mesh)
            r.step(add_samples=args.spp, n_bounces=args.max_depth)
            r.flush()
            rad, w = r.accumulators()
            imgs[d] = np.concatenate(
                [np.asarray(rad), np.asarray(w)[..., None]], axis=-1
            )
        else:
            imgs[d] = np.asarray(
                shard.render_sharded(scene, camera, config, key, mesh)
            )
    base = imgs[min(imgs)]
    all_equal = all(np.array_equal(base, im) for im in imgs.values())
    print(json.dumps({
        "event": "mesh_shape_determinism",
        "meshes": sorted(imgs),
        "bit_identical": bool(all_equal),
    }), flush=True)
    if not all_equal:
        sys.exit(1)


if __name__ == "__main__":
    main()
