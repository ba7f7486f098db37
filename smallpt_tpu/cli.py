"""Command-line entry point.

The reference's CLI is one positional arg — total spp, divided by the 4
jitter cells (smallpt.cpp:276,846) — plus compile-time constants for
everything else. This CLI exposes every such constant (SURVEY.md §5.6) and
writes image.ppm like the reference (smallpt.cpp:138).

Examples:
    smallpt-tpu --scene cornell --spp 64 --width 256 --height 256
    smallpt-tpu --scene cornell --mode normal --out normals.png
    python -m smallpt_tpu --scene two_sphere --camera legacy --filter tent 16
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from smallpt_tpu.config import (
    RenderConfig, Mode, Filter, CameraModel, Intersector, Scheduler,
)
from smallpt_tpu.core import scene as scenes
from smallpt_tpu.core.camera import smallpt_camera, default_matrix_camera
from smallpt_tpu.engine.progressive import ProgressiveRenderer
from smallpt_tpu.utils import image as img_io


SCENES = {
    "cornell": scenes.cornell_box_scene,
    "cornell_dim": scenes.cornell_box_dim_light_scene,
    "cornell_small_light": scenes.cornell_box_small_light_scene,
    "two_sphere": scenes.two_sphere_scene,
    "triangle": scenes.single_triangle_scene,
    "procedural": scenes.procedural_sphere_scene,
    # 32k-triangle quad-walled Cornell + tessellated balls: exercises the
    # grid-culled mesh acceleration (ops/mesh_accel.py) via auto-routing
    "mesh": scenes.procedural_mesh_scene,
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="smallpt-tpu", description=__doc__)
    p.add_argument("spp", nargs="?", type=int, default=4,
                   help="total samples per pixel (divided over jitter cells, "
                        "like the reference's argv[1])")
    p.add_argument("--scene", choices=sorted(SCENES), default="cornell")
    p.add_argument("--scene-file", default=None, metavar="PATH",
                   help="render a declarative JSON scene file "
                        "(core/scene_io.py format; overrides --scene)")
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--mode", choices=[m.value for m in Mode], default="full")
    p.add_argument("--filter", choices=[f.value for f in Filter], default=None)
    p.add_argument("--camera", choices=[c.value for c in CameraModel], default=None)
    p.add_argument("--intersector", choices=[i.value for i in Intersector],
                   default=None,
                   help="default: pallas for --scene mesh (the culled "
                        "accel path), jax otherwise")
    p.add_argument("--scheduler", choices=[s.value for s in Scheduler],
                   default=None,
                   help="wavefront scheduler: mega (fused Pallas bounce "
                        "kernel, fastest), regen (pure-JAX persistent "
                        "lanes), flat (masked lanes; required for "
                        "--split-budget > 1)")
    p.add_argument("--frames", default=None, metavar="PATTERN",
                   help="stream per-pass frames to PATTERN (printf-style, "
                        "e.g. frames/f_%%04d.ppm) via the native async "
                        "frame writer")
    p.add_argument("--max-depth", type=int, default=64)
    p.add_argument("--rr-depth", type=int, default=5)
    p.add_argument("--split-budget", type=int, default=1)
    p.add_argument("--exposure", type=float, default=1.0,
                   help="linear exposure multiplier applied before the "
                        "gamma-2.2 display mapping")
    p.add_argument("--aperture", type=float, default=0.0,
                   help="thin-lens aperture radius in scene units "
                        "(0 = pinhole)")
    p.add_argument("--focus", type=float, default=100.0,
                   help="focal distance (along-ray) for --aperture > 0")
    p.add_argument("--env", type=float, nargs=3, default=None,
                   metavar=("R", "G", "B"),
                   help="constant environment radiance picked up by escaped "
                        "rays (the smallpt.cpp:168 hook; default: black)")
    p.add_argument("--nee", type=int, nargs="+", default=None, metavar="LIGHT",
                   help="next-event estimation: sphere indices of the lights "
                        "to explicitly sample (e.g. --nee 8 for the Cornell "
                        "light); huge variance reduction for small emitters")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--passes", type=int, default=None,
                   help="progressive passes (default: spp/4 like the reference)")
    p.add_argument("--out", default="image.ppm")
    p.add_argument("--checkpoint", default=None,
                   help="save progressive state here after rendering")
    p.add_argument("--resume", default=None, help="resume from a checkpoint")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--stats", action="store_true",
                   help="emit one structured JSON log line per pass "
                        "(rays, wall time, rays/s)")
    p.add_argument("--quality", type=float, default=None, metavar="REL_ERR",
                   help="with --streaming or --binned: equal-quality "
                        "stopping — render until the 95%%-quantile "
                        "per-pixel relative stderr is below REL_ERR "
                        "(spp becomes the max budget)")
    p.add_argument("--streaming", action="store_true",
                   help="continuous-wavefront streaming renderer (fastest; "
                        "sphere scenes, full transport only): renders spp x "
                        "passes samples/pixel in one persistent stream")
    p.add_argument("--binned", action="store_true",
                   help="grid-binned distance-ordered streaming renderer "
                        "(the acceleration-structure path for big sphere "
                        "scenes, e.g. --scene procedural)")
    p.add_argument("--interactive", action="store_true",
                   help="render progressively until EOF/quit, consuming "
                        "line-delimited JSON commands from stdin (the "
                        "reference's render-request protocol: update_camera/"
                        "update_scene/reset/snapshot/quit, plus u/d camera "
                        "nudges)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.scene_file:
        from smallpt_tpu.core.scene_io import load_scene
        from smallpt_tpu.core.scene import MeshScene

        scene = load_scene(args.scene_file)
        mesh_scene = isinstance(scene, MeshScene)
    else:
        scene = SCENES[args.scene]()
        mesh_scene = args.scene in ("triangle", "mesh")
    # scene-appropriate defaults mirroring the reference's two pipelines
    # (the "mesh" ball scene lives in the Cornell interior: legacy camera)
    camera_model = CameraModel(args.camera) if args.camera else (
        CameraModel.MATRIX if args.scene == "triangle" and not args.scene_file
        else CameraModel.LEGACY
    )
    # intersector default derives from the RESOLVED scene (not the builtin
    # name, which --scene-file overrides): real meshes get the Pallas
    # culled/chunked kernel; the 1-triangle debug scene stays pure-JAX
    intersector = Intersector(args.intersector) if args.intersector else (
        Intersector.PALLAS if mesh_scene and int(scene.n_triangles) >= 64
        else Intersector.JAX
    )
    filt = Filter(args.filter) if args.filter else (
        Filter.BOX if camera_model == CameraModel.MATRIX else Filter.TENT
    )

    spp_per_cell = max(1, args.spp // 4)
    n_passes = args.passes if args.passes is not None else 1

    config = RenderConfig(
        width=args.width,
        height=args.height,
        spp_per_cell=spp_per_cell,
        mode=Mode(args.mode),
        filter=filt,
        camera_model=camera_model,
        intersector=intersector,
        scheduler=(
            Scheduler.FLAT if args.split_budget > 1
            else Scheduler(args.scheduler or "mega")
        ),
        max_depth=args.max_depth,
        rr_depth=args.rr_depth,
        split_budget=args.split_budget,
        nee_lights=tuple(args.nee) if args.nee else (),
        env_emission=tuple(args.env) if args.env else (0.0, 0.0, 0.0),
        aperture=args.aperture,
        focal_distance=args.focus,
    )
    camera = (
        default_matrix_camera()
        if camera_model == CameraModel.MATRIX
        else smallpt_camera()
    )

    if args.nee:
        import numpy as _np

        # sphere scenes: indices are sphere ids (cone sampling); mesh
        # scenes: indices are INSTANCE ids (triangle area sampling)
        n_ent = (
            int(scene.material.refl.shape[0]) if mesh_scene
            else int(scene.center.shape[0])
        )
        kind = "instances" if mesh_scene else "spheres"
        for li in args.nee:
            if not (0 <= li < n_ent):
                build_parser().error(
                    f"--nee index {li} out of range (scene has {n_ent} "
                    f"{kind})"
                )
            if float(_np.asarray(scene.material.emission[li]).max()) <= 0:
                print(f"warning: --nee light {li} has zero emission",
                      file=sys.stderr)
        if mesh_scene:
            tri_inst = _np.asarray(scene.tri_inst)
            for li in args.nee:
                if not (tri_inst == li).any():
                    build_parser().error(
                        f"--nee instance {li} has no triangles"
                    )

    def make_frame_sink():
        """Native async frame writer, or a synchronous fallback (never a
        silent no-op)."""
        if not args.frames:
            return None, None
        import os

        from smallpt_tpu.utils import native

        os.makedirs(os.path.dirname(args.frames) or ".", exist_ok=True)
        if native.available():
            return native.FrameWriter(
                args.frames, config.width, config.height,
                binary=args.frames.endswith(".ppm"),
            ), None
        print("native frame writer unavailable; writing frames synchronously",
              file=sys.stderr)
        return None, (lambda img, idx: img_io.write_ppm(args.frames % idx, img))

    if args.streaming and args.interactive:
        build_parser().error("--streaming and --interactive are exclusive "
                             "(the interactive protocol drives the "
                             "progressive accumulator)")
    if args.quality is not None and not (
        args.streaming or (args.binned and not args.interactive)
    ):
        build_parser().error(
            "--quality requires --streaming or --binned (equal-quality "
            "stopping drives those renderers' moment planes)"
        )
    if args.binned and not args.interactive:
        from smallpt_tpu.engine.binned import BinnedStreamingRenderer
        from smallpt_tpu.utils.metrics import log_json

        br = BinnedStreamingRenderer(scene, camera, config, seed=args.seed)
        if args.resume:
            br.load_checkpoint(args.resume)
        t0 = time.time()
        if args.quality is not None:
            q = br.step_to_quality(rel_err=args.quality,
                                   max_spp=config.spp * n_passes,
                                   n_bounces=2 * config.max_depth)
            if not args.quiet:
                print(
                    f"quality stop: rel_err@95% {q['rel_err_q']:.4f} "
                    f"spp {q['spp_min']}..{q['spp_max']} "
                    f"({q['rounds']} rounds)", file=sys.stderr,
                )
        else:
            br.step(add_samples=config.spp * n_passes,
                    n_bounces=2 * config.max_depth)
            br.flush()
        if not args.quiet:
            print(f"Elapsed time: {(time.time() - t0) * 1000:.0f} ms",
                  file=sys.stderr)
        if args.stats:
            log_json("binned_done", br.stats.as_dict())
        img = br.image * args.exposure
        if args.out.endswith(".png"):
            img_io.write_png(args.out, img)
        else:
            img_io.write_ppm(args.out, img)
        if args.checkpoint:
            br.save_checkpoint(args.checkpoint)
        if not args.quiet:
            print(f"Wrote {args.out}", file=sys.stderr)
        return 0
    if args.streaming:
        from smallpt_tpu.engine.streaming import StreamingRenderer
        from smallpt_tpu.utils.metrics import log_json

        if mesh_scene:
            # triangle scenes stream through the XLA-composed continuous
            # wavefront (engine/mesh_stream.py); spheres keep the faster
            # persistent Pallas megakernel below
            from smallpt_tpu.engine.mesh_stream import (
                WavefrontStreamingRenderer,
            )

            ms = WavefrontStreamingRenderer(scene, camera, config,
                                            seed=args.seed)
            if args.resume:
                ms.load_checkpoint(args.resume)
            frame_writer, frame_sync = make_frame_sink()
            t0 = time.time()
            if args.quality is not None:
                q = ms.step_to_quality(
                    rel_err=args.quality,
                    max_spp=config.spp * n_passes,
                    n_bounces=2 * config.max_depth,
                )
                if not args.quiet:
                    print(
                        f"quality stop: rel_err@95% {q['rel_err_q']:.4f} "
                        f"spp {q['spp_min']}..{q['spp_max']} "
                        f"({q['rounds']} rounds)", file=sys.stderr,
                    )
            else:
                total = config.spp * n_passes
                chunks = n_passes if (frame_writer or frame_sync) else 1
                per = max(1, total // chunks)
                for c in range(chunks):
                    ms.step(n_bounces=2 * config.max_depth,
                            add_samples=per)
                    if frame_writer is not None:
                        frame_writer.push(ms.image[::-1] * args.exposure,
                                          c + 1)
                    elif frame_sync is not None:
                        frame_sync(ms.image * args.exposure, c + 1)
                ms.flush()
            if frame_writer is not None:
                frame_writer.close()
            if not args.quiet:
                print(f"Elapsed time: {(time.time() - t0) * 1000:.0f} ms",
                      file=sys.stderr)
            if args.stats:
                log_json("stream_done", ms.stats.as_dict())
            img = ms.image * args.exposure
            if args.out.endswith(".png"):
                img_io.write_png(args.out, img)
            else:
                img_io.write_ppm(args.out, img)
            if args.checkpoint:
                ms.save_checkpoint(args.checkpoint)
            if not args.quiet:
                print(f"Wrote {args.out}", file=sys.stderr)
            return 0

        sr = StreamingRenderer(scene, camera, config, seed=args.seed)
        if args.resume:
            sr.load_checkpoint(args.resume)
        frame_writer, frame_sync = make_frame_sink()
        t0 = time.time()
        if args.quality is not None:
            # equal-QUALITY stopping: spp becomes the max budget, samples
            # are allocated adaptively until the target relative stderr
            q = sr.step_to_quality(
                rel_err=args.quality,
                max_spp=config.spp * n_passes,
            )
            if not args.quiet:
                print(
                    f"quality stop: rel_err@95% {q['rel_err_q']:.4f} "
                    f"spp {q['spp_min']}..{q['spp_max']} "
                    f"({q['rounds']} rounds)", file=sys.stderr,
                )
        else:
            total = config.spp * n_passes
            chunks = n_passes if (frame_writer or frame_sync) else 1
            per = max(1, total // chunks)
            for c in range(chunks):
                sr.step(n_iters=1_000_000, add_samples=per)
                if frame_writer is not None:
                    frame_writer.push(sr.image[::-1] * args.exposure, c + 1)
                elif frame_sync is not None:
                    frame_sync(sr.image * args.exposure, c + 1)
            sr.flush()
        if frame_writer is not None:
            frame_writer.close()
        if not args.quiet:
            print(f"Elapsed time: {(time.time() - t0) * 1000:.0f} ms",
                  file=sys.stderr)
        if args.stats:
            log_json("stream_done", sr.stats.as_dict())
        img = sr.image * args.exposure
        if args.out.endswith(".png"):
            img_io.write_png(args.out, img)
        else:
            img_io.write_ppm(args.out, img)
        if args.checkpoint:
            sr.save_checkpoint(args.checkpoint)
        if not args.quiet:
            print(f"Wrote {args.out}", file=sys.stderr)
        return 0

    # big sphere scenes route through the persistent binned (grid-culled)
    # scheduler — the reference's accelerated backend serves its interactive
    # loop too (smallpt.cpp:605,895-941)
    from smallpt_tpu.ops.megakernel import MEGA_MAX_SPHERES

    use_binned = args.binned or (
        not mesh_scene
        and int(scene.center.shape[0]) > MEGA_MAX_SPHERES
        and config.mode == Mode.FULL
        and config.split_budget == 1
    )
    use_mesh_stream = (
        mesh_scene
        and config.mode == Mode.FULL
        and config.split_budget == 1
        # an EXPLICIT --scheduler choice pins the per-pass engine (its
        # keying and checkpoint format differ from the streaming one)
        and args.scheduler is None
    )
    if use_binned:
        from smallpt_tpu.engine.progressive import BinnedProgressiveRenderer

        r = BinnedProgressiveRenderer(scene, camera, config, seed=args.seed)
    elif use_mesh_stream:
        # triangle scenes drive the persistent streaming wavefront (accel +
        # NEE tables built once, state carried across passes) — per-pass
        # falls back below only for AOV/splitting configs
        from smallpt_tpu.engine.progressive import (
            MeshStreamProgressiveRenderer,
        )

        r = MeshStreamProgressiveRenderer(scene, camera, config,
                                          seed=args.seed)
    else:
        r = ProgressiveRenderer(scene, camera, config, seed=args.seed)
    r.log_stats = args.stats
    if args.resume:
        r.load_checkpoint(args.resume)

    if args.interactive:
        from smallpt_tpu.interactive import InteractiveSession

        session = InteractiveSession(r, frame_pattern=args.frames)
        passes = session.run(max_passes=args.passes)
        r.finalize()
        if not args.quiet:
            print(f"interactive session ended after {passes} passes",
                  file=sys.stderr)
        img = r.image * args.exposure
        if args.out.endswith(".png"):
            img_io.write_png(args.out, img)
        else:
            img_io.write_ppm(args.out, img)
        if args.checkpoint:
            r.save_checkpoint(args.checkpoint)
        return 0

    frame_writer, frame_sync = make_frame_sink()

    t0 = time.time()
    for i in range(n_passes):
        r.step()
        if frame_writer is not None:
            frame_writer.push(r.image[::-1] * args.exposure, i + 1)
        elif frame_sync is not None:
            frame_sync(r.image * args.exposure, i + 1)
        if not args.quiet:
            done = 100.0 * (i + 1) / n_passes
            print(
                f"\rRendering ({config.spp * n_passes} spp) {done:5.2f}%",
                end="",
                file=sys.stderr,
            )
    if frame_writer is not None:
        frame_writer.close()
    r.finalize()  # binned wavefronts drain; per-pass accumulation is a no-op
    np.asarray(r.accum.block_until_ready())
    if not args.quiet:
        print(f"\nElapsed time: {(time.time() - t0) * 1000:.0f} ms", file=sys.stderr)

    img = r.image * args.exposure
    if args.out.endswith(".png"):
        img_io.write_png(args.out, img)
    elif args.out.endswith(".p6.ppm"):
        img_io.write_ppm_binary(args.out, img)
    else:
        img_io.write_ppm(args.out, img)
    if args.checkpoint:
        r.save_checkpoint(args.checkpoint)
    if not args.quiet:
        print(f"Wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
