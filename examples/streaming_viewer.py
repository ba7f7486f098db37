"""Progressive streaming render with live frame output.

Drives the continuous-wavefront StreamingRenderer and streams normalized
frames to disk through the native async frame writer — the reference's
interactive producer/consumer display loop (smallpt.cpp:895-988), headless.

Run:  python examples/streaming_viewer.py [--spp 64] [--frames 8]
"""

from __future__ import annotations

import argparse
import os

from smallpt_tpu import RenderConfig, Filter, CameraModel
from smallpt_tpu.core.scene import cornell_box_scene
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.engine.streaming import StreamingRenderer
from smallpt_tpu.utils import image as img_io, native
from smallpt_tpu.utils.metrics import log_json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--out", default="stream_out")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    cfg = RenderConfig(width=args.width, height=args.height, spp_per_cell=1,
                       camera_model=CameraModel.LEGACY, filter=Filter.TENT)
    r = StreamingRenderer(cornell_box_scene(), smallpt_camera(), cfg, seed=0)

    writer = None
    if native.available():
        writer = native.FrameWriter(
            os.path.join(args.out, "frame_%04d.ppm"),
            cfg.width, cfg.height, binary=True,
        )
    per_frame = max(1, args.spp // args.frames)
    try:
        for frame in range(args.frames):
            rays = r.step(n_iters=per_frame * 16, add_samples=per_frame)
            log_json("frame", {"frame": frame, "rays": rays,
                               **r.stats.as_dict()})
            if writer is not None:
                writer.push(r.image[::-1], frame)
    finally:
        if writer is not None:
            writer.close()
    r.flush()
    img_io.write_ppm(os.path.join(args.out, "final.ppm"), r.image)
    print(f"done: {r.stats.rays} rays at "
          f"{r.stats.rays_per_s/1e6:.1f} Mrays/s -> {args.out}/final.ppm")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
