"""Big-scene rendering through the binned (grid-culled) scheduler.

The reference hands scenes of this size to OptiX Prime's GPU BVH
(/root/reference/smallpt.cpp:489-530); here the acceleration structure is
the grid-binned distance-ordered sweep (ops/accel.py + engine/binned.py).
Two equivalent entry points:

1. implicit — render()/render_with_stats() route any eligible sphere scene
   above ops.megakernel.MEGA_MAX_SPHERES through a binned drain;
2. explicit — BinnedStreamingRenderer for progressive/streaming control
   (budgets, equal-weight flush, acceleration-structure reuse).

Run:  python examples/big_scene.py [n_spheres] [out.png]
"""

import sys

import numpy as np

from smallpt_tpu.config import RenderConfig, CameraModel, Filter
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core.scene import procedural_sphere_scene
from smallpt_tpu.engine.binned import BinnedStreamingRenderer
from smallpt_tpu.utils.image import write_png


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    out = sys.argv[2] if len(sys.argv) > 2 else "big_scene.png"
    config = RenderConfig(
        width=320, height=240, spp_per_cell=1, max_depth=16,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
    )
    scene = procedural_sphere_scene(n)
    r = BinnedStreamingRenderer(scene, smallpt_camera(), config, seed=0)
    print(f"{n} spheres -> {r.accel.n_chunks} chunks over grid {r.accel.nb}, "
          f"{r.accel.n_bins} bins", file=sys.stderr)
    for round_ in range(4):
        r.step(add_samples=4, n_bounces=2 * config.max_depth)
        print(f"  +4 spp (total {r.budget}); {r.stats.rays} rays so far",
              file=sys.stderr)
    r.flush()
    img = np.clip(r.image, 0.0, 1.0) ** (1 / 2.2)
    write_png(out, img)
    rate = r.stats.rays / max(r.stats.wall_s, 1e-9)
    print(f"wrote {out}; {r.stats.rays} rays, {rate/1e6:.2f} Mrays/s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
