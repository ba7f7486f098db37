"""Triangle-mesh rendering through the grid-culled accelerated sweep.

The reference's primary accelerated workload is a triangle-mesh BVH
(rtpModelCreate over index/vertex buffers, /root/reference/smallpt.cpp:
489-516, RTP_QUERY_TYPE_CLOSEST at :578-582). Here the same slot is the
grid-culled, distance-ordered, early-exit sweep (ops/mesh_accel.py +
ops/mesh_pallas.py::intersect_mesh_culled); render() engages it for any
concrete mesh above engine.renderer.MESH_ACCEL_MIN_TRIS when the PALLAS
intersector is selected — results are bit-identical to the brute sweep.
The route is OPT-IN (SMALLPT_TPU_MESH_ACCEL_MIN env var, default off):
on TPU the brute chunked sweep measured ~1.5x faster at 32k tris in both
sparse and dense occlusion regimes (BASELINE.md, r3b session), so this
example forces the culled route to demonstrate it.

Run:  python examples/mesh_scene.py [n_balls] [out.png]
(equivalently: python -m smallpt_tpu 16 --scene mesh --out mesh.png)
"""

import sys

import numpy as np

from smallpt_tpu.config import (
    CameraModel, Filter, Intersector, RenderConfig, Scheduler,
)
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core.scene import procedural_mesh_scene
from smallpt_tpu.engine.renderer import render_image
from smallpt_tpu.utils.image import write_png


def main() -> None:
    from smallpt_tpu.engine import renderer as R

    R.MESH_ACCEL_MIN_TRIS = 1  # demonstrate the culled route (see docstring)
    n_balls = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    out = sys.argv[2] if len(sys.argv) > 2 else "mesh_scene.png"
    config = RenderConfig(
        width=320, height=240, spp_per_cell=4, max_depth=12,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
        intersector=Intersector.PALLAS, scheduler=Scheduler.FLAT,
    )
    scene = procedural_mesh_scene(n_balls=n_balls)
    print(f"{scene.n_triangles} triangles "
          f"({n_balls} tessellated balls + quad walls)")
    img = render_image(
        scene, smallpt_camera(), config, seed=0, n_passes=4
    )
    write_png(out, np.asarray(img))  # linear in; write_png gamma-maps + flips
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
