"""Regenerate the stored golden-image fixtures (tests/data/golden_*.npz).

Each golden is a float64 oracle render (the independent scalar
implementation) at a fixed (scene, config, seed) triple. The renderer
consumes the SAME uniform streams, so tests compare images path-for-path —
tolerances cover f32-vs-f64 geometry noise, not MC noise.

Run from the repo root (CPU; ~1-2 min):
    JAX_PLATFORMS=cpu python scripts/gen_goldens.py
Only rerun when the sample-keying or oracle semantics intentionally change;
commit the regenerated .npz files with that change.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from smallpt_tpu.config import RenderConfig, Filter, CameraModel
    from smallpt_tpu.core import rng as prng
    from smallpt_tpu.core.camera import smallpt_camera
    from smallpt_tpu.core.scene import (
        cornell_box_scene,
        cornell_box_small_light_scene,
        procedural_mesh_scene,
    )

    def _mesh_scene():
        return procedural_mesh_scene(n_balls=60, seed=3)
    from smallpt_tpu.oracle.numpy_oracle import (
        Oracle, PrecomputedUniformProvider,
    )

    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "data")
    os.makedirs(out_dir, exist_ok=True)

    cases = {
        # config-2-class gate: pure diffuse+spec+refr Cornell at a real
        # (non-toy) aspect, 16 spp
        "golden_cornell_48x36": (
            cornell_box_scene(),
            RenderConfig(
                width=48, height=36, spp_per_cell=4, max_depth=24,
                camera_model=CameraModel.LEGACY, filter=Filter.TENT,
            ),
            7,
        ),
        # NEE small-light: explicit light sampling path
        "golden_nee_smalllight_32x24": (
            cornell_box_small_light_scene(),
            RenderConfig(
                width=32, height=24, spp_per_cell=2, max_depth=16,
                camera_model=CameraModel.LEGACY, filter=Filter.TENT,
                nee_lights=(8,),
            ),
            11,
        ),
        # SHALLOW-depth tight golden (VERDICT r2 weak #6): at depth 4 the
        # razor-flip population is near zero, so the test gate can be an
        # order of magnitude tighter than the depth-24 golden's — a
        # systematic few-percent brightness bug that hides inside the deep
        # golden's envelope fails loudly here
        "golden_cornell_shallow_48x36": (
            cornell_box_scene(),
            RenderConfig(
                width=48, height=36, spp_per_cell=4, max_depth=4,
                camera_model=CameraModel.LEGACY, filter=Filter.TENT,
            ),
            17,
        ),
        # thin-lens depth of field
        "golden_dof_32x24": (
            cornell_box_scene(),
            RenderConfig(
                width=32, height=24, spp_per_cell=2, max_depth=12,
                camera_model=CameraModel.LEGACY, filter=Filter.TENT,
                aperture=4.0, focal_distance=120.0,
            ),
            13,
        ),
        # triangle-mesh transport (r3): quad-walled Cornell + tessellated
        # balls through the oracle's f64 mesh mirror — guards the culled
        # accel route (test_golden forces it) against ground truth
        "golden_mesh_32x24": (
            _mesh_scene(),
            RenderConfig(
                width=32, height=24, spp_per_cell=2, max_depth=10,
                camera_model=CameraModel.LEGACY, filter=Filter.TENT,
            ),
            19,
        ),
    }

    for name, (scene, cfg, seed) in cases.items():
        key = prng.base_key(seed)
        n = cfg.n_pixels * cfg.spp
        oracle = Oracle(scene, smallpt_camera(), cfg,
                        PrecomputedUniformProvider(key, n))
        img = oracle.render()
        path = os.path.join(out_dir, f"{name}.npz")
        np.savez_compressed(
            path,
            image=img,
            seed=seed,
            width=cfg.width, height=cfg.height, spp=cfg.spp,
            max_depth=cfg.max_depth,
        )
        print(f"{name}: mean={img.mean()/cfg.spp:.4f} -> {path}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
