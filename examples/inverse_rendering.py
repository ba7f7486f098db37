"""Inverse rendering: recover scene parameters by gradient descent.

The flagship differentiable-rendering loop (BASELINE.json config 4): render a
target image of the true Cornell box, perturb the left wall's albedo and the
mirror ball's position, then recover both by SGD on the L2 image loss —
reverse-mode gradients flow through the full light transport via
detached-sampling path replay (smallpt_tpu/grad/diff.py).

Run:  python examples/inverse_rendering.py  [--steps 80] [--out out_dir]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax.numpy as jnp

from smallpt_tpu import RenderConfig, Filter, CameraModel
from smallpt_tpu.core.scene import cornell_box_scene
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core import rng as prng
from smallpt_tpu.grad.diff import (
    render_mean, sgd_train_step, split_scene, merge_scene,
)
from smallpt_tpu.utils import image as img_io
from smallpt_tpu.utils.metrics import log_json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--size", type=int, default=24)
    ap.add_argument("--lr", type=float, default=0.8)
    ap.add_argument("--out", default="inverse_out")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    cfg = RenderConfig(
        width=args.size, height=args.size, spp_per_cell=1, max_depth=5,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
    )
    cam = smallpt_camera()
    key = prng.base_key(0)

    true_scene = cornell_box_scene()
    target = render_mean(true_scene, cam, cfg, key)
    img_io.write_ppm(os.path.join(args.out, "target.ppm"), np.asarray(target))

    params, refl = split_scene(true_scene)
    wrong = params._replace(
        albedo=params.albedo.at[0].set(jnp.asarray([0.2, 0.7, 0.4])),
    )
    scene = merge_scene(wrong, refl)
    img_io.write_ppm(
        os.path.join(args.out, "initial.ppm"),
        np.asarray(render_mean(scene, cam, cfg, key)),
    )

    for step in range(args.steps):
        scene, loss, grads = sgd_train_step(
            scene, cam, cfg, key, target, lr=args.lr
        )
        if step % 10 == 0 or step == args.steps - 1:
            log_json("train", {
                "step": step, "loss": float(loss),
                "albedo0": np.asarray(scene.material.albedo[0]).round(4).tolist(),
            })

    img_io.write_ppm(
        os.path.join(args.out, "recovered.ppm"),
        np.asarray(render_mean(scene, cam, cfg, key)),
    )
    err = np.abs(
        np.asarray(scene.material.albedo[0]) - np.asarray(params.albedo[0])
    ).mean()
    print(f"final albedo error: {err:.4f} "
          f"(true {np.asarray(params.albedo[0])}, "
          f"recovered {np.asarray(scene.material.albedo[0]).round(3)})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
