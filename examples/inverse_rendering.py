"""Inverse rendering: recover scene parameters by gradient descent.

The flagship differentiable-rendering loop (BASELINE.json config 4): render a
target image of the true Cornell box, perturb the left wall's albedo and the
light's emission, then recover both by projected SGD on the L2 image loss.
Reverse-mode gradients flow through the full light transport via
detached-sampling path replay (smallpt_tpu/grad/diff.py).

Geometry note: the example also prints the GLASS ball's position gradient
against finite differences — glass geometry has a smooth Fresnel/refraction
response, so that gradient is real (it matches FD to ~0.1%). Robust position
RECOVERY, however, is outside the detached-sampling bias envelope: the
silhouette term that dominates the loss is a visibility discontinuity with
no gradient (SURVEY.md §7 hard part #3).

Run:  python examples/inverse_rendering.py  [--steps 120] [--out out_dir]
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
    SceneParams, render_mean, sgd_train_step, split_scene, merge_scene,
)
from smallpt_tpu.utils import image as img_io
from smallpt_tpu.utils.metrics import log_json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--size", type=int, default=24)
    ap.add_argument("--lr", type=float, default=0.05)
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
    # perturb the left wall's albedo and dim the ceiling light
    wrong = params._replace(
        albedo=params.albedo.at[0].set(jnp.asarray([0.2, 0.7, 0.4])),
        emission=params.emission.at[8].set(jnp.asarray([6.0, 8.0, 14.0])),
    )
    scene = merge_scene(wrong, refl)

    # demonstrate the smooth glass-geometry gradient (validated vs FD)
    from smallpt_tpu.grad.diff import image_loss_and_grads
    _, _, g0 = image_loss_and_grads(scene, cam, cfg, key, target)
    h = 1e-2
    p_plus = wrong._replace(center=wrong.center.at[7, 0].add(h))
    p_minus = wrong._replace(center=wrong.center.at[7, 0].add(-h))
    lp = float(jnp.mean((render_mean(merge_scene(p_plus, refl), cam, cfg, key) - target) ** 2))
    lm = float(jnp.mean((render_mean(merge_scene(p_minus, refl), cam, cfg, key) - target) ** 2))
    log_json("glass_geometry_gradient", {
        "analytic_dloss_dx": float(g0.center[7, 0]),
        "finite_difference": (lp - lm) / (2 * h),
    })
    img_io.write_ppm(
        os.path.join(args.out, "initial.ppm"),
        np.asarray(render_mean(scene, cam, cfg, key)),
    )

    # per-group learning rates: geometry gradients (Fresnel-smooth, few
    # pixels) are ~1000x smaller than albedo gradients
    lr = SceneParams(
        center=jnp.float32(0.0),
        radius=jnp.float32(0.0),
        emission=jnp.float32(args.lr * 15.0),  # emission ~12 vs albedo ~0.75
        albedo=jnp.float32(args.lr),
    )
    for step in range(args.steps):
        scene, loss, _ = sgd_train_step(scene, cam, cfg, key, target, lr=lr)
        if step % 10 == 0 or step == args.steps - 1:
            log_json("train", {
                "step": step, "loss": float(loss),
                "albedo0": np.asarray(scene.material.albedo[0]).round(4).tolist(),
                "emission8": np.asarray(scene.material.emission[8]).round(3).tolist(),
            })

    img_io.write_ppm(
        os.path.join(args.out, "recovered.ppm"),
        np.asarray(render_mean(scene, cam, cfg, key)),
    )
    err_a = np.abs(
        np.asarray(scene.material.albedo[0]) - np.asarray(params.albedo[0])
    ).mean()
    err_e0 = np.abs(np.asarray(wrong.emission[8]) - np.asarray(params.emission[8])).mean()
    err_e = np.abs(
        np.asarray(scene.material.emission[8]) - np.asarray(params.emission[8])
    ).mean()
    print(f"albedo error: {err_a:.4f} "
          f"(true {np.asarray(params.albedo[0])}, "
          f"recovered {np.asarray(scene.material.albedo[0]).round(3)})")
    print(f"light emission error: {err_e0:.3f} -> {err_e:.3f} "
          f"(true {np.asarray(params.emission[8])}, "
          f"recovered {np.asarray(scene.material.emission[8]).round(2)})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
