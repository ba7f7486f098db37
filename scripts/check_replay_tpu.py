"""Hardware sanity for the replay differentiator: on real Mosaic (not the
CPU interpreter) check that (a) the replay scan reproduces the megakernel
recorder's image, (b) replay grads agree with the scan differentiator's.
CPU parity is pinned by tests/test_grad_replay.py; this validates the same
contracts through real kernel lowering, where FMA contraction may add ulp
noise (CLAUDE.md) but nothing structural."""

from __future__ import annotations

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_smallpt_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np

from smallpt_tpu.config import (CameraModel, Filter, Intersector,
                                RenderConfig)
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core.scene import cornell_box_scene
from smallpt_tpu.grad.diff import image_loss_and_grads, render_mean
from smallpt_tpu.grad.replay import record_forward, replay_mean

CFG = RenderConfig(
    width=64, height=48, spp_per_cell=1, max_depth=8,
    camera_model=CameraModel.LEGACY, filter=Filter.TENT,
    intersector=Intersector.PALLAS,
)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    scene, cam = cornell_box_scene(), smallpt_camera()
    key = prng.base_key(0)
    target = render_mean(scene, cam, CFG, prng.base_key(99))

    img_rec, winners, rays = record_forward(scene, cam, CFG, key)
    img_rep = jax.jit(replay_mean, static_argnames=("config",))(
        scene, cam, CFG, key, winners
    )
    d = np.abs(np.asarray(img_rep) - np.asarray(img_rec))
    frac = float((d.max(-1) > 1e-3).mean())
    print(f"replay-vs-record: max {d.max():.2e} mean {d.mean():.2e} "
          f"frac_pix>1e-3 {frac:.4f} rays {float(rays):.0f}", flush=True)

    _, _, g_r = image_loss_and_grads(scene, cam, CFG, key, target)
    _, _, g_s = image_loss_and_grads(
        scene, cam, CFG.replace(diff_replay=False), key, target
    )
    for name in ("albedo", "emission", "center", "radius"):
        a = np.asarray(getattr(g_s, name)).ravel()
        b = np.asarray(getattr(g_r, name)).ravel()
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        cos = float(np.dot(a, b) / denom) if denom > 0 else 1.0
        print(f"grad cosine {name}: {cos:.6f}", flush=True)
    ok = frac < 0.01
    print(f"REPLAY_TPU_CHECK {'PASS' if ok else 'FAIL'}", flush=True)


if __name__ == "__main__":
    main()
