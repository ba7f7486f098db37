"""Config-4 replay-step stage split: where do the 137 ms go?

Times, interleaved in one process at the config-4 shape:
  record   — render_record_megakernel forward (image + winner planes)
  replay   — replay_mean primal alone (search-free scan, no grad)
  grad     — jax.grad of the replay loss (replay primal + backward)
  step     — full image_loss_and_grads (record + loss + grad)

The split decides the next lever: if record dominates, a streaming-kernel
recorder (full-occupancy, (s_idx, depth)-indexed carry planes) pays; if
the replay grad dominates, the scan body is the target."""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_smallpt_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

from smallpt_tpu.config import (CameraModel, Filter, Intersector,
                                RenderConfig)
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core.scene import cornell_box_scene
from smallpt_tpu.grad.diff import (image_loss_and_grads, merge_scene,
                                   render_mean, split_scene)
from smallpt_tpu.grad.replay import record_forward, replay_mean

CFG = RenderConfig(
    width=512, height=512, spp_per_cell=1, max_depth=16,
    camera_model=CameraModel.LEGACY, filter=Filter.TENT,
    intersector=Intersector.PALLAS,
)


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    scene, cam = cornell_box_scene(), smallpt_camera()
    base = prng.base_key(0)
    target = render_mean(scene, cam, CFG, prng.base_key(99))
    np.asarray(target)
    params, refl = split_scene(scene)

    img0, winners0, rays = record_forward(scene, cam, CFG, base)
    print(f"rays/step {float(rays):.0f}", flush=True)

    replay_jit = jax.jit(replay_mean, static_argnames=("config",))

    def replay_loss(p, key, winners):
        rimg = replay_mean(merge_scene(p, refl), cam, CFG, key, winners)
        return jnp.mean((rimg - target) ** 2)

    grad_jit = jax.jit(jax.grad(replay_loss))

    def t_record(key):
        img, w, r = record_forward(scene, cam, CFG, key)
        return float(img.sum()) + float(r)

    def t_replay(key):
        img = replay_jit(scene, cam, CFG, key, winners0)
        return float(img.sum())

    def t_grad(key):
        g = grad_jit(params, key, winners0)
        return float(jnp.asarray(g.albedo).sum())

    def t_step(key):
        loss, _, g = image_loss_and_grads(scene, cam, CFG, key, target)
        return float(loss) + float(jnp.asarray(g.albedo).sum())

    stages = [("record", t_record), ("replay", t_replay),
              ("grad", t_grad), ("step", t_step)]
    # compile + warm
    for name, fn in stages:
        t0 = time.perf_counter()
        fn(jax.random.fold_in(base, 999))
        print(f"compile+first {name}: {time.perf_counter() - t0:.1f}s",
              flush=True)
    best = {name: None for name, _ in stages}
    for r_ in range(5):
        for name, fn in stages:
            k = jax.random.fold_in(base, r_)
            t0 = time.perf_counter()
            fn(k)
            dt = time.perf_counter() - t0
            if best[name] is None or dt < best[name]:
                best[name] = dt
            print(f"round {r_} {name}: {dt * 1e3:.1f} ms", flush=True)
    print(json.dumps({k: round(v * 1e3, 1) for k, v in best.items()}),
          flush=True)


if __name__ == "__main__":
    main()
