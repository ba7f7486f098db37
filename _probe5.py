import os, time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_smallpt_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from smallpt_tpu.config import RenderConfig, Filter, CameraModel, Intersector
from smallpt_tpu.core.scene import procedural_sphere_scene
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.ops import accel as acc
from smallpt_tpu.ops import megakernel as mk
from smallpt_tpu.engine.binned import BinnedStreamingRenderer

print("LANE_B", mk._LANE_B, "K_NEAR", mk.K_NEAR, flush=True)
scene = procedural_sphere_scene(10_000)
cam = smallpt_camera()

def drain(W, H, MD, spp, sort_every, label):
    cfg = RenderConfig(width=W, height=H, spp_per_cell=1, max_depth=MD,
                       camera_model=CameraModel.LEGACY, filter=Filter.TENT)
    rr = BinnedStreamingRenderer(scene, cam, cfg, seed=0, sort_every=sort_every)
    t0 = time.perf_counter()
    rr.step(add_samples=spp, n_bounces=3)
    rr.flush()
    dt = time.perf_counter() - t0
    rate = rr.stats.rays / dt
    print(f"{label}: {rr.stats.rays} rays {dt:.2f}s = {rate/1e6:.2f} Mrays/s", flush=True)
    return rate, rr

t0=time.perf_counter()
_, r0 = drain(512, 384, 24, 1, 2, "warmup")
print(f"(compile+first {time.perf_counter()-t0:.0f}s)", flush=True)
# stop stats mid-flight
cfg = r0.config
f2, i2 = r0._bounce[1](r0.f, r0.i)
f2, i2 = mk.regen_binned(f2, i2, r0.cam_vec, cfg, r0.key)
lists, stops, dcut = acc.tile_work_lists(f2, i2, cfg, r0.accel)
st = np.asarray(stops)
print(f"stops: full(-1)={np.mean(st<0):.0%} mean={st[st>=0].mean() if (st>=0).any() else -1:.0f} k_near_frac={(st==mk.K_NEAR).mean():.0%}", flush=True)

best = 0
for trial in range(3):
    for se in (2, 4):
        rate, _ = drain(512, 384, 24, 4, se, f"t{trial} se={se} 512x384")
        best = max(best, rate)
print(f"BEST 512x384: {best/1e6:.2f} Mrays/s", flush=True)

# classic baseline same process for fairness
from smallpt_tpu.engine.renderer import render_with_stats
bcfg = RenderConfig(width=512, height=384, spp_per_cell=1, max_depth=24,
                    camera_model=CameraModel.LEGACY, filter=Filter.TENT,
                    intersector=Intersector.PALLAS)
import jax.random as jr
img, rays = render_with_stats(scene, cam, bcfg, jr.PRNGKey(0)); int(rays)
bb = 0
for t in range(3):
    t0 = time.perf_counter()
    img, rays = render_with_stats(scene, cam, bcfg, jr.fold_in(jr.PRNGKey(0), t))
    n = int(rays); bb = max(bb, n/(time.perf_counter()-t0))
print(f"baseline split-sweep 512x384: {bb/1e6:.2f} Mrays/s  => speedup {best/bb:.2f}x", flush=True)

# 1080p (config 5 resolution)
t0=time.perf_counter()
best2 = 0
for trial in range(2):
    rate, _ = drain(1920, 1080, 24, 2, 2, f"t{trial} 1920x1080")
    best2 = max(best2, rate)
print(f"BEST 1080p: {best2/1e6:.2f} Mrays/s", flush=True)
