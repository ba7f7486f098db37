import time, sys, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_smallpt_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from smallpt_tpu.config import RenderConfig, Filter, CameraModel, Intersector
from smallpt_tpu.core.scene import procedural_sphere_scene
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.engine.binned import BinnedStreamingRenderer
from smallpt_tpu.ops import accel as acc

W, H, MD = 512, 384, 24
cfg = RenderConfig(width=W, height=H, spp_per_cell=1, max_depth=MD,
                   camera_model=CameraModel.LEGACY, filter=Filter.TENT)
scene = procedural_sphere_scene(10_000)
cam = smallpt_camera()

def run_binned(sort_every, spp, accel=None, label=""):
    r = BinnedStreamingRenderer(scene, cam, cfg, seed=0, sort_every=sort_every, accel=accel)
    t0 = time.perf_counter()
    r.step(add_samples=spp, n_bounces=2)
    r.flush()
    dt = time.perf_counter() - t0
    rays = r.stats.rays
    print(f"{label} sort_every={sort_every} spp={spp}: {rays} rays in {dt:.3f}s = {rays/dt/1e6:.2f} Mrays/s", flush=True)
    return rays / dt, r

# compile + warm
print("compiling binned...", flush=True)
t0=time.perf_counter()
rate, r0 = run_binned(2, 1, label="warmup")
print(f"(first run incl. compile {time.perf_counter()-t0:.0f}s)", flush=True)
# check culling stats
accel = r0.accel
lists, counts = acc.tile_chunk_lists(r0.f, r0.i, r0.cam_vec, cfg, accel)
c = np.asarray(counts)
print(f"counts after drain: mean={c[c>=0].mean():.0f} max={c.max()} overflow={(c<0).mean():.2%} n_chunks={accel.n_chunks}", flush=True)

best = {}
for trial in range(3):
    for se in (1, 2, 4, 0):
        rate, _ = run_binned(se, 4, label=f"t{trial}")
        best[se] = max(best.get(se, 0), rate)
print("BEST binned:", {k: f"{v/1e6:.2f}M" for k,v in best.items()}, flush=True)

# baseline: per-pass REGEN split-sweep (bench.py --procedural config)
from smallpt_tpu.engine.renderer import render_with_stats
bcfg = cfg.replace(intersector=Intersector.PALLAS)
base = jax.random.PRNGKey(0)
print("compiling baseline...", flush=True)
img, rays = render_with_stats(scene, cam, bcfg, base); int(rays)
bb = 0
for trial in range(3):
    t0 = time.perf_counter()
    img, rays = render_with_stats(scene, cam, bcfg, jax.random.fold_in(base, trial))
    n = int(rays); dt = time.perf_counter()-t0
    bb = max(bb, n/dt)
    print(f"baseline t{trial}: {n/dt/1e6:.2f} Mrays/s", flush=True)
print(f"SUMMARY: baseline={bb/1e6:.2f}M binned_best={max(best.values())/1e6:.2f}M speedup={max(best.values())/bb:.1f}x", flush=True)
