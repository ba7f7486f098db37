import os, time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_smallpt_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from smallpt_tpu.config import RenderConfig, Filter, CameraModel
from smallpt_tpu.core.scene import procedural_sphere_scene
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.ops import accel as acc
from smallpt_tpu.ops import megakernel as mk
from smallpt_tpu.engine.binned import BinnedStreamingRenderer

print("LANE_B =", mk._LANE_B, flush=True)
W, H, MD = 512, 384, 24
cfg = RenderConfig(width=W, height=H, spp_per_cell=1, max_depth=MD,
                   camera_model=CameraModel.LEGACY, filter=Filter.TENT)
scene = procedural_sphere_scene(10_000)
cam = smallpt_camera()

r = BinnedStreamingRenderer(scene, cam, cfg, seed=0, sort_every=1)
accel = r.accel
t0 = time.perf_counter()
r.step(add_samples=1, n_bounces=1)
print(f"compile+first {time.perf_counter()-t0:.0f}s", flush=True)
for b in range(6):
    f2, i2 = mk.regen_binned(r.f, r.i, r.cam_vec, cfg, r.key)
    lists, counts = acc.tile_chunk_lists(f2, i2, cfg, accel)
    c = np.asarray(counts); ok = c[c>=0]
    print(f"bounce{b+1}: ovf={(c<0).mean():.0%} mean={ok.mean() if ok.size else -1:.0f} p90={np.percentile(ok,90) if ok.size else -1:.0f} max={ok.max() if ok.size else -1}", flush=True)
    r._advance(1)
r.flush()

def drain():
    rr = BinnedStreamingRenderer(scene, cam, cfg, seed=0, sort_every=2,
                                 accel=accel)
    t0 = time.perf_counter()
    rr.step(add_samples=4, n_bounces=2); rr.flush()
    return rr.stats.rays/(time.perf_counter()-t0)
drain()
best = max(drain() for _ in range(3))
print(f"drain spp=4 sort2: {best/1e6:.2f} Mrays/s", flush=True)

# per-launch with mid-flight state
rr = BinnedStreamingRenderer(scene, cam, cfg, seed=0, sort_every=0, accel=accel)
rr.step(add_samples=8, n_bounces=3)
_, shuffle = rr._bounce
f2, i2 = shuffle(rr.f, rr.i)
f2, i2 = mk.regen_binned(f2, i2, rr.cam_vec, cfg, rr.key)
lists, counts = acc.tile_chunk_lists(f2, i2, cfg, accel)
c = np.asarray(counts); ok=c[c>=0]
print(f"midflight: ovf={(c<0).mean():.0%} mean={ok.mean() if ok.size else -1:.0f} p90={np.percentile(ok,90) if ok.size else -1:.0f}", flush=True)

def timed(fn, label, n=6):
    fn()
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter(); fn(); best = min(best, time.perf_counter()-t0)
    print(f"{label}: {best*1e3:.1f} ms", flush=True)

timed(lambda: int(mk.stream_step_binned(rr.table, cfg, rr.key, f2, i2, lists, counts,
      n_glob_chunks=accel.n_glob_chunks, n_chunks=accel.n_chunks)[2]), "launch culled")
timed(lambda: int(mk.stream_step_binned(rr.table, cfg, rr.key, f2, i2, lists, jnp.zeros_like(counts),
      n_glob_chunks=accel.n_glob_chunks, n_chunks=accel.n_chunks)[2]), "launch globals-only")
timed(lambda: int(mk.stream_step_binned(rr.table, cfg, rr.key, f2, i2, lists, jnp.full_like(counts,-1),
      n_glob_chunks=accel.n_glob_chunks, n_chunks=accel.n_chunks)[2]), "launch FULL")
def sh():
    a, b = shuffle(f2, i2); float(a[0,0]); float(b[0,0])
timed(sh, "shuffle")
