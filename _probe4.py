import os, time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_smallpt_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from smallpt_tpu.config import RenderConfig, Filter, CameraModel
from smallpt_tpu.core.scene import procedural_sphere_scene
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.ops import accel as acc
from smallpt_tpu.ops import megakernel as mk
from smallpt_tpu.engine.binned import BinnedStreamingRenderer

print("LANE_B =", mk._LANE_B, "no_alias =", bool(os.environ.get("SMALLPT_TPU_BINNED_NO_ALIAS")), flush=True)
W, H, MD = 512, 384, 24
cfg = RenderConfig(width=W, height=H, spp_per_cell=1, max_depth=MD,
                   camera_model=CameraModel.LEGACY, filter=Filter.TENT)
scene = procedural_sphere_scene(10_000)
cam = smallpt_camera()
r = BinnedStreamingRenderer(scene, cam, cfg, seed=0, sort_every=0)
accel = r.accel
r.step(add_samples=8, n_bounces=3)
_, shuffle = r._bounce
f2, i2 = shuffle(r.f, r.i)
f2, i2 = mk.regen_binned(f2, i2, r.cam_vec, cfg, r.key)
lists, counts = acc.tile_chunk_lists(f2, i2, cfg, accel)
c = np.asarray(counts); ok = c[c>=0]
print(f"counts: ovf={(c<0).mean():.0%} mean={ok.mean() if ok.size else -1:.0f}", flush=True)

def timed(fn, label, n=6):
    fn(); best = 1e9
    for _ in range(n):
        t0 = time.perf_counter(); fn(); best = min(best, time.perf_counter()-t0)
    print(f"{label}: {best*1e3:.1f} ms", flush=True)

timed(lambda: int(mk.stream_step_binned(r.table, cfg, r.key, f2, i2, lists, jnp.zeros_like(counts),
      n_glob_chunks=accel.n_glob_chunks, n_chunks=accel.n_chunks)[2]), "globals-only")
timed(lambda: int(mk.stream_step_binned(r.table, cfg, r.key, f2, i2, lists, counts,
      n_glob_chunks=accel.n_glob_chunks, n_chunks=accel.n_chunks)[2]), "culled")
timed(lambda: int(mk.stream_step_binned(r.table, cfg, r.key, f2, i2, lists, jnp.full_like(counts, -1),
      n_glob_chunks=accel.n_glob_chunks, n_chunks=accel.n_chunks)[2]), "FULL")
