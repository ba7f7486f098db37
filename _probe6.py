import os, time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_smallpt_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from smallpt_tpu.config import RenderConfig, Filter, CameraModel
from smallpt_tpu.core.scene import procedural_sphere_scene
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.ops import accel as acc
from smallpt_tpu.ops import megakernel as mk
from smallpt_tpu.engine.binned import BinnedStreamingRenderer

print("LANE_B", mk._LANE_B, flush=True)
cfg = RenderConfig(width=512, height=384, spp_per_cell=1, max_depth=24,
                   camera_model=CameraModel.LEGACY, filter=Filter.TENT)
scene = procedural_sphere_scene(10_000)
cam = smallpt_camera()
r = BinnedStreamingRenderer(scene, cam, cfg, seed=0, sort_every=2)
accel = r.accel

def stamp(label, fn):
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    print(f"{label}: {time.perf_counter()-t0:.0f}s", flush=True)
    return out

r.i = mk.set_binned_budget(r.i, 1, cfg)
f1, i1 = stamp("regen jit", lambda: mk.regen_binned(r.f, r.i, r.cam_vec, cfg, r.key))
lw = stamp("tile_work_lists jit", lambda: jax.jit(lambda f, i: acc.tile_work_lists(f, i, cfg, accel))(f1, i1))
lists, stops, dcut = lw
print("stops sample", np.asarray(stops)[:8], np.asarray(dcut)[:4], flush=True)
out = stamp("kernel jit", lambda: mk.stream_step_binned(r.table, cfg, r.key, f1, i1, lists, stops, dcut,
            n_glob_chunks=accel.n_glob_chunks, n_chunks=accel.n_chunks))
keys = stamp("keys", lambda: acc.state_bin_keys(out[0], out[1], accel))
sh = stamp("shuffle sort jit", lambda: acc.shuffle_state(out[0], out[1], keys))
print("ALL COMPILED", flush=True)
