import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_smallpt_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from smallpt_tpu.config import RenderConfig, Filter, CameraModel
from smallpt_tpu.core.scene import procedural_sphere_scene
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core import rng as prng
from smallpt_tpu.ops import accel as acc
from smallpt_tpu.ops import megakernel as mk

W, H, MD = 512, 384, 24
cfg = RenderConfig(width=W, height=H, spp_per_cell=1, max_depth=MD,
                   camera_model=CameraModel.LEGACY, filter=Filter.TENT)
scene = procedural_sphere_scene(10_000)
cam = smallpt_camera()
accel = acc.build_grid_accel(scene)
table = jnp.take(mk.build_scene_table(scene, cfg), accel.order, axis=0)
cam_vec = mk.build_camera_vec(cam, cfg)
key = prng.base_key(0)

f, i = mk.init_binned_state(cfg)
i = mk.set_binned_budget(i, 8, cfg)

def counts_stats(label, f, i):
    lists, counts = acc.tile_chunk_lists(f, i, cam_vec, cfg, accel)
    c = np.asarray(counts)
    ok = c[c >= 0]
    print(f"{label}: overflow={(c<0).mean():.2%} mean={ok.mean() if ok.size else -1:.0f} "
          f"p50={np.median(ok) if ok.size else -1:.0f} max={ok.max() if ok.size else -1}", flush=True)
    return lists, counts

def bounce(f, i, lists, counts):
    return mk.stream_step_binned(table, cam_vec, cfg, key, f, i, lists, counts,
                                 n_glob_chunks=accel.n_glob_chunks, n_chunks=accel.n_chunks)

def shuffle(f, i):
    keys = acc.state_bin_keys(f, i, accel)
    return acc.shuffle_state(f, i, keys)

# bounce 0: all regen
lists, counts = counts_stats("bounce0 (regen only)", f, i)
f, i, r = bounce(f, i, lists, counts); int(r)
for b in range(1, 6):
    f, i = shuffle(f, i)
    lists, counts = counts_stats(f"bounce{b} (sorted)", f, i)
    f, i, r = bounce(f, i, lists, counts); int(r)

# timing: single launch with current lists, warm
def timed(fn, label, n=5):
    fn()
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter(); fn(); best = min(best, time.perf_counter()-t0)
    print(f"{label}: {best*1e3:.1f} ms", flush=True)

lists, counts = acc.tile_chunk_lists(f, i, cam_vec, cfg, accel)
timed(lambda: int(bounce(f, i, lists, counts)[2]), "binned bounce (culled lists)")
full_counts = jnp.full_like(counts, -1)
timed(lambda: int(bounce(f, i, lists, full_counts)[2]), "binned bounce (FULL sweep)")
empty_counts = jnp.zeros_like(counts)
timed(lambda: int(bounce(f, i, lists, empty_counts)[2]), "binned bounce (globals only)")
timed(lambda: np.asarray(acc.tile_chunk_lists(f, i, cam_vec, cfg, accel)[1]).sum(), "tile_chunk_lists alone")
timed(lambda: jax.block_until_ready(shuffle(f, i)) and None or int(jnp.sum(shuffle(f,i)[1][0])), "shuffle (sort)")

# classic kernel single-bounce on same scene for reference
fc, ic = mk.init_stream_state(cfg)
ic = mk.set_sample_budget(ic, 8, cfg)
fc, ic, r = mk.stream_step(scene, cam, cfg, key, fc, ic, 8, 4); int(r)
timed(lambda: int(mk.stream_step(scene, cam, cfg, key, fc, ic, None, 1)[2]), "classic stream_step n_iters=1")
