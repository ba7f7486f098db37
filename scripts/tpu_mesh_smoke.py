"""One-shot TPU smoke of the culled mesh kernel: first Mosaic compile of
_mesh_culled_kernel + bit-exactness vs the brute mesh kernel on real
hardware. Runs in ~1 min from a warm cache; a Mosaic lowering failure
here fails fast instead of burning the bench stage's timeout."""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_smallpt_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from smallpt_tpu.core.scene import procedural_mesh_scene
from smallpt_tpu.ops.mesh_accel import build_mesh_grid_accel
from smallpt_tpu.ops.mesh_pallas import (
    intersect_mesh_culled, intersect_mesh_pallas,
)

print("devices", jax.devices())
scene = procedural_mesh_scene(n_balls=60, seed=3)
accel = build_mesh_grid_accel(scene)
rng = np.random.default_rng(5)
org = rng.uniform([5, 5, 25], [95, 75, 150], (4096, 3)).astype(np.float32)
d = rng.normal(size=(4096, 3))
d /= np.linalg.norm(d, axis=1, keepdims=True)
org, d = jnp.asarray(org), jnp.asarray(d, jnp.float32)

t0 = time.perf_counter()
a = intersect_mesh_pallas(org, d, scene)
ta = np.asarray(a.t)
print(f"brute compile+run {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
b = intersect_mesh_culled(org, d, scene, accel)
tb = np.asarray(b.t)
print(f"culled compile+run {time.perf_counter()-t0:.1f}s")
np.testing.assert_array_equal(ta, tb)
hit = np.isfinite(ta)
np.testing.assert_array_equal(np.asarray(a.prim)[hit], np.asarray(b.prim)[hit])
print(f"MESH SMOKE OK: {hit.mean():.3f} hit fraction, bit-exact")
