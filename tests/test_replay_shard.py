"""Sharded recorded-winner-replay training step (parallel/replay_shard.py).

Gates: mesh-layout parity against the single-chip replay differentiator
(global sample keying makes the recorded winners placement-invariant up to
XLA's per-shape f32 codegen — the test_sharding.py flip budget), gradient
agreement, and the eligibility guards."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smallpt_tpu.config import (CameraModel, Filter, Intersector,
                                RenderConfig)
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core.scene import cornell_box_scene
from smallpt_tpu.grad.diff import image_loss_and_grads, render_mean
from smallpt_tpu.parallel.replay_shard import image_loss_and_grads_sharded
from smallpt_tpu.parallel.shard import make_mesh

CFG = RenderConfig(
    width=12, height=8, spp_per_cell=1, max_depth=4,
    camera_model=CameraModel.LEGACY, filter=Filter.TENT,
    intersector=Intersector.PALLAS,
)


@pytest.fixture(autouse=True, scope="module")
def _no_persistent_cache():
    """Work around a deterministic `Fatal Python error: Aborted` inside
    jax's compilation_cache.put_executable_and_time when this module's
    sharded shard_map+interpret-pallas executables are serialized DURING A
    FULL-SUITE RUN (r5f session, twice at the same spot; the same test
    passes standalone with a fresh cache). The persistent cache only
    speeds test reruns — skip it for this module rather than crash the
    suite on an XLA serialization abort.

    Disabling enable_compilation_cache alone did NOT stop the write (the
    initialized cache object latches; the second full-suite run aborted at
    the same line) — the min-compile-time threshold is read per write and
    does."""
    old_en = jax.config.jax_enable_compilation_cache
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_enable_compilation_cache", False)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    yield
    jax.config.update("jax_enable_compilation_cache", old_en)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old_min)


@pytest.fixture(scope="module")
def setup():
    scene = cornell_box_scene()
    cam = smallpt_camera()
    key = prng.base_key(0)
    target = render_mean(scene, cam, CFG, prng.base_key(99))
    return scene, cam, key, target


@pytest.mark.parametrize("n_tile,n_sample", [(4, 1), (2, 2), (1, 4), (8, 1)])
def test_sharded_replay_matches_single(setup, n_tile, n_sample):
    scene, cam, key, target = setup
    n_dev = n_tile * n_sample
    mesh = make_mesh(n_tile, n_sample, devices=jax.devices("cpu")[:n_dev])
    loss_m, img_m, g_m = image_loss_and_grads_sharded(
        scene, cam, CFG, key, target, mesh
    )
    loss_1, img_1, g_1 = image_loss_and_grads(scene, cam, CFG, key, target)
    assert abs(float(loss_m) - float(loss_1)) < 0.03 * (float(loss_1) + 1e-3)
    rel = np.abs(np.asarray(img_m) - np.asarray(img_1)) / (
        1.0 + np.abs(np.asarray(img_1))
    )
    assert (rel > 1e-3).mean() <= 0.02, (rel > 1e-3).mean()
    for name in ("albedo", "emission", "center", "radius"):
        a = np.asarray(getattr(g_1, name))
        b = np.asarray(getattr(g_m, name))
        scale = np.abs(a).max() + 1e-12
        ok = np.isclose(a, b, rtol=3e-2, atol=3e-2 * scale)
        assert ok.all(), (name, a, b)


def test_sharded_replay_guards(setup):
    scene, cam, key, target = setup
    mesh = make_mesh(2, 2, devices=jax.devices("cpu")[:4])
    with pytest.raises(ValueError, match="not replay-eligible"):
        image_loss_and_grads_sharded(
            scene, cam, CFG.replace(diff_replay=False), key, target, mesh
        )
    with pytest.raises(ValueError, match="not divisible"):
        image_loss_and_grads_sharded(
            scene, cam, CFG.replace(height=6), key,
            jnp.zeros((6, 12, 3)), make_mesh(4, 1,
                                             devices=jax.devices("cpu")[:4])
        )


def test_sharded_replay_trains(setup):
    """One projected-SGD step through the sharded replay moves parameters
    toward the target (the dryrun_multichip training-step contract)."""
    from smallpt_tpu.grad.diff import merge_scene, project_params, split_scene

    scene, cam, key, target = setup
    mesh = make_mesh(2, 2, devices=jax.devices("cpu")[:4])
    loss0, _, grads = image_loss_and_grads_sharded(
        scene, cam, CFG, key, target, mesh
    )
    params, refl = split_scene(scene)
    new_params = jax.tree.map(lambda p, g: p - 0.05 * g, params, grads)
    s2 = merge_scene(project_params(new_params), refl)
    loss1, _, _ = image_loss_and_grads_sharded(
        s2, cam, CFG, key, target, mesh
    )
    assert np.isfinite(float(loss1))
    moved = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(new_params))
    )
    assert moved > 0.0
