"""DDA streaming megakernel vs classic streaming — estimator parity.

The DDA variant (ops/stream_dda.py) mirrors the classic streaming
kernel's regen and shade blocks and keys identical sample streams
(v2: pixel + unbounded ip), so a fully-drained render must produce the
same per-pixel sums up to f32 op-ordering noise on razor-edge paths —
the same floor as mega-vs-JAX parity (ops/megakernel.py docstring).
Completed-sample WEIGHTS must be exactly equal (same budgets, same
regen decisions).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from smallpt_tpu.config import RenderConfig, CameraModel, Filter
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core.scene import procedural_sphere_scene
from smallpt_tpu.ops.megakernel import (
    init_stream_state, stream_image, stream_pending, stream_step,
)
from smallpt_tpu.ops.stream_dda import (
    build_stream_dda_tables, init_stream_dda_state, stream_step_dda,
)


def _drain(step_fn, init, config, budget, iters_per_step, max_steps=60):
    f, i = init
    rays = 0
    for _ in range(max_steps):
        f, i, r = step_fn(f, i, budget)
        rays += int(r)
        alive, can = stream_pending(i)
        if alive == 0 and can == 0:
            break
    assert alive == 0 and can == 0, "stream failed to drain"
    return f, i, rays


@pytest.fixture(scope="module")
def setup():
    config = RenderConfig(
        width=64, height=48, spp_per_cell=1,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
        max_depth=6,
    )
    scene = procedural_sphere_scene(300)
    camera = smallpt_camera()
    key = prng.base_key(0)
    return config, scene, camera, key


def test_image_parity_vs_classic_streaming(setup):
    config, scene, camera, key = setup
    budget = 3

    f0, i0 = init_stream_state(config)
    fc, ic, rays_c = _drain(
        lambda f, i, b: stream_step(scene, camera, config, key, f, i, b, 64),
        (f0, i0), config, budget, 64,
    )
    rad_c, w_c = stream_image(fc, ic, config)

    tables = build_stream_dda_tables(scene, config, occ_target=16.0)
    fd, id_, rays_d = _drain(
        lambda f, i, b: stream_step_dda(
            scene, camera, config, key, f, i, b, 320, tables),
        (init_stream_dda_state(config)), config, budget, 320,
    )
    rad_d, w_d = stream_image(fd, id_, config)

    w_c, w_d = np.asarray(w_c), np.asarray(w_d)
    rad_c, rad_d = np.asarray(rad_c), np.asarray(rad_d)
    # identical regen decisions -> identical completed-sample counts
    np.testing.assert_array_equal(w_c, w_d)
    assert (w_c >= budget - 1).all()
    # identical sample streams + identical transport arithmetic (modulo
    # FMA contraction): images agree tightly; razor-edge paths would show
    # as isolated pixels, none expected at these seeds
    np.testing.assert_allclose(rad_d, rad_c, rtol=2e-4, atol=2e-3)
    # both count one ray per bounce
    assert rays_d == rays_c


def test_rays_counted_per_bounce(setup):
    config, scene, camera, key = setup
    tables = build_stream_dda_tables(scene, config, occ_target=16.0)
    f, i = init_stream_dda_state(config)
    f, i, rays = stream_step_dda(
        scene, camera, config, key, f, i, 1, 40, tables)
    # with budget 1 every lane launches exactly one camera ray first; the
    # count must be >= one per pixel lane and bounded by depth * lanes
    g = config.width * config.height
    assert int(rays) >= g
    assert int(rays) <= g * config.max_depth


def test_overflow_and_grid_stats(setup):
    config, scene, camera, key = setup
    t_fine = build_stream_dda_tables(scene, config, occ_target=16.0)
    assert t_fine.k % 8 == 0
    assert t_fine.cells3.shape == (3, 12 * t_fine.k, t_fine.n_cells)
    # force overflow; the render must still drain and match weights
    t_ovf = build_stream_dda_tables(scene, config, nb=(2, 2, 2), k_max=32)
    assert t_ovf.n_overflow > 0
    f, i, _ = _drain(
        lambda f, i, b: stream_step_dda(
            scene, camera, config, key, f, i, b, 320, t_ovf),
        (init_stream_dda_state(config)), config, 2, 320,
    )
    rad, w = stream_image(f, i, config)
    assert np.isfinite(np.asarray(rad)).all()
    assert (np.asarray(w) >= 1).all()


def test_nee_parity_vs_classic_streaming(setup):
    """Single-slot NEE via the shadow GRID WALK matches the classic
    streaming kernel's fused shadow sweep: same cone uniforms, same lit
    rule, same suppression bits — drained images agree to FMA noise and
    completed-sample weights exactly. (Light id 8 = the ceiling light in
    the procedural scene's Cornell base.)"""
    import dataclasses

    config, scene, camera, key = setup
    cfg = dataclasses.replace(config, nee_lights=(8,))
    budget = 3

    f0, i0 = init_stream_state(cfg)
    fc, ic, rays_c = _drain(
        lambda f, i, b: stream_step(scene, camera, cfg, key, f, i, b, 64),
        (f0, i0), cfg, budget, 64,
    )
    rad_c, w_c = stream_image(fc, ic, cfg)

    tables = build_stream_dda_tables(scene, cfg, occ_target=16.0)
    assert len(tables.light_rows) == 1
    fd, id_, rays_d = _drain(
        lambda f, i, b: stream_step_dda(
            scene, camera, cfg, key, f, i, b, 480, tables),
        (init_stream_dda_state(cfg)), cfg, budget, 480,
    )
    rad_d, w_d = stream_image(fd, id_, cfg)

    np.testing.assert_array_equal(np.asarray(w_c), np.asarray(w_d))
    assert rays_d == rays_c  # shadow walks are part of the bounce
    # shadow rays graze occluder silhouettes by construction (the cone
    # samples the light's visible edge), so FMA-noise det flips turn a
    # whole direct-light quantum on/off for isolated samples — gate
    # binomially (measured 0-2 flipped pixels / 3072 across seeds), and
    # everything else tightly
    rc_, rd_ = np.asarray(rad_c), np.asarray(rad_d)
    diff = np.abs(rd_ - rc_).max(axis=-1)
    flipped = diff > 2e-3
    assert flipped.mean() < 3e-3, f"{flipped.sum()} flipped pixels"
    np.testing.assert_allclose(rd_[~flipped], rc_[~flipped],
                               rtol=2e-4, atol=2e-3)


def test_nee_multi_light_rejected(setup):
    config, scene, camera, key = setup
    import dataclasses
    cfg = dataclasses.replace(config, nee_lights=(0, 8))
    tables = build_stream_dda_tables(scene, cfg)
    f, i = init_stream_dda_state(cfg)
    with pytest.raises(ValueError, match="ONE NEE light"):
        stream_step_dda(scene, camera, cfg, key, f, i, 1, 8, tables)


def test_engine_auto_routing_and_checkpoint(tmp_path, setup):
    """StreamingRenderer auto-routes big scenes to the DDA kernel, matches
    the classic engine on a drained render, and checkpoints round-trip in
    DDA mode (mode mismatch on load is refused)."""
    import dataclasses

    from smallpt_tpu.core.scene import procedural_sphere_scene
    from smallpt_tpu.engine.streaming import StreamingRenderer

    config, _, camera, _ = setup
    big = procedural_sphere_scene(2100)  # > MEGA_MAX_SPHERES
    r_dda = StreamingRenderer(big, camera, config, seed=3)
    assert r_dda._dda is not None, "big scene should auto-route to DDA"
    r_cls = StreamingRenderer(big, camera, config, seed=3, dda=False)
    assert r_cls._dda is None
    for r in (r_dda, r_cls):
        r.step(n_iters=config.max_depth * 3, add_samples=2)
        r.flush()
    rad_a, w_a = r_dda.accumulators()
    rad_b, w_b = r_cls.accumulators()
    np.testing.assert_array_equal(np.asarray(w_a), np.asarray(w_b))
    np.testing.assert_allclose(
        np.asarray(rad_a), np.asarray(rad_b), rtol=2e-4, atol=2e-3)

    ck = str(tmp_path / "dda_ck.npz")
    r_dda.save_checkpoint(ck)
    r2 = StreamingRenderer(big, camera, config, seed=3)
    r2.load_checkpoint(ck)
    rad_c, w_c = r2.accumulators()
    np.testing.assert_array_equal(np.asarray(rad_a), np.asarray(rad_c))
    with pytest.raises(ValueError, match="traversal mode"):
        StreamingRenderer(big, camera, config, seed=3,
                          dda=False).load_checkpoint(ck)

    # single-light NEE routes to DDA (shadow walk); multi-light stays
    # classic (one shadow-walk slot)
    r_nee1 = StreamingRenderer(
        big, camera, dataclasses.replace(config, nee_lights=(8,)), seed=3)
    assert r_nee1._dda is not None
    r_nee2 = StreamingRenderer(
        big, camera, dataclasses.replace(config, nee_lights=(0, 8)), seed=3)
    assert r_nee2._dda is None


def test_adaptive_sampling_on_dda_engine(setup):
    """Variance-adaptive stepping through the DDA engine: the budget plane
    (_I_BUDGET) and moment planes (_F_M1/_F_M2) share indices with the
    classic layout, so step_adaptive/stream_variance must work unchanged —
    noisy pixels get more samples, weights normalize per pixel, and the
    drain is exact over the heterogeneous budgets."""
    from smallpt_tpu.engine.streaming import StreamingRenderer

    config, scene, camera, _ = setup
    r = StreamingRenderer(scene, camera, config, seed=4, dda=True)
    assert r._dda is not None
    r.step(n_iters=32, add_samples=4)   # seed moments
    r.step_adaptive(n_iters=48, add_samples_total=2 * config.n_pixels)
    r.flush()
    _, w = r.accumulators()
    w = np.asarray(w)
    budgets = np.asarray(r._budgets).reshape(config.height, config.width)
    # exact drain: completed == budget everywhere
    np.testing.assert_array_equal(w, budgets)
    # the pool was spent and allocation is heterogeneous
    assert int(budgets.sum()) == 6 * config.n_pixels
    assert budgets.max() > budgets.min()
