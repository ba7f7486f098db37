"""Environment light: escaped rays pick up constant radiance.

The reference leaves exactly this hook in its shading kernel —
``if (!hit) continue; // Here we could accumulate path.weight * envContrib``
(smallpt.cpp:168) — but never implements it. These tests pin the
implementation across every scheduler (FLAT, REGEN, MEGA, classic
streaming, binned streaming) against each other and the f64 oracle.

The strongest gate is exactness: a scene whose every camera ray escapes at
the first bounce must produce a bit-exact constant image equal to
env_emission (weight is exactly 1.0 on primary rays), on EVERY path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from smallpt_tpu.config import (
    RenderConfig, Mode, Filter, CameraModel, Scheduler,
)
from smallpt_tpu.core.scene import (
    SphereScene, Material, two_sphere_scene,
)
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core import rng as prng
from smallpt_tpu.engine.renderer import render
from smallpt_tpu.oracle.numpy_oracle import Oracle, PrecomputedUniformProvider

ENV = (0.3, 0.55, 0.9)


def _all_miss_scene():
    """One sphere far behind the camera: every camera ray escapes."""
    return SphereScene(
        center=jnp.asarray([[50.0, 40.0, 5000.0]], jnp.float32),
        radius=jnp.asarray([1.0], jnp.float32),
        material=Material(
            emission=jnp.zeros((1, 3), jnp.float32),
            albedo=jnp.full((1, 3), 0.5, jnp.float32),
            refl=jnp.zeros((1,), jnp.int32),
        ),
    )


def _open_scene(n=40, light=True):
    """The open-scene fixture from test_binned: an elevated light sphere
    (global, radius 60 — keeps the grid accel buildable) over floating
    diffuse spheres; most paths escape within a few bounces."""
    rng = np.random.default_rng(0)
    centers = np.concatenate(
        [[[50.0, 500.0, 81.6]],
         rng.uniform([30, 20, 40], [70, 60, 120], (n, 3))]
    )
    radii = np.concatenate([[60.0], rng.uniform(0.5, 1.5, n)])
    emission = np.zeros((n + 1, 3))
    if light:
        emission[0] = (8, 8, 8)
    albedo = np.full((n + 1, 3), 0.6)
    albedo[0] = 0
    refl = np.zeros(n + 1, np.int32)
    return SphereScene(
        center=jnp.asarray(centers, jnp.float32),
        radius=jnp.asarray(radii, jnp.float32),
        material=Material(jnp.asarray(emission, jnp.float32),
                          jnp.asarray(albedo, jnp.float32),
                          jnp.asarray(refl)),
    )


BASE = RenderConfig(width=12, height=10, spp_per_cell=1, max_depth=8,
                    camera_model=CameraModel.LEGACY, filter=Filter.TENT,
                    env_emission=ENV)


@pytest.mark.parametrize("scheduler", [Scheduler.FLAT, Scheduler.REGEN,
                                       Scheduler.MEGA])
def test_all_miss_scene_is_exactly_env(scheduler):
    """Primary-ray misses carry weight exactly 1.0, so the per-pass image
    (summed radiance) must be bit-equal to spp * env on every pixel."""
    cfg = BASE.replace(scheduler=scheduler)
    img = np.asarray(render(_all_miss_scene(), smallpt_camera(), cfg,
                            prng.base_key(0)))
    expect = cfg.spp * np.asarray(ENV, np.float32)
    assert (img == expect[None, None, :]).all()


def test_all_miss_streaming_and_binned_exact():
    from smallpt_tpu.engine.streaming import StreamingRenderer
    from smallpt_tpu.engine.binned import BinnedStreamingRenderer

    cfg = BASE
    cam = smallpt_camera()
    r = StreamingRenderer(_all_miss_scene(), cam, cfg, seed=0)
    r.step(n_iters=4 * cfg.max_depth, add_samples=3)
    r.flush()
    rad, w = r.accumulators()
    assert (np.asarray(w) == 3).all()
    expect = 3 * np.asarray(ENV, np.float32)
    assert (np.asarray(rad) == expect[None, None, :]).all()

    # binned needs a global+local split: use the open scene, whose light
    # sits far above — camera rays from smallpt's frustum still escape
    # except where spheres intervene, so test summed-weights exactness and
    # strict pixel floor instead
    scene = _open_scene()
    rb = BinnedStreamingRenderer(scene, cam, cfg, seed=0)
    rb.step(add_samples=2, n_bounces=4)
    rb.flush()
    rad_b, w_b = rb.accumulators()
    assert (np.asarray(w_b) == 2).all()
    img = np.asarray(rad_b) / 2.0
    # every pixel sees env radiance through SOME path mass: strictly > 0
    assert (img > 0).all()


def test_env_oracle_parity_two_sphere_scene():
    """The reference's active scene (smallpt.cpp:31-34) is open — with env
    on, escaped paths dominate the image; parity vs the f64 oracle."""
    cfg = RenderConfig(
        width=12, height=12, spp_per_cell=1, max_depth=10,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
        env_emission=ENV,
    )
    scene = two_sphere_scene()
    cam = smallpt_camera()
    key = prng.base_key(1)
    img = np.asarray(render(scene, cam, cfg, key))
    oracle = Oracle(scene, cam, cfg,
                    PrecomputedUniformProvider(key, cfg.n_pixels * cfg.spp))
    oimg = oracle.render()
    rel = np.abs(img - oimg) / (1.0 + np.abs(oimg))
    assert (rel > 0.1).mean() <= 0.02
    assert abs(img.mean() - oimg.mean()) < 0.05 * (abs(oimg.mean()) + 0.1)


def test_env_binned_culled_equals_full_sweep():
    """The binned path's load-bearing invariance must hold with env on:
    grid-culled sweep == forced full sweep, bit-exact."""
    from smallpt_tpu.engine.binned import BinnedStreamingRenderer
    from smallpt_tpu.ops import accel as acc

    scene = _open_scene()
    cfg = BASE.replace(width=16, height=12, max_depth=6)
    cam = smallpt_camera()

    def run(accel=None):
        r = BinnedStreamingRenderer(scene, cam, cfg, seed=0, accel=accel)
        r.step(add_samples=2, n_bounces=4)
        r.flush()
        rad, w = r.accumulators()
        return np.asarray(rad), np.asarray(w)

    a, wa = run()
    # l_max=2 overflows every tile list -> full-sweep fallback
    b, wb = run(acc.build_grid_accel(scene, l_max=2))
    assert (wa == wb).all()
    assert (a == b).all()
    assert a.sum() > 0


def test_env_binned_matches_classic_streaming():
    """Env pickup must agree between the classic streaming kernel and the
    binned kernel (same streams; razor-flip-floor statistical gate)."""
    from smallpt_tpu.engine.streaming import StreamingRenderer
    from smallpt_tpu.engine.binned import BinnedStreamingRenderer

    scene = _open_scene()
    cfg = BASE.replace(width=16, height=12, max_depth=6)
    cam = smallpt_camera()

    rc = StreamingRenderer(scene, cam, cfg, seed=0)
    rc.step(n_iters=4 * cfg.max_depth, add_samples=8)
    rc.flush()
    rad_c, w_c = rc.accumulators()

    rb = BinnedStreamingRenderer(scene, cam, cfg, seed=0)
    rb.step(add_samples=8, n_bounces=4)
    rb.flush()
    rad_b, w_b = rb.accumulators()

    assert (np.asarray(w_b) == np.asarray(w_c)).all()
    img_c = np.asarray(rad_c) / np.maximum(np.asarray(w_c)[..., None], 1)
    img_b = np.asarray(rad_b) / np.maximum(np.asarray(w_b)[..., None], 1)
    close = np.isclose(img_b, img_c, rtol=0.05, atol=0.02)
    assert close.mean() > 0.97, close.mean()
    assert abs(img_b.mean() - img_c.mean()) < 0.01 * (img_c.mean() + 0.05)


def test_env_off_images_unchanged():
    """env_emission=(0,0,0) must trace to the identical program: compare
    against an explicitly-constructed default config."""
    cfg_def = RenderConfig(width=10, height=8, spp_per_cell=1, max_depth=6,
                           camera_model=CameraModel.LEGACY,
                           filter=Filter.TENT)
    cfg_env0 = cfg_def.replace(env_emission=(0.0, 0.0, 0.0))
    assert cfg_def == cfg_env0 and hash(cfg_def) == hash(cfg_env0)
    scene = two_sphere_scene()
    cam = smallpt_camera()
    a = np.asarray(render(scene, cam, cfg_def, prng.base_key(2)))
    b = np.asarray(render(scene, cam, cfg_env0, prng.base_key(2)))
    assert (a == b).all()


def test_env_ignored_by_aov_modes():
    """AOV debug modes skip misses exactly like the reference's `continue`
    (smallpt.cpp:168,180-183): env must not leak into them."""
    scene = two_sphere_scene()
    cam = smallpt_camera()
    for mode in (Mode.NORMAL, Mode.UV, Mode.EMISSION):
        cfg_on = BASE.replace(mode=mode, scheduler=Scheduler.FLAT)
        cfg_off = cfg_on.replace(env_emission=(0.0, 0.0, 0.0))
        a = np.asarray(render(scene, cam, cfg_on, prng.base_key(3)))
        b = np.asarray(render(scene, cam, cfg_off, prng.base_key(3)))
        assert (a == b).all(), mode


def test_env_mesh_scene_oracle_parity():
    """Mesh transport shares bounce_step: env on a single-triangle scene
    (the reference's actual main() scene, smallpt.cpp:818-838) — almost
    every path escapes past the triangle."""
    from smallpt_tpu.core.scene import single_triangle_scene
    from smallpt_tpu.core.camera import default_matrix_camera

    cfg = RenderConfig(
        width=10, height=10, spp_per_cell=1, max_depth=6,
        camera_model=CameraModel.MATRIX, filter=Filter.BOX,
        env_emission=ENV, scheduler=Scheduler.FLAT,
    )
    scene = single_triangle_scene()
    cam = default_matrix_camera()
    key = prng.base_key(4)
    img = np.asarray(render(scene, cam, cfg, key))
    oracle = Oracle(scene, cam, cfg,
                    PrecomputedUniformProvider(key, cfg.n_pixels * cfg.spp))
    oimg = oracle.render()
    rel = np.abs(img - oimg) / (1.0 + np.abs(oimg))
    assert (rel > 0.1).mean() <= 0.02
    assert img.mean() > 0  # env actually contributes


def test_env_config_validation():
    with pytest.raises(ValueError):
        RenderConfig(env_emission=(1.0, 1.0))
    with pytest.raises(ValueError):
        RenderConfig(env_emission=(-1.0, 0.0, 0.0))
    cfg = RenderConfig(env_emission=(1, 2, 3))  # ints coerce to floats
    assert cfg.env_emission == (1.0, 2.0, 3.0)
    assert cfg.has_env


def test_env_sharded_matches_single():
    """env pickup under the (tile, sample) mesh equals the single-device
    render bit-for-bit (placement-invariant keying; env is a per-lane
    constant add)."""
    import jax

    from smallpt_tpu.parallel.shard import make_mesh, render_sharded

    cfg = RenderConfig(width=16, height=8, spp_per_cell=1, max_depth=6,
                       camera_model=CameraModel.LEGACY, filter=Filter.TENT,
                       env_emission=ENV)
    scene = two_sphere_scene()
    cam = smallpt_camera()
    key = prng.base_key(5)
    single = np.asarray(render(scene, cam, cfg, key))
    mesh = make_mesh(n_sample=2, devices=jax.devices("cpu")[:4])
    sharded = np.asarray(render_sharded(scene, cam, cfg, key, mesh))
    np.testing.assert_allclose(sharded, single, rtol=2e-5, atol=2e-5)


def test_env_composes_with_nee_and_dof():
    """env + NEE + thin-lens DoF on the open scene: the estimator stays
    unbiased (NEE suppresses only the sampled light's emission, never the
    env term) — NEE-on equals plain BSDF sampling in expectation."""
    from smallpt_tpu.engine.renderer import render_image

    scene = _open_scene()
    cfg = BASE.replace(
        width=10, height=8, max_depth=8, nee_lights=(0,),
        aperture=2.0, focal_distance=230.0,
    )
    nee = np.asarray(render_image(scene, smallpt_camera(), cfg,
                                  seed=0, n_passes=8))
    plain = np.asarray(render_image(
        scene, smallpt_camera(), cfg.replace(nee_lights=()),
        seed=1, n_passes=32,
    ))
    assert abs(nee.mean() - plain.mean()) < 0.08 * (plain.mean() + 0.05), (
        nee.mean(), plain.mean())


def test_env_quality_stopping_on_env_scene():
    """Equal-quality stopping converges fast on an env-dominated scene
    (low variance): the stderr target is reached well under the cap."""
    from smallpt_tpu.engine.streaming import StreamingRenderer

    cfg = BASE.replace(width=10, height=8, max_depth=6)
    r = StreamingRenderer(_all_miss_scene(), smallpt_camera(), cfg, seed=2)
    q = r.step_to_quality(rel_err=0.05, quantile=0.95, max_spp=256,
                          min_spp=4, n_iters=1024)
    # every sample is exactly env: zero variance, stops right after the
    # bootstrap floor
    assert q["rel_err_q"] == 0.0
    assert q["spp_max"] <= 8, q
