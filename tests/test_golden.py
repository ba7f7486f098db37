"""Golden-image regression suite (VERDICT round-1 item #5).

Two layers:

1. STORED goldens (tests/data/golden_*.npz, regenerated only by
   scripts/gen_goldens.py): f64 oracle renders at fixed (scene, config,
   seed). The renderer shares the oracle's uniform streams, so comparisons
   are path-for-path — a silent transport regression (wrong BSDF branch,
   broken keying, dropped emission term) shifts many pixels and fails
   loudly, while f32-vs-f64 geometry noise stays under the thresholds.
   Unlike the oracle-parity tests, these catch regressions that break the
   renderer AND the live oracle together, and they run at non-toy aspect.

2. MID-RES statistical gate: a 1024x768 render (BASELINE configs 2/3
   resolution) compared against the oracle on a stratified pixel
   subsample — full-frame oracle renders are intractable at this size, but
   per-pixel path-for-path agreement on a spread of pixels pins the
   transport at the real resolution (sample indexing, jitter-cell
   decomposition, and row addressing all scale with W/H and were
   previously tested only at toy sizes).
"""

import os

import numpy as np

from smallpt_tpu.config import RenderConfig, Filter, CameraModel
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core.scene import (
    cornell_box_scene,
    cornell_box_small_light_scene,
)
from smallpt_tpu.engine.renderer import render
from smallpt_tpu.oracle.numpy_oracle import Oracle, PrecomputedUniformProvider

DATA = os.path.join(os.path.dirname(__file__), "data")


def _check_against_golden(name, scene, cfg, seed, max_frac_div=0.02):
    data = np.load(os.path.join(DATA, f"{name}.npz"))
    golden = data["image"]
    assert (int(data["width"]), int(data["height"])) == (cfg.width, cfg.height)
    img = np.asarray(render(scene, smallpt_camera(), cfg, prng.base_key(seed)))
    rel = np.abs(img - golden) / (1.0 + np.abs(golden))
    frac = (rel > 0.1).mean()
    assert frac <= max_frac_div, f"{frac:.4f} of values diverge >10%"
    assert abs(img.mean() - golden.mean()) < 0.05 * (golden.mean() + 0.1)


def test_golden_cornell():
    cfg = RenderConfig(
        width=48, height=36, spp_per_cell=4, max_depth=24,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
    )
    # depth-24 transport has a larger razor-flip population than the toy
    # parity configs (every extra bounce is another chance for an f32
    # discrete flip vs the f64 oracle): measured 3.2% at this config
    _check_against_golden(
        "golden_cornell_48x36", cornell_box_scene(), cfg, 7,
        max_frac_div=0.05,
    )


def test_golden_cornell_shallow_tight():
    """VERDICT r2 weak #6: the depth-24 golden's envelope (5% of values
    may diverge, mean within 5%) could hide a systematic ~3% brightness
    bug. At depth 4 the flip population is measured at 1.33% (glass-choice
    and sphere-rim razors at the first bounces; each 16-spp flip moves the
    pixel wholesale, and the non-flipped values match to <1%) with a 0.93%
    mean gap — so this gate pins 2-2.5x tighter: <=2.5% divergent values,
    <=0.5% in the 1-10%% band (systematic-shift detector: flips are
    bimodal, a calibration bug is not), mean within 2%."""
    cfg = RenderConfig(
        width=48, height=36, spp_per_cell=4, max_depth=4,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
    )
    data = np.load(os.path.join(DATA, "golden_cornell_shallow_48x36.npz"))
    golden = data["image"]
    img = np.asarray(
        render(cornell_box_scene(), smallpt_camera(), cfg, prng.base_key(17))
    )
    rel = np.abs(img - golden) / (1.0 + np.abs(golden))
    assert (rel > 0.1).mean() <= 0.025, (rel > 0.1).mean()
    band = ((rel > 0.01) & (rel <= 0.1)).mean()
    assert band <= 0.005, band
    assert abs(img.mean() - golden.mean()) < 0.02 * (golden.mean() + 0.1)


def test_golden_nee_small_light():
    cfg = RenderConfig(
        width=32, height=24, spp_per_cell=2, max_depth=16,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
        nee_lights=(8,),
    )
    _check_against_golden(
        "golden_nee_smalllight_32x24", cornell_box_small_light_scene(), cfg,
        11,
    )


def test_golden_dof():
    cfg = RenderConfig(
        width=32, height=24, spp_per_cell=2, max_depth=12,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
        aperture=4.0, focal_distance=120.0,
    )
    _check_against_golden("golden_dof_32x24", cornell_box_scene(), cfg, 13)


def test_midres_statistical_gate_1024x768():
    """BASELINE config 2/3 resolution: full-frame render vs oracle on a
    stratified pixel subsample (every 4243rd pixel => ~185 pixels spread
    across all rows), 1 spp, path-for-path."""
    cfg = RenderConfig(
        width=1024, height=768, jitter_size=1, spp_per_cell=1, max_depth=12,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
    )
    scene = cornell_box_scene()
    key = prng.base_key(21)
    img = np.asarray(render(scene, smallpt_camera(), cfg, key))

    pixels = np.arange(0, cfg.n_pixels, 4243, dtype=np.int64)
    sids = (pixels[:, None] * cfg.spp + np.arange(cfg.spp)).reshape(-1)
    oracle = Oracle(
        scene, smallpt_camera(), cfg,
        PrecomputedUniformProvider(key, sids=sids.astype(np.int64)),
    )
    ovals = oracle.render_pixels(pixels)
    rows, cols = pixels // cfg.width, pixels % cfg.width
    rvals = img[rows, cols]
    rel = np.abs(rvals - ovals) / (1.0 + np.abs(ovals))
    # 1-spp single-sample comparison: razor-edge paths (glass rims, light
    # rim) can flip; the bulk must agree path-for-path
    assert (rel > 0.1).mean() <= 0.04, (rel > 0.1).mean()
    assert abs(rvals.mean() - ovals.mean()) < 0.1 * (abs(ovals.mean()) + 0.1)


def test_binned_route_oracle_gate_512x384_procedural():
    """VERDICT r2 item 6: the big-scene binned route through render() —
    grid accel, culled distance-ordered sweeps, streaming (pixel, ip)
    keying — pinned against the f64 oracle at non-toy scale (512x384,
    2,100 spheres > MEGA_MAX_SPHERES), not only against the classic
    kernel's statistics. The oracle replays the streaming decision streams
    via StreamUniformProvider (core/rng.py::stream_*_uniforms mirrors)."""
    from smallpt_tpu.core.scene import procedural_sphere_scene
    from smallpt_tpu.oracle.numpy_oracle import StreamUniformProvider
    from smallpt_tpu.ops.megakernel import MEGA_MAX_SPHERES

    cfg = RenderConfig(
        width=512, height=384, jitter_size=1, spp_per_cell=1, max_depth=12,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
    )
    scene = procedural_sphere_scene(2100, seed=7)
    assert scene.n_spheres > MEGA_MAX_SPHERES  # really the binned route
    key = prng.base_key(21)
    img = np.asarray(render(scene, smallpt_camera(), cfg, key))

    pixels = np.arange(0, cfg.n_pixels, 1051, dtype=np.int64)  # ~187 px
    sids = (pixels[:, None] * cfg.spp + np.arange(cfg.spp)).reshape(-1)
    oracle = Oracle(
        scene, smallpt_camera(), cfg,
        StreamUniformProvider(key, cfg, sids),
    )
    ovals = oracle.render_pixels(pixels)
    rows, cols = pixels // cfg.width, pixels % cfg.width
    rvals = img[rows, cols]
    rel = np.abs(rvals - ovals) / (1.0 + np.abs(ovals))
    # 1-spp path-for-path; the dense procedural scene has more razor
    # edges (2k sphere rims) than Cornell, same gate shape
    assert (rel > 0.1).mean() <= 0.05, (rel > 0.1).mean()
    assert abs(rvals.mean() - ovals.mean()) < 0.1 * (abs(ovals.mean()) + 0.1)


def test_golden_mesh_culled():
    """Triangle transport + the grid-culled accel route vs the stored f64
    mesh golden (r3): the route is FORCED (min-tris 1) so a reach-mask or
    early-exit conservatism bug diverges from ground truth here even if
    culled==brute stays self-consistent."""
    from smallpt_tpu.config import Intersector, Scheduler
    from smallpt_tpu.core.scene import procedural_mesh_scene
    from smallpt_tpu.engine import renderer as R

    cfg = RenderConfig(
        width=32, height=24, spp_per_cell=2, max_depth=10,
        camera_model=CameraModel.LEGACY, filter=Filter.TENT,
        intersector=Intersector.PALLAS, scheduler=Scheduler.FLAT,
    )
    scene = procedural_mesh_scene(n_balls=60, seed=3)
    old = R.MESH_ACCEL_MIN_TRIS
    try:
        R.MESH_ACCEL_MIN_TRIS = 1
        R._MESH_ACCEL_CACHE.clear()
        _check_against_golden("golden_mesh_32x24", scene, cfg, 19)
        assert len(R._MESH_ACCEL_CACHE) == 1  # the accel route really ran
    finally:
        R.MESH_ACCEL_MIN_TRIS = old
        R._MESH_ACCEL_CACHE.clear()
