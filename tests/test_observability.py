"""Observability subsystem: stats, occupancy profile, weighted accumulation.

The reference's telemetry is stderr prints + a progress poll
(smallpt.cpp:366-373); these tests pin the structured replacements
(SURVEY.md §5.1/§5.5) and the RenderOutputs weighted-accumulation
capability (smallpt.cpp:644-674)."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from smallpt_tpu.config import RenderConfig, Filter, CameraModel, Scheduler
from smallpt_tpu.core.scene import cornell_box_scene
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.core import rng as prng
from smallpt_tpu.engine.accum import WeightedAccum
from smallpt_tpu.engine.progressive import ProgressiveRenderer
from smallpt_tpu.utils.metrics import RenderStats, occupancy_profile, log_json

CFG = RenderConfig(width=16, height=12, spp_per_cell=1, max_depth=8,
                   camera_model=CameraModel.LEGACY, filter=Filter.TENT)


def test_progressive_tracks_stats():
    r = ProgressiveRenderer(cornell_box_scene(), smallpt_camera(), CFG, seed=0)
    r.step(2)
    assert r.stats.passes == 2
    assert r.stats.rays > CFG.n_pixels * CFG.spp  # >= 1 bounce per sample
    assert r.stats.wall_s > 0
    assert r.stats.rays_per_s > 0
    d = r.stats.as_dict()
    assert set(d) == {"passes", "rays", "wall_s", "rays_per_s"}


def test_occupancy_profile_shape_and_decay():
    cfg = CFG.replace(scheduler=Scheduler.REGEN)
    occ = occupancy_profile(cornell_box_scene(), smallpt_camera(), cfg,
                            prng.base_key(0))
    G = cfg.n_pixels
    assert 1 <= len(occ) <= cfg.spp * cfg.max_depth
    assert occ[0] == G  # every lane regenerates at iteration 0
    assert occ[-1] >= 1  # loop exits only when drained
    # total lane-iterations == rays traced by the real render
    from smallpt_tpu.engine.renderer import render_with_stats
    _, rays = render_with_stats(cornell_box_scene(), smallpt_camera(), cfg,
                                prng.base_key(0))
    assert int(occ.sum()) == int(rays)


def test_log_json_emits_one_line(capsys):
    log_json("bench", {"value": 3})
    err = capsys.readouterr().err.strip()
    rec = json.loads(err)
    assert rec["event"] == "bench" and rec["value"] == 3 and "t" in rec


class TestWeightedAccum:
    def test_uniform_weights_match_plain_mean(self):
        acc = WeightedAccum.zeros(4, 5)
        imgs = [np.random.default_rng(i).uniform(size=(4, 5, 3)) for i in range(3)]
        for im in imgs:
            acc = acc.add(jnp.asarray(im, jnp.float32))
        np.testing.assert_allclose(
            np.asarray(acc.normalized()), np.mean(imgs, axis=0), rtol=1e-6
        )

    def test_heterogeneous_weights(self):
        """Pixels accumulated with different sample counts normalize
        per-pixel — the capability RenderOutputs adds over the reference's
        global sampleCount divide (smallpt.cpp:957)."""
        acc = WeightedAccum.zeros(2, 2)
        # pixel (0,0) gets 3 samples of value 1; others get 1 sample of 2
        w = jnp.asarray([[3.0, 1.0], [1.0, 1.0]])
        c = jnp.asarray([[[3.0] * 3, [2.0] * 3], [[2.0] * 3, [2.0] * 3]])
        acc = acc.add(c, w)
        out = np.asarray(acc.normalized())
        np.testing.assert_allclose(out[0, 0], 1.0)
        np.testing.assert_allclose(out[0, 1], 2.0)

    def test_zero_weight_pixels_are_black(self):
        acc = WeightedAccum.zeros(1, 2)
        acc = acc.add(jnp.asarray([[[1.0] * 3, [0.0] * 3]]),
                      jnp.asarray([[1.0, 0.0]]))
        out = np.asarray(acc.normalized())
        assert out[0, 0, 0] == 1.0 and out[0, 1, 0] == 0.0
