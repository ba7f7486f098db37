"""Declarative JSON scene files (core/scene_io.py).

The reference's scenes are C++ source literals (smallpt.cpp:31-48,
818-838); SURVEY.md §2.1 maps that slot to a declarative scene spec
lowered to device arrays. Round-trips must be bit-exact (JSON binary64
numbers hold every f32 value), so a loaded scene renders bit-identically
to its builder."""

import json

import numpy as np
import pytest

from smallpt_tpu.config import RenderConfig, Filter, CameraModel
from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.scene import (
    MeshScene, cornell_box_scene, single_triangle_scene, two_sphere_scene,
)
from smallpt_tpu.core.scene_io import (
    load_scene, save_scene, scene_from_dict, scene_to_dict,
)
from smallpt_tpu.core.camera import smallpt_camera
from smallpt_tpu.engine.renderer import render


def _roundtrip(scene, tmp_path):
    path = str(tmp_path / "scene.json")
    save_scene(scene, path)
    loaded = load_scene(path)
    assert type(loaded) is type(scene)
    for a, b in zip(scene, loaded):
        if isinstance(a, tuple):  # Material
            for fa, fb in zip(a, b):
                assert fa.dtype == fb.dtype
                assert (np.asarray(fa) == np.asarray(fb)).all()
        else:
            assert a.dtype == b.dtype
            assert (np.asarray(a) == np.asarray(b)).all()
    return loaded


def test_sphere_scene_roundtrip_bitexact(tmp_path):
    _roundtrip(cornell_box_scene(), tmp_path)
    _roundtrip(two_sphere_scene(), tmp_path)


def test_mesh_scene_roundtrip_bitexact(tmp_path):
    _roundtrip(single_triangle_scene(), tmp_path)


def test_loaded_scene_renders_bitidentically(tmp_path):
    cfg = RenderConfig(width=10, height=8, spp_per_cell=1, max_depth=6,
                       camera_model=CameraModel.LEGACY, filter=Filter.TENT)
    cam = smallpt_camera()
    key = prng.base_key(0)
    scene = cornell_box_scene()
    loaded = _roundtrip(scene, tmp_path)
    a = np.asarray(render(scene, cam, cfg, key))
    b = np.asarray(render(loaded, cam, cfg, key))
    assert (a == b).all()


def test_handwritten_spec_renders():
    spec = {
        "format": "smallpt_tpu_scene", "version": 1, "type": "spheres",
        "spheres": [
            {"center": [50, 40.8, 81.6], "radius": 20,
             "albedo": [0.75, 0.25, 0.25]},
            {"center": [50, 681.33, 81.6], "radius": 600,
             "emission": [12, 12, 12], "refl": "DIFF"},
        ],
    }
    scene = scene_from_dict(spec)
    assert scene.n_spheres == 2
    assert int(scene.material.refl[0]) == 0
    cfg = RenderConfig(width=8, height=6, spp_per_cell=1, max_depth=4,
                       camera_model=CameraModel.LEGACY, filter=Filter.TENT)
    img = np.asarray(render(scene, smallpt_camera(), cfg, prng.base_key(1)))
    assert np.isfinite(img).all() and img.sum() > 0


def test_spec_validation_errors():
    base = {"format": "smallpt_tpu_scene", "version": 1}
    with pytest.raises(ValueError, match="format"):
        scene_from_dict({"format": "other", "type": "spheres"})
    with pytest.raises(ValueError, match="version"):
        scene_from_dict({**base, "version": 99, "type": "spheres"})
    with pytest.raises(ValueError, match="type"):
        scene_from_dict({**base, "type": "nurbs"})
    with pytest.raises(ValueError, match="non-empty"):
        scene_from_dict({**base, "type": "spheres", "spheres": []})
    with pytest.raises(ValueError, match="radii"):
        scene_from_dict({**base, "type": "spheres", "spheres": [
            {"center": [0, 0, 0], "radius": -1}]})
    with pytest.raises(ValueError, match="refl"):
        scene_from_dict({**base, "type": "spheres", "spheres": [
            {"center": [0, 0, 0], "radius": 1, "refl": "GLOSSY"}]})
    with pytest.raises(ValueError, match="indices"):
        scene_from_dict({**base, "type": "mesh",
                         "positions": [[0, 0, 0]], "normals": [[0, 0, 1]],
                         "indices": [[0, 1, 2]],
                         "materials": [{"albedo": [1, 1, 1]}]})
    with pytest.raises(ValueError, match="tri_inst"):
        scene_from_dict({**base, "type": "mesh",
                         "positions": [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                         "normals": [[0, 0, 1]] * 3,
                         "indices": [[0, 1, 2]], "tri_inst": [3],
                         "materials": [{"albedo": [1, 1, 1]}]})


def test_cli_scene_file(tmp_path, capsys):
    """--scene-file drives the full CLI path end-to-end."""
    from smallpt_tpu.cli import main

    path = tmp_path / "two.json"
    save_scene(two_sphere_scene(), str(path))
    out = tmp_path / "img.ppm"
    rc = main(["4", "--scene-file", str(path), "--width", "8", "--height",
               "6", "--max-depth", "4", "--quiet", "--out", str(out)])
    assert rc == 0
    assert out.exists()

    mesh_path = tmp_path / "tri.json"
    save_scene(single_triangle_scene(), str(mesh_path))
    out2 = tmp_path / "tri.ppm"
    rc = main(["4", "--scene-file", str(mesh_path), "--mode", "normal",
               "--width", "8", "--height", "6", "--max-depth", "2",
               "--quiet", "--out", str(out2)])
    assert rc == 0
    assert out2.exists()
