"""Declarative JSON scene files: load/save SphereScene and MeshScene.

The reference defines scenes as C++ source literals (the global sphere
array smallpt.cpp:31-48, the in-code SingleTriangleScene smallpt.cpp:
818-838) — changing a scene means recompiling the program — and its only
runtime data channel is the nlohmann/json render-request queue
(smallpt.cpp:890-891). SURVEY.md §2.1 (scene-definitions row) names the
TPU-native equivalent: a declarative scene spec (json) lowered to device
arrays. This module is that spec.

Format (version 1):

    {"format": "smallpt_tpu_scene", "version": 1,
     "type": "spheres",
     "spheres": [
       {"center": [x, y, z], "radius": r,
        "albedo": [r, g, b], "emission": [r, g, b], "refl": "DIFF"},
       ...]}

    {"format": "smallpt_tpu_scene", "version": 1,
     "type": "mesh",
     "positions": [[x,y,z], ...], "normals": [[x,y,z], ...],
     "indices": [[a,b,c], ...], "tri_inst": [i, ...],
     "materials": [{"albedo": [...], "emission": [...], "refl": "DIFF"},
                   ...]}     # one entry per instance id

`refl` accepts the reference's enum names (scene.h:64). Fields
`emission` (default black) and `refl` (default "DIFF") are optional per
entry. Arrays round-trip exactly: floats are serialized with repr-level
precision via Python floats (binary64 superset of the f32 values).
"""

from __future__ import annotations

import json

import numpy as np
import jax.numpy as jnp

from smallpt_tpu.core.scene import (
    DIFF, SPEC, REFR, Material, MeshScene, SphereScene,
)

_REFL_NAMES = {"DIFF": DIFF, "SPEC": SPEC, "REFR": REFR}
_REFL_TAGS = {v: k for k, v in _REFL_NAMES.items()}
FORMAT = "smallpt_tpu_scene"
VERSION = 1


def _refl_tag(name) -> int:
    if isinstance(name, str):
        try:
            return _REFL_NAMES[name.upper()]
        except KeyError:
            raise ValueError(
                f"unknown refl {name!r} (expected DIFF/SPEC/REFR)"
            ) from None
    tag = int(name)
    if tag not in _REFL_TAGS:
        raise ValueError(f"unknown refl tag {tag}")
    return tag


def _material_from_entries(entries, dtype) -> Material:
    emission = [e.get("emission", (0.0, 0.0, 0.0)) for e in entries]
    albedo = [e.get("albedo", (0.0, 0.0, 0.0)) for e in entries]
    refl = [_refl_tag(e.get("refl", "DIFF")) for e in entries]
    emission = np.asarray(emission, np.float64)
    albedo = np.asarray(albedo, np.float64)
    if emission.shape != (len(entries), 3) or albedo.shape != (len(entries), 3):
        raise ValueError("emission/albedo must be [r, g, b] triples")
    return Material(
        emission=jnp.asarray(emission, dtype),
        albedo=jnp.asarray(albedo, dtype),
        refl=jnp.asarray(refl, jnp.int32),
    )


def scene_from_dict(spec: dict, dtype=jnp.float32):
    """Lower a parsed scene spec to device arrays."""
    if not isinstance(spec, dict):
        raise ValueError("scene spec must be a JSON object")
    if spec.get("format", FORMAT) != FORMAT:
        raise ValueError(f"not a {FORMAT} file: format={spec.get('format')!r}")
    version = spec.get("version", VERSION)
    if version != VERSION:
        raise ValueError(f"unsupported scene version {version}")
    kind = spec.get("type")
    if kind == "spheres":
        entries = spec.get("spheres")
        if not entries:
            raise ValueError("spheres scene needs a non-empty 'spheres' list")
        centers = np.asarray([e["center"] for e in entries], np.float64)
        radii = np.asarray([e["radius"] for e in entries], np.float64)
        if centers.shape != (len(entries), 3):
            raise ValueError("sphere centers must be [x, y, z]")
        if not (np.isfinite(radii).all() and (radii > 0).all()):
            raise ValueError("sphere radii must be finite and > 0")
        return SphereScene(
            center=jnp.asarray(centers, dtype),
            radius=jnp.asarray(radii, dtype),
            material=_material_from_entries(entries, dtype),
        )
    if kind == "mesh":
        positions = np.asarray(spec["positions"], np.float64)
        normals = np.asarray(spec["normals"], np.float64)
        indices = np.asarray(spec["indices"], np.int64)
        materials = spec["materials"]
        if positions.ndim != 2 or positions.shape[1] != 3:
            raise ValueError("positions must be (V, 3)")
        if normals.shape != positions.shape:
            raise ValueError("normals must match positions' shape")
        if indices.ndim != 2 or indices.shape[1] != 3:
            raise ValueError("indices must be (T, 3)")
        if indices.size and (
            indices.min() < 0 or indices.max() >= positions.shape[0]
        ):
            raise ValueError("indices out of range")
        tri_inst = np.asarray(
            spec.get("tri_inst", np.zeros(indices.shape[0])), np.int64
        )
        if tri_inst.shape != (indices.shape[0],):
            raise ValueError("tri_inst must be (T,)")
        if tri_inst.size and (
            tri_inst.min() < 0 or tri_inst.max() >= len(materials)
        ):
            raise ValueError("tri_inst out of range of materials")
        return MeshScene(
            positions=jnp.asarray(positions, dtype),
            normals=jnp.asarray(normals, dtype),
            indices=jnp.asarray(indices, jnp.int32),
            tri_inst=jnp.asarray(tri_inst, jnp.int32),
            material=_material_from_entries(materials, dtype),
        )
    raise ValueError(f"unknown scene type {kind!r} (expected spheres|mesh)")


def _material_entries(mat: Material):
    emission = np.asarray(mat.emission, np.float64)
    albedo = np.asarray(mat.albedo, np.float64)
    refl = np.asarray(mat.refl)
    return [
        {
            "albedo": albedo[i].tolist(),
            "emission": emission[i].tolist(),
            "refl": _REFL_TAGS[int(refl[i])],
        }
        for i in range(refl.shape[0])
    ]


def scene_to_dict(scene) -> dict:
    """Serialize a scene back to the JSON spec (exact f32 round-trip:
    binary64 JSON numbers hold every f32 value)."""
    if isinstance(scene, SphereScene):
        centers = np.asarray(scene.center, np.float64)
        radii = np.asarray(scene.radius, np.float64)
        mats = _material_entries(scene.material)
        return {
            "format": FORMAT, "version": VERSION, "type": "spheres",
            "spheres": [
                {"center": centers[i].tolist(), "radius": float(radii[i]),
                 **mats[i]}
                for i in range(radii.shape[0])
            ],
        }
    if isinstance(scene, MeshScene):
        return {
            "format": FORMAT, "version": VERSION, "type": "mesh",
            "positions": np.asarray(scene.positions, np.float64).tolist(),
            "normals": np.asarray(scene.normals, np.float64).tolist(),
            "indices": np.asarray(scene.indices).tolist(),
            "tri_inst": np.asarray(scene.tri_inst).tolist(),
            "materials": _material_entries(scene.material),
        }
    raise TypeError(f"cannot serialize {type(scene).__name__}")


def load_scene(path: str, dtype=jnp.float32):
    with open(path) as f:
        return scene_from_dict(json.load(f), dtype=dtype)


def save_scene(scene, path: str) -> None:
    with open(path, "w") as f:
        json.dump(scene_to_dict(scene), f)
        f.write("\n")
