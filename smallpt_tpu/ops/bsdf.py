"""BSDF sampling and Russian roulette — the shading kernel math.

This is the TPU rebuild of shadePaths (smallpt.cpp:154-267): the reference's
per-path branches become branchless masked selects over SoA lanes. The full
intended light transport is implemented (the reference currently
short-circuits into a normals AOV at smallpt.cpp:180-183; the dead code below
that line is the spec — SURVEY.md §0):

- emission accumulation: L += weight * emission, pre-RR (smallpt.cpp:179)
- Russian roulette after depth > 5 with survival p = max albedo component,
  survivor boosted 1/p (smallpt.cpp:187-198)
- DIFF: cosine-weighted hemisphere via (r1 = 2*pi*u1, r2s = sqrt(u2)) and the
  tangent frame w=nl, u = normalize(cross(|w.x|>.1 ? (0,1,0):(1,0,0), w)),
  v = w x u (smallpt.cpp:208-216)
- SPEC: mirror d - n*2*dot(n,d) (smallpt.cpp:218-223)
- REFR: Snell with total internal reflection (smallpt.cpp:225-238), Schlick
  Fresnel Re/Tr (smallpt.cpp:240-246), probabilistic reflect/refract with
  P = .25 + .5*Re and weights Re/P, Tr/(1-P) (smallpt.cpp:256-263); path
  splitting at depth <= 2 (smallpt.cpp:248-254) is handled by the wavefront
  scheduler (ops/wavefront.py), which calls `refr_terms` and spawns into
  budgeted lanes.

Normal orientation: nl is flipped against the incoming ray (original smallpt
behavior; the reference disables the flip at smallpt.cpp:174, which breaks its
glass path — see SURVEY.md Appendix A). The flip is a config switch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from smallpt_tpu.core import rng as prng
from smallpt_tpu.core.math import safe_sqrt, safe_normalize


def _dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cosine_sample(nl: jnp.ndarray, u1: jnp.ndarray, u2: jnp.ndarray):
    """Cosine-weighted hemisphere direction around nl (smallpt.cpp:210-212).

    nl: (N,3) unit; u1,u2: (N,) uniforms. Returns (N,3) unit directions.
    """
    r1 = 2.0 * jnp.pi * u1
    r2s = jnp.sqrt(u2)
    w = nl
    up = jnp.where(
        (jnp.abs(w[:, 0]) > 0.1)[:, None],
        jnp.asarray([0.0, 1.0, 0.0], nl.dtype)[None, :],
        jnp.asarray([1.0, 0.0, 0.0], nl.dtype)[None, :],
    )
    u = safe_normalize(jnp.cross(up, w))
    v = jnp.cross(w, u)
    d = (
        u * (jnp.cos(r1) * r2s)[:, None]
        + v * (jnp.sin(r1) * r2s)[:, None]
        + w * safe_sqrt(1.0 - u2)[:, None]
    )
    return safe_normalize(d)


def mirror_dir(d: jnp.ndarray, n: jnp.ndarray):
    """Mirror reflection d - n*2*dot(n,d) (smallpt.cpp:218)."""
    return d - n * (2.0 * _dot(n, d))


class RefrTerms(NamedTuple):
    """Everything the scheduler needs to resolve a REFR event per lane."""

    tir: jnp.ndarray  # (N,) bool — total internal reflection
    tdir: jnp.ndarray  # (N,3) transmitted direction (unit; undefined if tir)
    re: jnp.ndarray  # (N,) Fresnel reflectance
    tr: jnp.ndarray  # (N,) transmittance = 1 - re
    p_refl: jnp.ndarray  # (N,) single-path reflect probability .25+.5*Re


def refr_terms(d: jnp.ndarray, n: jnp.ndarray, nl: jnp.ndarray, ior: float) -> RefrTerms:
    """Snell refraction + Schlick Fresnel (smallpt.cpp:225-246).

    d: incoming ray dir (N,3); n: geometric normal; nl: shading normal
    (flipped against d). into = dot(n, nl) > 0 detects outside->inside.
    """
    dt = d.dtype
    into = _dot(n, nl) > 0.0  # (N,1)
    nc = jnp.asarray(1.0, dt)
    nt = jnp.asarray(ior, dt)
    nnt = jnp.where(into[:, 0], nc / nt, nt / nc)  # (N,)
    ddn = _dot(d, nl)[:, 0]  # (N,)
    cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
    tir = cos2t < 0.0
    sq = safe_sqrt(cos2t)
    sign = jnp.where(into[:, 0], 1.0, -1.0).astype(dt)
    tdir_raw = d * nnt[:, None] - n * (sign * (ddn * nnt + sq))[:, None]
    tdir = safe_normalize(tdir_raw)

    a = nt - nc
    b = nt + nc
    r0 = (a * a) / (b * b)
    c = 1.0 - jnp.where(into[:, 0], -ddn, _dot(tdir, n)[:, 0])
    re = r0 + (1.0 - r0) * c * c * c * c * c
    tr = 1.0 - re
    p_refl = 0.25 + 0.5 * re
    return RefrTerms(tir=tir, tdir=tdir, re=re, tr=tr, p_refl=p_refl)


def russian_roulette(albedo: jnp.ndarray, depth: jnp.ndarray, u: jnp.ndarray, rr_depth: int):
    """RR kill decision (smallpt.cpp:187-198).

    Returns (survive (N,) bool, boost (N,) weight multiplier). Paths with
    depth <= rr_depth always survive with boost 1.
    """
    p = jnp.max(albedo, axis=-1)
    active = depth > rr_depth
    survive = jnp.where(active, u < p, True)
    boost = jnp.where(active & survive, 1.0 / jnp.maximum(p, 1e-12), 1.0)
    return survive, boost
