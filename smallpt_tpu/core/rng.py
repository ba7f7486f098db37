"""Stateless, placement-invariant random number streams.

The reference seeds a mt19937 per image row (seed*imageHeight + rowIdx,
smallpt.cpp:740; rowIdx^3 in the legacy path, smallpt.cpp:319) and draws
sequentially — determinism holds only per (seed, row) and depends on the
iteration order inside the row. Here every random decision is keyed by its
*coordinates* in the computation:

    (seed) -> sample_id -> path history -> depth -> purpose lane

so the stream is independent of sharding layout, wavefront lane placement,
batch chunking, and split-slot assignment (SURVEY.md §7 hard part #4).

Path history encodes the refraction-split tree position: the camera path is 0,
and a split (smallpt.cpp:248-254) assigns reflect-child 2h+1 and refract-child
2h+2 — unique per leaf, identical in the oracle's recursion and the wavefront's
masked lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Uniform lanes drawn per (path, bounce): [rr, bsdf_u1, bsdf_u2, refr_choice].
U_RR = 0
U_BSDF_1 = 1
U_BSDF_2 = 2
U_CHOICE = 3
N_SHADE_U = 4

_CAMERA_SALT = jnp.uint32(0x9E3779B9)


def base_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


@functools.partial(jax.jit, static_argnames=("dtype",))
def camera_uniforms(key: jax.Array, sample_ids: jnp.ndarray, dtype=jnp.float32):
    """(N,2) uniforms for the pixel filter, keyed per global sample id."""

    def one(sid):
        k = jax.random.fold_in(jax.random.fold_in(key, _CAMERA_SALT), sid)
        return jax.random.uniform(k, (2,), dtype=dtype)

    return jax.vmap(one)(sample_ids)


@functools.partial(jax.jit, static_argnames=("dtype",))
def shade_uniforms(
    key: jax.Array,
    sample_ids: jnp.ndarray,
    hist: jnp.ndarray,
    depth: jnp.ndarray,
    dtype=jnp.float32,
):
    """(N, N_SHADE_U) uniforms for one shading event per lane."""

    def one(sid, h, d):
        k = jax.random.fold_in(jax.random.fold_in(jax.random.fold_in(key, sid), h), d)
        return jax.random.uniform(k, (N_SHADE_U,), dtype=dtype)

    return jax.vmap(one)(sample_ids, hist, depth)
