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

Generator: PCG4D, the counter-based hash of Jarzynski & Olano, "Hash
Functions for GPU Rendering" (JCGT 2020) — the de-facto production path-tracer
RNG. One evaluation (≈20 int ops) yields the four uniforms a shading event
needs; the previous implementation chained three per-lane threefry
invocations via jax.random.fold_in (~400 ops each), which profiling showed
was ~30-40% of a full render pass. The seed key still comes from jax.random
(PRNGKey / fold_in at the per-pass level), so driver-level key plumbing is
unchanged; only the per-lane expansion is the cheap hash.
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

_CAMERA_SALT = 0x9E3779B9
# distinct from _CAMERA_SALT: with equal salts the (sid, hist=0, depth=0)
# shade tuple equals the camera tuple, making first-bounce BSDF uniforms
# identical to the pixel-jitter uniforms (correlated sampling)
_GOLDEN = 0x85EBCA6B


def base_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def _key_words(key: jax.Array):
    """Two uint32 words from a jax PRNG key (typed or raw)."""
    data = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    return data[0], data[1]


def _pcg4d(a, b, c, d):
    """PCG4D mix (Jarzynski & Olano 2020, listing 4): LCG step per lane,
    two rounds of cross-lane feedback, one xorshift. All uint32, wrapping."""
    m = jnp.uint32(1664525)
    inc = jnp.uint32(1013904223)
    a = a * m + inc
    b = b * m + inc
    c = c * m + inc
    d = d * m + inc
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    a = a ^ (a >> 16)
    b = b ^ (b >> 16)
    c = c ^ (c >> 16)
    d = d ^ (d >> 16)
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    return a, b, c, d


def _to_unit(bits, dtype):
    """uint32 -> [0, 1) float with 24 random mantissa bits."""
    return (bits >> jnp.uint32(8)).astype(dtype) * jnp.asarray(
        1.0 / (1 << 24), dtype
    )


@functools.partial(jax.jit, static_argnames=("dtype",))
def camera_uniforms(key: jax.Array, sample_ids: jnp.ndarray, dtype=jnp.float32):
    """(N,2) uniforms for the pixel filter, keyed per global sample id."""
    k0, k1 = _key_words(key)
    sid = sample_ids.astype(jnp.uint32)
    a, b, _, _ = _pcg4d(
        sid ^ k0,
        k1,
        jnp.full_like(sid, jnp.uint32(_CAMERA_SALT)),
        jnp.broadcast_to(k0 + k1, sid.shape),
    )
    return jnp.stack([_to_unit(a, dtype), _to_unit(b, dtype)], axis=-1)


_LENS_SALT = 0x94D049BB
_NEE_SALT = 0x2545F491
# STREAMING sample keying (v2): (pixel, ip) enter PCG4D as SEPARATE words —
# word a = pixel ^ k0, word b = k1 ^ ip * _STREAM_IP_MULT (odd => injective
# in ip). v1 packed sid = pixel + n_pixels*ip into ONE int32 word, which
# collides once n_pixels * ip wraps 2^32 (e.g. every 16384 samples/pixel at
# 1024x768, and ~once per ~2070 sample indices per pixel pair at 1920x1080)
# — inside config 5's 5000-spp envelope. Streaming checkpoints carry
# STREAM_KEY_VERSION; v1 checkpoints are refused on load.
_STREAM_IP_MULT = 0x9E3779B1
STREAM_KEY_VERSION = 2


def stream_key_words(key: jax.Array, pixel: jnp.ndarray, ip: jnp.ndarray):
    """(a, b) PCG4D input words for a streaming sample (pixel, ip) — the
    single definition shared by the host mirror below and (bit-identically)
    the megakernel's in-kernel streaming keying (ops/megakernel.py)."""
    k0, k1 = _key_words(key)
    a = pixel.astype(jnp.uint32) ^ k0
    b = k1 ^ (ip.astype(jnp.uint32) * jnp.uint32(_STREAM_IP_MULT))
    return a, b


@functools.partial(jax.jit, static_argnames=("dtype",))
def stream_camera_uniforms(
    key: jax.Array, pixel: jnp.ndarray, ip: jnp.ndarray, dtype=jnp.float32
):
    """Host mirror of the megakernel's streaming camera-filter uniforms —
    used by tests to pin stream uniqueness across the v1 wrap boundary."""
    a_w, b_w = stream_key_words(key, pixel, ip)
    k0, k1 = _key_words(key)
    a, b, _, _ = _pcg4d(
        a_w,
        b_w,
        jnp.full_like(a_w, jnp.uint32(_CAMERA_SALT)),
        jnp.broadcast_to(k0 + k1, a_w.shape),
    )
    return jnp.stack([_to_unit(a, dtype), _to_unit(b, dtype)], axis=-1)


@functools.partial(jax.jit, static_argnames=("dtype",))
def stream_shade_uniforms(
    key: jax.Array,
    pixel: jnp.ndarray,
    ip: jnp.ndarray,
    depth: jnp.ndarray,
    dtype=jnp.float32,
):
    """Host mirror of the streaming/binned kernels' per-bounce shade
    uniforms (ops/megakernel.py: _pcg4d(wa, wb, depth + _GOLDEN, k0+k1)
    with the v2 (pixel, ip) words) — lets the NumPy oracle replay the
    streaming schedulers' exact decision streams. Streaming paths never
    split (split_budget == 1), so there is no hist word."""
    a_w, b_w = stream_key_words(key, pixel, ip)
    k0, k1 = _key_words(key)
    a, b, c, d = _pcg4d(
        a_w,
        b_w,
        depth.astype(jnp.uint32) + jnp.uint32(_GOLDEN),
        jnp.broadcast_to(k0 + k1, a_w.shape),
    )
    return jnp.stack(
        [_to_unit(a, dtype), _to_unit(b, dtype), _to_unit(c, dtype),
         _to_unit(d, dtype)],
        axis=-1,
    )
# per-light-slot salt stride: a bare "+ slot" would alias slot s+1 at depth d
# with slot s at depth d+1 (the c-word is depth + salt), correlating direct
# samples across bounces in multi-light configs
_NEE_SLOT_STRIDE = 0x632BE59B


@functools.partial(jax.jit, static_argnames=("light_slot", "dtype"))
def stream_nee_uniforms(
    key: jax.Array,
    pixel: jnp.ndarray,
    ip: jnp.ndarray,
    depth: jnp.ndarray,
    light_slot: int,
    dtype=jnp.float32,
):
    """Host mirror of the streaming kernels' next-event light-cone
    uniforms: _pcg4d(wa, wb, depth + _NEE_SALT + slot*stride, k0+k1) with
    the v2 (pixel, ip) words — the draw the classic streaming kernel makes
    in-kernel and the binned scheduler makes in its XLA shadow-prep stage
    (the direction is drawn ONCE there and carried into the kernel, so bin
    keys and the sweep see bit-identical rays)."""
    a_w, b_w = stream_key_words(key, pixel, ip)
    k0, k1 = _key_words(key)
    a, b, _, _ = _pcg4d(
        a_w,
        b_w,
        depth.astype(jnp.uint32)
        + jnp.uint32((_NEE_SALT + light_slot * _NEE_SLOT_STRIDE) & 0xFFFFFFFF),
        jnp.broadcast_to(k0 + k1, a_w.shape),
    )
    return jnp.stack([_to_unit(a, dtype), _to_unit(b, dtype)], axis=-1)


@functools.partial(jax.jit, static_argnames=("dtype",))
def stream_lens_uniforms(
    key: jax.Array, pixel: jnp.ndarray, ip: jnp.ndarray, dtype=jnp.float32
):
    """Host mirror of the streaming kernels' thin-lens aperture uniforms
    (the in-kernel _LENS_SALT block with v2 (pixel, ip) words)."""
    a_w, b_w = stream_key_words(key, pixel, ip)
    k0, k1 = _key_words(key)
    a, b, _, _ = _pcg4d(
        a_w,
        b_w,
        jnp.full_like(a_w, jnp.uint32(_LENS_SALT)),
        jnp.broadcast_to(k0 + k1, a_w.shape),
    )
    return jnp.stack([_to_unit(a, dtype), _to_unit(b, dtype)], axis=-1)


@functools.partial(jax.jit, static_argnames=("dtype",))
def lens_uniforms(key: jax.Array, sample_ids: jnp.ndarray, dtype=jnp.float32):
    """(N,2) uniforms for the thin-lens aperture sample, keyed per global
    sample id (depth-of-field; RenderConfig.aperture)."""
    k0, k1 = _key_words(key)
    sid = sample_ids.astype(jnp.uint32)
    a, b, _, _ = _pcg4d(
        sid ^ k0,
        k1,
        jnp.full_like(sid, jnp.uint32(_LENS_SALT)),
        jnp.broadcast_to(k0 + k1, sid.shape),
    )
    return jnp.stack([_to_unit(a, dtype), _to_unit(b, dtype)], axis=-1)


@functools.partial(jax.jit, static_argnames=("light_slot", "dtype"))
def nee_uniforms(
    key: jax.Array,
    sample_ids: jnp.ndarray,
    hist: jnp.ndarray,
    depth: jnp.ndarray,
    light_slot: int,
    dtype=jnp.float32,
):
    """(N, 2) uniforms for next-event estimation's light-cone sample at one
    shading event (one pair per sampled light). The c-lane salt offsets by
    _NEE_SALT + light_slot, disjoint from the camera/shade tuples for all
    reachable depths."""
    k0, k1 = _key_words(key)
    a, b, _, _ = _pcg4d(
        sample_ids.astype(jnp.uint32) ^ k0,
        hist.astype(jnp.uint32) ^ k1,
        depth.astype(jnp.uint32)
        + jnp.uint32((_NEE_SALT + light_slot * _NEE_SLOT_STRIDE) & 0xFFFFFFFF),
        jnp.broadcast_to(k0 + k1, sample_ids.shape),
    )
    return jnp.stack([_to_unit(a, dtype), _to_unit(b, dtype)], axis=-1)


@functools.partial(jax.jit, static_argnames=("dtype",))
def shade_uniforms(
    key: jax.Array,
    sample_ids: jnp.ndarray,
    hist: jnp.ndarray,
    depth: jnp.ndarray,
    dtype=jnp.float32,
):
    """(N, N_SHADE_U) uniforms for one shading event per lane, keyed by the
    event's coordinates (sample, split-tree position, bounce depth)."""
    k0, k1 = _key_words(key)
    a, b, c, d = _pcg4d(
        sample_ids.astype(jnp.uint32) ^ k0,
        hist.astype(jnp.uint32) ^ k1,
        depth.astype(jnp.uint32) + jnp.uint32(_GOLDEN),
        jnp.broadcast_to(k0 + k1, sample_ids.shape),
    )
    return jnp.stack(
        [_to_unit(a, dtype), _to_unit(b, dtype), _to_unit(c, dtype),
         _to_unit(d, dtype)],
        axis=-1,
    )
