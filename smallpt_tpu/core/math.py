"""Gradient-safe math helpers.

``jnp.sqrt(jnp.maximum(x, 0))`` produces NaN cotangents where x < 0
(0-cotangent x inf-derivative at sqrt(0)); since the wavefront evaluates all
BSDF branches on all lanes and selects with masks, such lanes are ubiquitous
and would poison scene-parameter gradients. These helpers keep both primal
and tangent finite on the masked-off side.
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_sqrt(x, min_val: float = 0.0):
    """sqrt(max(x, min_val)) with zero (not NaN) gradient where x <= min_val."""
    ok = x > min_val
    return jnp.where(ok, jnp.sqrt(jnp.where(ok, x, 1.0)), min_val)


def safe_normalize(v, axis: int = -1):
    """v / |v| with finite gradients at |v| ~ 0 (returns v unchanged there)."""
    n2 = jnp.sum(v * v, axis=axis, keepdims=True)
    ok = n2 > 1e-24
    inv = jnp.where(ok, 1.0 / jnp.sqrt(jnp.where(ok, n2, 1.0)), 1.0)
    return v * inv


def safe_div(a, b, fallback=0.0):
    """a / b with `fallback` (and zero gradient) where b == 0."""
    ok = b != 0
    return jnp.where(ok, a / jnp.where(ok, b, 1.0), fallback)
