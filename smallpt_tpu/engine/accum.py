"""Weighted accumulation buffers — the reference's unused RenderOutputs
capability (smallpt.cpp:644-674), made first-class.

RenderOutputs pairs a color accumulator with a per-pixel filter-weight
accumulator so the displayed image is sum(w_i * c_i) / sum(w_i) — exact
progressive reconstruction even when per-pixel sample counts or filter
weights are heterogeneous. The reference never instantiates it (its live
path divides by a global sampleCount, smallpt.cpp:957); here it is the
accumulation structure for:

- heterogeneous sharding: tiles/shards contributing different sample counts
  per pixel (the psum of (color, weight) pairs stays exact);
- splatting filters with non-unit importance weights;
- adaptive sampling (more samples where variance is high).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class WeightedAccum(NamedTuple):
    """(color, weight) accumulator pair (RenderOutputs.m_Colors /
    m_SampleWeights, smallpt.cpp:648-651)."""

    color: jnp.ndarray   # (H, W, 3) sum of weight * radiance
    weight: jnp.ndarray  # (H, W) sum of filter weights

    @classmethod
    def zeros(cls, height: int, width: int, dtype=jnp.float32):
        return cls(
            color=jnp.zeros((height, width, 3), dtype),
            weight=jnp.zeros((height, width), dtype),
        )

    def add(self, radiance: jnp.ndarray, weight=None) -> "WeightedAccum":
        """Accumulate one pass. radiance: (H, W, 3) weighted radiance sums;
        weight: per-pixel weight sums (scalar or (H, W)); default 1 per
        accumulated unit (the RenderOutputs.accumulate contract,
        smallpt.cpp:656-663)."""
        if weight is None:
            weight = 1.0
        w = jnp.broadcast_to(jnp.asarray(weight, self.weight.dtype),
                             self.weight.shape)
        return WeightedAccum(self.color + radiance, self.weight + w)

    def normalized(self, eps: float = 0.0) -> jnp.ndarray:
        """sum(w*c)/sum(w) (RenderOutputs::getColor, smallpt.cpp:665-670);
        pixels with zero weight return 0."""
        w = self.weight[..., None]
        safe = jnp.where(w > eps, w, 1.0)
        return jnp.where(w > eps, self.color / safe, 0.0)


@jax.jit
def normalize_weighted(color: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Device-side display normalization: color / max(weight, 1), zero where
    weight == 0. The reference normalizes in the blit shader (uWeight,
    glutils.cpp:252) — i.e. on the GPU; dividing in host numpy costs real
    milliseconds at 4K, so display normalization stays on device and only
    the final 8-bit-ready image crosses to the host."""
    w = weight[..., None]
    return jnp.where(w > 0, color / jnp.maximum(w, 1.0), 0.0)
