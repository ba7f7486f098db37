"""smallpt_tpu — a TPU-native, differentiable, progressive wavefront path tracer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``Celeborn2BeAlive/optix-test-smallpt`` (an interactive wavefront evolution of
Kevin Beason's smallpt). The reference's architecture — generate camera rays,
trace, shade, compact, repeat — is re-designed TPU-first:

- static-shape SoA path buffers with alive masks instead of growing vectors
  (reference: ``smallpt.cpp:203-206,800-806``)
- the full generate→trace→shade loop lives in one jitted program
  (``lax.while_loop``) instead of crossing host↔GPU each bounce
  (reference: ``smallpt.cpp:570-582``)
- stateless ``jax.random`` keying by (sample, path-history, depth) replaces
  per-row ``mt19937`` (reference: ``smallpt.cpp:319,740``), giving
  bit-reproducible, placement-invariant sampling
- the OptiX Prime GPU intersector (reference: ``smallpt.cpp:475-603``) maps to
  an MXU-formulated ray×sphere Pallas kernel
- multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map`` with ``psum``
  of per-pixel accumulators (the reference is single-process, single-GPU)
- reverse-mode gradients of pixel radiance w.r.t. scene parameters
  (positions/radii/albedo/emission) via detached-sampling path replay.
"""

from smallpt_tpu.config import (
    RenderConfig, Mode, Filter, CameraModel, Intersector, Scheduler,
)
from smallpt_tpu.core.scene import (
    SphereScene,
    MeshScene,
    Material,
    DIFF,
    SPEC,
    REFR,
)
from smallpt_tpu.core.camera import LegacyCamera, MatrixCamera
from smallpt_tpu.engine.renderer import render, render_image, render_with_stats
from smallpt_tpu.engine.progressive import ProgressiveRenderer
from smallpt_tpu.engine.streaming import StreamingRenderer
from smallpt_tpu.engine.accum import WeightedAccum

__all__ = [
    "RenderConfig",
    "Mode",
    "Filter",
    "CameraModel",
    "Intersector",
    "Scheduler",
    "SphereScene",
    "MeshScene",
    "Material",
    "DIFF",
    "SPEC",
    "REFR",
    "LegacyCamera",
    "MatrixCamera",
    "render",
    "render_image",
    "render_with_stats",
    "ProgressiveRenderer",
    "StreamingRenderer",
    "WeightedAccum",
]

__version__ = "0.2.0"
