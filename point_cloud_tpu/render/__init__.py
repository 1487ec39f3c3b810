"""Renderer: camera math, streaming control plane, and the TPU frame kernels.

TPU-native re-design of the reference renderer's hot path (reference:
src/plugins/render/point/*, src/plugins/cell.rs, src/plugins/camera*):
the per-cell WGSL compute dispatch + indirect splat draw becomes a fused
JAX cull+LOD+occlusion kernel over all loaded points (render/kernel.py) and
a scatter-based splat rasterizer (render/splat.py); the per-frame ECS
streaming systems become vectorized set arithmetic (render/streaming.py).
"""

from .camera import Camera, Frustum, PerspectiveProjection  # noqa: F401
from .transform import Transform  # noqa: F401
