"""Model registry: the framework's flagship compute pipelines.

The reference is a data framework, not an ML stack — its "models" are the
two production pipelines, and this package names them for orchestration
(the driver's entry point binds to CONVERSION):

- ``CONVERSION`` — the batched hex-dedup cascade
  (ops/dedup.py + convert/device.py): quantize -> multi-key sort ->
  segmented argmin -> LSM merge -> overflow cascade. Flagship jittable
  step: :func:`point_cloud_tpu.ops.dedup.dedup_pass`.
- ``FRAME`` — the per-frame render pipeline (render/kernel.py +
  render/splat.py): project -> cull -> LOD walk -> occlusion -> splat
  rasterize. Flagship jittable step:
  :func:`point_cloud_tpu.render.kernel.cull_lod_pass`.
"""

from ..ops.dedup import dedup_pass as conversion_step  # noqa: F401
from ..render.kernel import cull_lod_pass as frame_step  # noqa: F401

PIPELINES = {
    "conversion": "point_cloud_tpu.ops.dedup.dedup_pass",
    "frame": "point_cloud_tpu.render.kernel.cull_lod_pass",
}
