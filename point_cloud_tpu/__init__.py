"""point_cloud_tpu — a TPU-native point-cloud conversion + rendering framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
Seiichi-Yahiro/point-cloud Rust workspace (reference studied at
/root/reference): a LAS/LAZ/PLY -> multi-hierarchy cell-store converter with
incremental merge, plus a streaming LOD point renderer.

Layer map (mirrors SURVEY.md section 1, re-architected TPU-first):

- ``core``     — data model: hex-prism sub-grid math, AABB, Point/Cell binary
                 codec, metadata.json codec (byte-compatible with the
                 reference's serde_json output).
- ``io``       — batched point readers (PLY ascii/binary, LAS, own-format).
- ``ops``      — JAX device kernels: vectorized hex quantization, composite
                 key sort, segmented dedup/argmin, AABB reductions.
- ``convert``  — the conversion pipeline (device batch dedup + host cell
                 store with overflow cascade + incremental merge) and CLI.
- ``render``   — camera/frustum math, the fused cull+LOD+project kernel, and
                 a TPU splat rasterizer.
- ``parallel`` — jax.sharding Mesh / shard_map scale-out of conversion.
- ``utils``    — streaming control plane: sorted hash priority queue, asset
                 manager (refcount, negative cache), thread pool.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (importing the package stays light)."""
    if name in ("Converter", "convert_from_paths", "load_metadata"):
        from . import convert

        return getattr(convert, name)
    if name == "DeviceConverter":
        from .convert.device import DeviceConverter

        return DeviceConverter
    if name == "PipelinedConverter":
        from .convert.pipelined import PipelinedConverter

        return PipelinedConverter
    if name == "MeshConverter":
        from .parallel.mesh_converter import MeshConverter

        return MeshConverter
    if name in ("Viewer", "ViewerInput"):
        from . import viewer

        return getattr(viewer, name)
    if name == "Metadata":
        from .core.metadata import Metadata

        return Metadata
    if name == "PointBatch":
        from .core.point import PointBatch

        return PointBatch
    raise AttributeError(name)
