"""Conversion pipeline: batched point streams -> multi-hierarchy cell store."""

from .converter import (  # noqa: F401
    Converter,
    add_points_to_cell,
    convert_from_paths,
    load_metadata,
)
from .pipeline import group_points_host, merge_point_maps  # noqa: F401


def __getattr__(name):
    # lazy: importing these pulls in jax (and the native build)
    if name == "DeviceConverter":
        from .device import DeviceConverter

        return DeviceConverter
    if name == "NativeDeviceConverter":
        from .native_device import NativeDeviceConverter

        return NativeDeviceConverter
    raise AttributeError(name)
