"""Scaled end-to-end integration (BASELINE config 1 shape).

Default size keeps CI fast; set PCT_SCALE_POINTS=1000000 to run the full
1M-point configuration. Exercises: PLY write -> CLI-equivalent conversion
on both the host and device pipelines -> byte-identical stores -> own-
format re-read returns every point.
"""

import os

import numpy as np
import pytest

from point_cloud_tpu.convert.converter import Converter
from point_cloud_tpu.convert.device import DeviceConverter
from point_cloud_tpu.core.cell import Cell
from point_cloud_tpu.core.metadata import Metadata
from point_cloud_tpu.core.point import PointBatch
from point_cloud_tpu.io import get_batched_point_reader
from point_cloud_tpu.io.ply import write_ply

N_POINTS = int(os.environ.get("PCT_SCALE_POINTS", "120000"))


def lidar_like(n, seed=80):
    rng = np.random.default_rng(seed)
    ground = np.empty((n // 2, 3), np.float32)
    ground[:, :2] = rng.uniform(-150, 150, (n // 2, 2))
    ground[:, 2] = rng.normal(0, 0.2, n // 2)
    rest = rng.uniform(-150, 150, (n - n // 2, 3)).astype(np.float32)
    rest[:, 2] = np.abs(rest[:, 2]) * 0.2
    pos = np.concatenate([ground, rest])
    col = rng.integers(0, 256, (n, 4), dtype=np.uint8)
    col[:, 3] = 255
    return PointBatch(pos, col)


@pytest.fixture(scope="module")
def source_file(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("scale")
    batch = lidar_like(N_POINTS)
    path = tmp / "cloud.ply"
    write_ply(path, batch)
    return path


class TestScale:
    def test_host_and_device_stores_byte_identical(self, tmp_path, source_file):
        batch_size = 50_000
        for cls, name in [(Converter, "host"), (DeviceConverter, "dev")]:
            reader = get_batched_point_reader(source_file)
            with cls(Metadata(), tmp_path / name) as conv:
                while reader.remaining_points() > 0:
                    conv.add_points_batch(reader.get_batch(batch_size))

        host_files = {
            p.relative_to(tmp_path / "host"): p.read_bytes()
            for p in sorted((tmp_path / "host").rglob("*")) if p.is_file()
        }
        dev_files = {
            p.relative_to(tmp_path / "dev"): p.read_bytes()
            for p in sorted((tmp_path / "dev").rglob("*")) if p.is_file()
        }
        assert set(host_files) == set(dev_files)
        mismatches = [
            str(k) for k in host_files if host_files[k] != dev_files[k]
        ]
        assert mismatches == []

        metadata = Metadata.from_path(tmp_path / "host" / "metadata.json")
        assert metadata.number_of_points == N_POINTS

        # store invariants at scale
        total = 0
        for h in range(metadata.hierarchies):
            hdir = tmp_path / "host" / f"h_{h}"
            if not hdir.exists():
                continue
            for p in hdir.iterdir():
                cell = Cell.from_path(p)
                assert cell.total_number_of_points == (
                    cell.number_of_points + cell.number_of_overflow_points
                )
                total += cell.total_number_of_points
        assert total == N_POINTS

        # own-format re-read returns every point
        reader = get_batched_point_reader(tmp_path / "host" / "metadata.json")
        got = sum(len(reader.get_batch(100_000))
                  for _ in range(N_POINTS // 100_000 + 2))
        assert got == N_POINTS
