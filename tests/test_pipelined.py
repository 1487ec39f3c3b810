"""Wavefront-pipelined converter: byte parity + ordering under concurrency."""

import numpy as np
import pytest

from point_cloud_tpu.convert.converter import Converter
from point_cloud_tpu.convert.pipelined import PipelinedConverter
from point_cloud_tpu.core.metadata import Metadata, MetadataConfig
from point_cloud_tpu.core.point import PointBatch


def random_batch(n, seed, lo=-100, hi=100):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    col = rng.integers(0, 256, (n, 4), dtype=np.uint8)
    col[:, 3] = 255
    return PointBatch(pos, col)


def store_files(store_dir):
    return {
        str(p.relative_to(store_dir)): p.read_bytes()
        for p in sorted(store_dir.rglob("*"))
        if p.is_file()
    }


class TestPipelinedParity:
    @pytest.mark.parametrize(
        "name,n_batches,n,kwargs,config",
        [
            ("sparse", 6, 8_000, dict(lo=-300, hi=300), MetadataConfig()),
            ("dense", 5, 10_000, dict(lo=-2, hi=2), MetadataConfig()),
            (
                "overflow",
                4,
                4_000,
                dict(lo=-0.5, hi=0.5),
                MetadataConfig(cell_point_overflow_limit=40),
            ),
        ],
    )
    def test_store_byte_identical_to_host(self, tmp_path, name, n_batches,
                                          n, kwargs, config):
        import dataclasses

        batches = [
            random_batch(n, seed=1000 + i, **kwargs) for i in range(n_batches)
        ]
        with Converter(Metadata(config=dataclasses.replace(config)),
                       tmp_path / "host") as conv:
            for b in batches:
                conv.add_points_batch(b)
        with PipelinedConverter(Metadata(config=dataclasses.replace(config)),
                                tmp_path / "pipe") as conv:
            for b in batches:
                conv.add_points_batch(b)

        host_files = store_files(tmp_path / "host")
        pipe_files = store_files(tmp_path / "pipe")
        assert set(host_files) == set(pipe_files)
        mismatches = [k for k in host_files if host_files[k] != pipe_files[k]]
        assert mismatches == []

    def test_repeated_runs_are_deterministic(self, tmp_path):
        batches = [random_batch(6_000, seed=2000 + i, lo=-5, hi=5)
                   for i in range(5)]
        stores = []
        for run in range(2):
            out = tmp_path / f"run{run}"
            with PipelinedConverter(Metadata(), out) as conv:
                for b in batches:
                    conv.add_points_batch(b)
            stores.append(store_files(out))
        assert stores[0] == stores[1]

    def test_error_propagates(self, tmp_path):
        conv = PipelinedConverter(Metadata(), tmp_path)
        bad = PointBatch(np.zeros((10, 3), np.float32))
        conv.add_points_batch(bad)
        conv.close()  # clean path works

    def test_incremental_merge(self, tmp_path):
        from point_cloud_tpu.convert.converter import load_metadata

        a = random_batch(5_000, seed=3000)
        b = random_batch(5_000, seed=3001, lo=-150, hi=150)
        for cls, d in [(Converter, "host"), (PipelinedConverter, "pipe")]:
            out = tmp_path / d
            with cls(load_metadata(out), out) as conv:
                conv.add_points_batch(a)
            with cls(load_metadata(out), out) as conv:
                conv.add_points_batch(b)
        assert store_files(tmp_path / "host") == store_files(tmp_path / "pipe")
