"""Camera-path animation + CLI mesh smoke tests."""

import jax
import numpy as np
import pytest

from point_cloud_tpu.convert.converter import Converter
from point_cloud_tpu.core.metadata import Metadata
from point_cloud_tpu.core.point import PointBatch


def make_store(tmp_path, n=8_000):
    rng = np.random.default_rng(50)
    pos = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    col = rng.integers(0, 256, (n, 4), dtype=np.uint8)
    with Converter(Metadata(), tmp_path) as conv:
        conv.add_points_batch(PointBatch(pos, col))


class TestOrbit:
    def test_render_orbit_produces_frames(self, tmp_path):
        from point_cloud_tpu.render.renderer import RenderSettings
        from point_cloud_tpu.viewer import Viewer
        from point_cloud_tpu.viewer.offscreen import render_orbit

        make_store(tmp_path / "store")
        viewer = Viewer(RenderSettings(width=64, height=48))
        viewer.load_metadata(tmp_path / "store" / "metadata.json")
        frames = render_orbit(viewer, tmp_path / "frames", n_frames=3)
        assert len(frames) == 3
        for f in frames:
            assert f.exists() and f.stat().st_size > 100
        viewer.close()


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")
class TestCliMesh:
    def test_cli_mesh_converts(self, tmp_path):
        from point_cloud_tpu.convert.cli import main
        from point_cloud_tpu.io.ply import write_ply

        rng = np.random.default_rng(51)
        pos = rng.uniform(-50, 50, (20_000, 3)).astype(np.float32)
        write_ply(tmp_path / "c.ply", PointBatch(pos))
        assert main(
            ["-o", str(tmp_path / "out"), "-f", str(tmp_path / "c.ply"),
             "--mesh", "8", "--batch-size", "20000"]
        ) == 0
        metadata = Metadata.from_path(tmp_path / "out" / "metadata.json")
        assert metadata.number_of_points == 20_000
