"""Failure handling / crash-resume tests (SURVEY.md section 5).

The store itself is the checkpoint: conversion is resumable because the
converter merges into whatever is on disk (reference:
point-converter/src/lib.rs:86-101); readers skip corrupt cells (own.rs
error paths); the renderer negative-caches missing cells and survives
load errors.
"""

import os
from pathlib import Path

import numpy as np
import pytest

from point_cloud_tpu.convert.converter import Converter, load_metadata
from point_cloud_tpu.core.cell import Cell
from point_cloud_tpu.core.metadata import Metadata
from point_cloud_tpu.core.point import PointBatch


def random_batch(n, seed=0, lo=-50, hi=50):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    col = rng.integers(0, 256, (n, 4), dtype=np.uint8)
    col[:, 3] = 255
    return PointBatch(pos, col)


class TestCrashResume:
    def test_interrupted_conversion_resumes_by_merge(self, tmp_path):
        """Simulate a crash mid-conversion: first half saved, then a new
        converter merges the second half into the existing store."""
        batch = random_batch(10_000, seed=40)
        conv = Converter(Metadata(), tmp_path)
        conv.add_points_batch(batch[:5_000])
        conv.close()  # flush ("crash" after this point)

        # resume: load existing metadata, merge the rest
        with Converter(load_metadata(tmp_path), tmp_path) as conv2:
            conv2.add_points_batch(batch[5_000:])

        metadata = Metadata.from_path(tmp_path / "metadata.json")
        assert metadata.number_of_points == 10_000
        total = 0
        for h in range(metadata.hierarchies):
            hdir = tmp_path / f"h_{h}"
            if hdir.exists():
                for p in hdir.iterdir():
                    total += Cell.from_path(p).total_number_of_points
        assert total == 10_000

    def test_async_writer_leaves_no_partial_files(self, tmp_path):
        """Atomic tmp+rename writes: no .tmp leftovers after close and all
        cell files parse."""
        with Converter(Metadata(), tmp_path, cache_size=2) as conv:
            for i in range(4):
                conv.add_points_batch(
                    random_batch(3_000, seed=41 + i, lo=-200, hi=200)
                )
        leftovers = list(tmp_path.rglob("*.tmp"))
        assert leftovers == []
        for h_dir in tmp_path.glob("h_*"):
            for p in h_dir.iterdir():
                Cell.from_path(p)  # must parse


class TestReaderFaults:
    def test_own_reader_skips_corrupt_cells(self, tmp_path):
        from point_cloud_tpu.io.own import PointCloudPointReader

        with Converter(Metadata(), tmp_path) as conv:
            conv.add_points_batch(random_batch(5_000, seed=42))
        # corrupt one cell file
        victim = next((tmp_path / "h_0").iterdir())
        victim.write_bytes(b"\x00\x01garbage")
        reader = PointCloudPointReader(tmp_path / "metadata.json")
        got = 0
        while reader.remaining_points() > 0:
            batch = reader.get_batch(1_000)
            if len(batch) == 0:
                break
            got += len(batch)
        # the corrupt cell's points are lost but reading continues
        assert 0 < got <= 5_000

    def test_truncated_las_header_raises_cleanly(self, tmp_path):
        from point_cloud_tpu.io.las import LasPointReader

        bad = tmp_path / "bad.las"
        bad.write_bytes(b"LASF" + b"\x00" * 50)
        with pytest.raises(Exception):
            LasPointReader(bad)

    def test_non_ply_magic_rejected(self, tmp_path):
        from point_cloud_tpu.io.ply import PlyPointReader

        bad = tmp_path / "bad.ply"
        bad.write_bytes(b"nope\n")
        with pytest.raises(ValueError):
            PlyPointReader(bad)


class TestViewerFaults:
    def test_cell_parser_fuzz_agreement(self, tmp_path):
        """Truncations and random byte flips of a cell file must never
        crash either parser, and the Python codec (Cell.from_bytes) and
        the C++ engine (parse_cell via pc_engine_load_cell) must agree
        on accept/reject — divergence here would let one backend read a
        store another refuses (or worse, read it differently)."""
        import ctypes

        from point_cloud_tpu.core.cell import Cell, CellId
        from point_cloud_tpu.core.metadata import MetadataConfig
        from point_cloud_tpu.native import load_native

        lib = load_native()
        if lib is None:
            pytest.skip("no C++ toolchain")

        config = MetadataConfig()
        rng = np.random.default_rng(3)
        cell_size = np.float32(config.cell_size(0))
        sub = np.float32(config.sub_cell_size(cell_size))
        pos0 = config.cell_pos(np.zeros((1, 3), np.int32), cell_size)[0]
        cell = Cell(CellId(0, (0, 0, 0)), sub, cell_size, pos0)
        cell.add_points(PointBatch(
            rng.uniform(0, 400, (2000, 3)).astype(np.float32),
            rng.integers(0, 256, (2000, 4)).astype(np.uint8),
        ))
        data = bytearray(cell.to_bytes())

        def py_parses(buf):
            try:
                Cell.from_bytes(bytes(buf))
                return True
            except Exception:
                return False

        def native_parses(buf):
            eng = lib.pc_engine_create(5000, ctypes.c_float(1000.0), 96, 1)
            try:
                return lib.pc_engine_load_cell(
                    eng, bytes(buf), len(buf)
                ) == 0
            finally:
                lib.pc_engine_destroy(eng)

        assert py_parses(data) and native_parses(data)
        cases = [data[:cut] for cut in
                 list(range(0, 120, 7)) + [len(data) // 2, len(data) - 1]]
        for _ in range(120):
            buf = bytearray(data)
            for _ in range(int(rng.integers(1, 6))):
                buf[int(rng.integers(0, len(buf)))] ^= (
                    1 << int(rng.integers(0, 8))
                )
            cases.append(buf)
        for buf in cases:
            assert py_parses(buf) == native_parses(buf)

    def test_corrupt_cell_load_does_not_crash_streaming(self, tmp_path):
        from point_cloud_tpu.render.renderer import RenderSettings
        from point_cloud_tpu.viewer import Viewer

        with Converter(Metadata(), tmp_path) as conv:
            conv.add_points_batch(random_batch(10_000, seed=43))
        # corrupt every other h_0 cell
        cells = sorted((tmp_path / "h_0").iterdir())
        for p in cells[::2]:
            p.write_bytes(b"bad")

        viewer = Viewer(RenderSettings(width=48, height=48))
        viewer.load_metadata(tmp_path / "metadata.json")
        import time

        for _ in range(400):
            viewer.update()
            if (
                not viewer.streamer.loading
                and len(viewer.streamer.should_load) == 0
                and not viewer.cell_assets._loading
            ):
                break
            time.sleep(0.005)
        rgb, depth, _ = viewer.render()  # must not raise
        assert rgb.shape == (48, 48, 3)
        viewer.close()


class TestUnderDeliveringSource:
    def test_convert_from_paths_does_not_spin(self, tmp_path):
        """A store whose metadata over-counts points must not hang the
        converter driver (truncated/corrupt store)."""
        from point_cloud_tpu.convert.converter import convert_from_paths
        from point_cloud_tpu.core.metadata import Metadata as Md

        with Converter(Metadata(), tmp_path / "src") as conv:
            conv.add_points_batch(random_batch(2_000, seed=90))
        # corrupt the count upward: reader will under-deliver
        metadata = Md.from_path(tmp_path / "src" / "metadata.json")
        metadata.number_of_points = 5_000
        metadata.write_to_path(tmp_path / "src" / "metadata.json")

        convert_from_paths(
            [tmp_path / "src" / "metadata.json"], tmp_path / "out",
            batch_size=1_000,
        )  # must terminate
        out_meta = Md.from_path(tmp_path / "out" / "metadata.json")
        assert out_meta.number_of_points == 2_000


class TestMidFileReaderFault:
    def test_read_batches_survive_a_midfile_reader_error(self, tmp_path):
        """A reader raising mid-file must cost only the unread tail:
        every successfully parsed batch — including the prefetch path's
        in-flight one — lands in the store, and the NEXT file still
        converts (per-file failure handling, converter.rs:288-312)."""
        from point_cloud_tpu.convert.converter import convert_from_paths
        from point_cloud_tpu.core.metadata import Metadata as Md
        from point_cloud_tpu.io.ply import write_ply

        good = random_batch(1_500, seed=91)
        write_ply(tmp_path / "good.ply", good)
        flaky = random_batch(3_000, seed=92)
        write_ply(tmp_path / "flaky.ply", flaky)

        from point_cloud_tpu import io as io_mod

        orig = io_mod.get_batched_point_reader

        class FlakyReader:
            def __init__(self, inner):
                self.inner = inner
                self.calls = 0

            def get_batch(self, size):
                self.calls += 1
                if self.calls > 2:  # two good batches, then die
                    raise ValueError("decoder exploded mid-file")
                return self.inner.get_batch(size)

            def total_points(self):
                return self.inner.total_points()

            def remaining_points(self):
                return self.inner.remaining_points()

        def patched(path):
            reader = orig(path)
            if Path(path).name == "flaky.ply":
                return FlakyReader(reader)
            return reader

        io_mod.get_batched_point_reader = patched
        try:
            convert_from_paths(
                [tmp_path / "flaky.ply", tmp_path / "good.ply"],
                tmp_path / "out", batch_size=1_000,
            )
        finally:
            io_mod.get_batched_point_reader = orig

        out_meta = Md.from_path(tmp_path / "out" / "metadata.json")
        # 2 batches of flaky.ply (2,000 points) + all of good.ply
        assert out_meta.number_of_points == 2_000 + 1_500


class TestConverterCloseIdempotent:
    def test_double_close_is_safe(self, tmp_path):
        conv = Converter(Metadata(), tmp_path)
        conv.add_points_batch(random_batch(500, seed=93))
        conv.close()
        conv.close()  # second close: no writer resubmission
        with conv:  # context-manager exit after explicit close
            pass
        from point_cloud_tpu.core.metadata import Metadata as Md

        meta = Md.from_path(tmp_path / "metadata.json")
        assert meta.number_of_points == 500


class TestWedgedAccelerator:
    def test_cli_device_falls_back_when_unreachable(self, tmp_path, monkeypatch):
        """--device against an unreachable accelerator must fail over to
        a host backend (byte-identical store) instead of hanging forever
        in PJRT client creation (the wedged-tunnel environment failure
        mode, PERF.md)."""
        from point_cloud_tpu.convert import cli
        from point_cloud_tpu.core.metadata import Metadata as Md
        from point_cloud_tpu.io.ply import write_ply
        from point_cloud_tpu.ops import runtime

        batch = random_batch(3_000, seed=91)
        src = tmp_path / "cloud.ply"
        write_ply(src, batch)

        monkeypatch.setattr(runtime, "device_reachable", lambda *a: False)
        rc = cli.main(["-o", str(tmp_path / "dev"), "-f", str(src),
                       "--device"])
        assert rc == 0
        meta = Md.from_path(tmp_path / "dev" / "metadata.json")
        assert meta.number_of_points == 3_000

        # byte parity with the host oracle store
        with Converter(Metadata(), tmp_path / "host") as conv:
            conv.add_points_batch(batch)
        import filecmp

        cmp = filecmp.dircmp(tmp_path / "dev", tmp_path / "host")
        assert not cmp.diff_files and not cmp.left_only and not cmp.right_only

    def test_cli_multihost_refuses_when_unreachable(self, tmp_path, monkeypatch):
        from point_cloud_tpu.convert import cli
        from point_cloud_tpu.io.ply import write_ply
        from point_cloud_tpu.ops import runtime

        src = tmp_path / "cloud.ply"
        write_ply(src, random_batch(100, seed=92))
        monkeypatch.setattr(runtime, "device_reachable", lambda *a: False)
        rc = cli.main(["-o", str(tmp_path / "out"), "-f", str(src),
                       "--mesh", "2", "--multihost"])
        assert rc == 1
        assert not (tmp_path / "out" / "metadata.json").exists()


class TestPlatformPin:
    def test_setup_jax_cache_keeps_programmatic_pin(self):
        """A process that pins the cpu platform via jax.config must stay
        pinned through setup_jax_cache even when the surrounding
        environment exports JAX_PLATFORMS=<accelerator> (this
        environment exports JAX_PLATFORMS=axon globally; blindly
        re-asserting it undid cpu pins and hung the first dispatch in
        wedged-tunnel PJRT client creation). Runs in a subprocess so
        the config is virgin and no backend gets touched."""
        import subprocess
        import sys

        script = (
            "import os, jax\n"
            "from point_cloud_tpu.ops import runtime\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "runtime.setup_jax_cache()\n"
            "assert jax.config.jax_platforms == 'cpu', "
            "jax.config.jax_platforms\n"
            "print('pin-held')\n"
        )
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "axon"
        env.pop("XLA_FLAGS", None)
        proc = subprocess.run(
            [sys.executable, "-c", script], capture_output=True,
            text=True, timeout=120, env=env,
            cwd=str(Path(__file__).resolve().parent.parent),
        )
        assert proc.returncode == 0, proc.stderr[-800:]
        assert "pin-held" in proc.stdout

    def test_setup_jax_cache_restores_env_over_plugin_override(self):
        """The original purpose stays intact: when the config carries
        the tunnel plugin's own 'axon,cpu' override and the user
        exported JAX_PLATFORMS=cpu, setup_jax_cache restores cpu."""
        import subprocess
        import sys

        script = (
            "import os, jax\n"
            "from point_cloud_tpu.ops import runtime\n"
            "jax.config.update('jax_platforms', 'axon,cpu')\n"  # plugin
            "runtime.setup_jax_cache()\n"
            "assert jax.config.jax_platforms == 'cpu', "
            "jax.config.jax_platforms\n"
            "print('env-restored')\n"
        )
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("XLA_FLAGS", None)
        proc = subprocess.run(
            [sys.executable, "-c", script], capture_output=True,
            text=True, timeout=120, env=env,
            cwd=str(Path(__file__).resolve().parent.parent),
        )
        assert proc.returncode == 0, proc.stderr[-800:]
        assert "env-restored" in proc.stdout
