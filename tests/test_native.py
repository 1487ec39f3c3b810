"""Native C++ runtime parity tests: the kernels must be bit-identical to
the NumPy reference paths (skipped when no toolchain is available)."""

import numpy as np
import pytest

from point_cloud_tpu.native import (
    AsyncStoreWriter,
    bbox_f32_native,
    hex_keys_native,
    load_native,
    read_file_native,
    staging_sort_native,
)

needs_native = pytest.mark.skipif(
    load_native() is None, reason="native toolchain unavailable"
)


@needs_native
class TestHexKeysParity:
    @pytest.mark.parametrize("seed,lo,hi", [
        (1, -500.0, 500.0),
        (2, -3.0, 3.0),
        (3, -1e6, 1e6),
        (4, -0.01, 0.01),
    ])
    def test_bit_identical_to_numpy(self, seed, lo, hi):
        from point_cloud_tpu.core import hex as hexgrid
        from point_cloud_tpu.core.metadata import MetadataConfig
        from point_cloud_tpu.ops.dedup import host_keys

        rng = np.random.default_rng(seed)
        pos = rng.uniform(lo, hi, (20_000, 3)).astype(np.float32)
        # sprinkle adversarial values
        pos[0] = [0.0, -0.0, 0.0]
        pos[1] = [np.nextafter(np.float32(0), np.float32(1)), 1e-30, -1e-30]

        config = MetadataConfig()
        cell_size = np.float32(config.cell_size(2))
        sub = np.float32(config.sub_cell_size(cell_size))
        exp_cell, exp_sub, exp_dist = host_keys(pos, cell_size, sub)
        exp_next = config.cell_index(
            pos, np.float32(cell_size / np.float32(2.0))
        )
        out = hex_keys_native(
            pos, cell_size, np.float32(sub / np.float32(2.0)),
            np.float32(cell_size / np.float32(2.0)),
        )
        cell_idx, sub_idx, dist, next_idx = out
        np.testing.assert_array_equal(cell_idx, exp_cell)
        np.testing.assert_array_equal(sub_idx, exp_sub)
        np.testing.assert_array_equal(
            dist.view(np.int32), exp_dist.view(np.int32)
        )
        np.testing.assert_array_equal(next_idx, exp_next)

    def test_saturation_and_nan(self):
        from point_cloud_tpu.core.metadata import MetadataConfig
        from point_cloud_tpu.ops.dedup import host_keys

        pos = np.array(
            [
                [np.nan, 1e38, -1e38],
                [np.inf, -np.inf, 0.0],
                [3e9, -3e9, 2147483648.0],
            ],
            np.float32,
        )
        config = MetadataConfig()
        cell_size = np.float32(1.0)
        sub = np.float32(config.sub_cell_size(cell_size))
        exp_cell, exp_sub, exp_dist = host_keys(pos, cell_size, sub)
        out = hex_keys_native(
            pos, cell_size, np.float32(sub / np.float32(2.0)),
            np.float32(0.5),
        )
        np.testing.assert_array_equal(out[0], exp_cell)
        np.testing.assert_array_equal(out[1], exp_sub)
        # the distance decides dedup winners: bit-compare it too (NaNs
        # compare equal as bit patterns)
        np.testing.assert_array_equal(
            out[2].view(np.uint32),
            exp_dist.astype(np.float32).view(np.uint32),
        )


@needs_native
class TestBboxF32:
    """pc_bbox_f32 must be bit-identical to positions.min/max(axis=0) —
    it feeds the metadata bounding-box fold shared by every converter
    (core/aabb.py Aabb.from_points)."""

    @pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 12, 13, 4096, 100001])
    def test_bit_parity(self, n):
        rng = np.random.default_rng(n)
        pos = np.concatenate([
            rng.uniform(-1e6, 1e6, (max(n // 2, 1), 3)),
            rng.normal(0, 1e-30, (n, 3)),  # denormal-scale values
        ])[:n].astype(np.float32)
        if n >= 4:
            pos[n // 2] = [np.inf, -np.inf, 1.0]  # infinities are exact
        got = bbox_f32_native(np.ascontiguousarray(pos))
        assert got is not None
        ref = (pos.min(axis=0), pos.max(axis=0))
        assert np.array_equal(got[0].view(np.uint32), ref[0].view(np.uint32))
        assert np.array_equal(got[1].view(np.uint32), ref[1].view(np.uint32))

    def test_nan_falls_back(self):
        pos = np.zeros((1000, 3), np.float32) + 1.0
        pos[500, 1] = np.nan
        assert bbox_f32_native(pos) is None

    def test_zero_extremum_falls_back(self):
        # min(-0.0, +0.0) is order-dependent even inside NumPy's reduce;
        # a zero extremum must defer to NumPy (Aabb.from_points falls
        # back), so the ambiguity never reaches metadata.json
        pos = np.ones((1000, 3), np.float32)
        pos[3, 2] = -0.0
        assert bbox_f32_native(pos) is None

    def test_from_points_routes_large_batches(self):
        from point_cloud_tpu.core.aabb import Aabb

        rng = np.random.default_rng(9)
        pos = rng.uniform(-500, 500, (8192, 3)).astype(np.float32)
        box = Aabb.from_points(pos)
        assert np.array_equal(box.min, pos.min(axis=0))
        assert np.array_equal(box.max, pos.max(axis=0))


@needs_native
class TestStagingSort:
    def test_matches_lexsort(self):
        rng = np.random.default_rng(9)
        n = 50_000
        cell_key = rng.integers(0, 50, n).astype(np.int64)
        next_key = rng.integers(0, 200, n).astype(np.int64)
        pos_bits = rng.integers(-(2**31), 2**31, (n, 3)).astype(np.int32)
        color_key = rng.integers(0, 2**32, n).astype(np.uint32)
        order = staging_sort_native(cell_key, next_key, pos_bits, color_key)
        expected = np.lexsort(
            (color_key, pos_bits[:, 2], pos_bits[:, 1], pos_bits[:, 0],
             next_key, cell_key)
        )
        # rows with fully identical keys are interchangeable; compare keys
        for arr in (cell_key, next_key, color_key):
            np.testing.assert_array_equal(arr[order], arr[expected])
        np.testing.assert_array_equal(pos_bits[order], pos_bits[expected])


@needs_native
class TestAsyncWriter:
    def test_native_writer_used_and_atomic(self, tmp_path):
        writer = AsyncStoreWriter(2)
        assert writer.native
        for i in range(50):
            writer.submit(tmp_path / f"f{i}.bin", bytes([i]) * 1000)
        assert writer.flush() == 0
        for i in range(50):
            assert (tmp_path / f"f{i}.bin").read_bytes() == bytes([i]) * 1000
        assert list(tmp_path.glob("*.tmp")) == []
        writer.close()

    def test_read_file_native(self, tmp_path):
        p = tmp_path / "x.bin"
        p.write_bytes(b"hello world")
        assert read_file_native(p) == b"hello world"
        assert read_file_native(tmp_path / "missing") is None


def test_tsan_stress():
    """Race-detection run (SURVEY.md section 5): the native runtime's
    concurrency (I/O pool submit/flush races, engine sharded inserts +
    parallel save) must pass ThreadSanitizer cleanly. Skipped when the
    toolchain lacks libtsan."""
    import subprocess
    import tempfile
    from pathlib import Path

    root = Path(__file__).resolve().parents[1] / "native"
    with tempfile.TemporaryDirectory() as tmp:
        binary = f"{tmp}/pc_stress"
        build = subprocess.run(
            ["g++", "-fsanitize=thread", "-O1", "-g", "-std=c++17",
             "-pthread", "-ffp-contract=off",
             str(root / "pc_stress_test.cpp"), str(root / "pc_native.cpp"),
             str(root / "pc_engine.cpp"), str(root / "pc_laszip.cpp"),
             "-o", binary],
            capture_output=True, text=True, timeout=180,
        )
        if build.returncode != 0:
            pytest.skip(f"no TSAN toolchain: {build.stderr[-200:]}")
        run = subprocess.run(
            [binary], capture_output=True, text=True, timeout=300,
            env={"TSAN_OPTIONS": "halt_on_error=1", "PATH": "/usr/bin"},
        )
        assert run.returncode == 0, (run.stdout + run.stderr)[-2000:]
        assert "STRESS_OK" in run.stdout
        assert "ThreadSanitizer" not in run.stderr
