"""C++ conversion engine parity: NativeConverter stores must be
byte-identical to the host oracle's (the same gold standard as the device
pipeline, tests/test_device_converter.py)."""

import dataclasses

import zlib
import numpy as np
import pytest

from point_cloud_tpu.convert.converter import Converter, load_metadata
from point_cloud_tpu.core.metadata import Metadata, MetadataConfig
from point_cloud_tpu.core.point import PointBatch


def random_batch(n, seed=0, lo=-100, hi=100):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    col = rng.integers(0, 256, (n, 4), dtype=np.uint8)
    col[:, 3] = 255
    return PointBatch(pos, col)


def store_files(store_dir):
    files = {}
    for path in sorted(store_dir.rglob("*")):
        if path.is_file():
            files[str(path.relative_to(store_dir))] = path.read_bytes()
    return files


def native_converter(*args, **kwargs):
    from point_cloud_tpu.convert.native import NativeConverter

    try:
        return NativeConverter(*args, **kwargs)
    except RuntimeError:
        pytest.skip("no C++ toolchain")


def assert_stores_equal(host_dir, native_dir):
    host_files = store_files(host_dir)
    native_files = store_files(native_dir)
    assert set(host_files) == set(native_files)
    for name, data in host_files.items():
        assert native_files[name] == data, f"mismatch in {name}"


class TestEngineParity:
    @pytest.mark.parametrize(
        "name,n,kwargs,config",
        [
            ("sparse", 10_000, dict(lo=-300, hi=300), MetadataConfig()),
            ("dense", 30_000, dict(lo=-2, hi=2), MetadataConfig()),
            (
                "overflow",
                5_000,
                dict(lo=-0.5, hi=0.5),
                MetadataConfig(cell_point_overflow_limit=40),
            ),
            ("hot_slots", 20_000, dict(lo=-0.05, hi=0.05),
             MetadataConfig(cell_point_overflow_limit=100)),
        ],
    )
    def test_store_byte_identical_to_host(self, tmp_path, name, n, kwargs,
                                          config):
        batch = random_batch(n, seed=zlib.crc32(name.encode()), **kwargs)
        with Converter(Metadata(config=dataclasses.replace(config)),
                       tmp_path / "host") as conv:
            for i in range(0, n, 4_000):
                conv.add_points_batch(batch[i : i + 4_000])
        with native_converter(
            Metadata(config=dataclasses.replace(config)), tmp_path / "nat"
        ) as conv:
            for i in range(0, n, 4_000):
                conv.add_points_batch(batch[i : i + 4_000])
        assert_stores_equal(tmp_path / "host", tmp_path / "nat")

    def test_duplicate_points_and_ties(self, tmp_path):
        """Exact-duplicate floods exercise tie-breaks + deep cascades."""
        base = random_batch(500, seed=5, lo=-3, hi=3)
        batch = PointBatch(
            np.tile(base.positions, (6, 1)),
            np.tile(base.colors, (6, 1)),
        )
        config = MetadataConfig(cell_point_overflow_limit=50)
        with Converter(Metadata(config=dataclasses.replace(config)),
                       tmp_path / "host") as conv:
            conv.add_points_batch(batch)
        with native_converter(
            Metadata(config=dataclasses.replace(config)), tmp_path / "nat"
        ) as conv:
            conv.add_points_batch(batch)
        assert_stores_equal(tmp_path / "host", tmp_path / "nat")

    def test_incremental_merge_parity(self, tmp_path):
        a = random_batch(5_000, seed=21)
        b = random_batch(5_000, seed=22, lo=-150, hi=150)

        for make, d in [
            (Converter, "host"),
            (native_converter, "nat"),
        ]:
            out = tmp_path / d
            with make(load_metadata(out), out) as conv:
                conv.add_points_batch(a)
            with make(load_metadata(out), out) as conv:
                conv.add_points_batch(b)
        assert_stores_equal(tmp_path / "host", tmp_path / "nat")

    def test_cross_backend_merge(self, tmp_path):
        """A store begun by the host oracle continues under the engine."""
        a = random_batch(4_000, seed=31)
        b = random_batch(4_000, seed=32, lo=-50, hi=50)

        out_h = tmp_path / "host"
        with Converter(load_metadata(out_h), out_h) as conv:
            conv.add_points_batch(a)
        with Converter(load_metadata(out_h), out_h) as conv:
            conv.add_points_batch(b)

        out_n = tmp_path / "mixed"
        with Converter(load_metadata(out_n), out_n) as conv:
            conv.add_points_batch(a)
        with native_converter(load_metadata(out_n), out_n) as conv:
            conv.add_points_batch(b)
        assert_stores_equal(out_h, out_n)

    def test_metadata_byte_identical(self, tmp_path):
        batch = random_batch(3_000, seed=41)
        with Converter(Metadata(), tmp_path / "host") as conv:
            conv.add_points_batch(batch)
        with native_converter(Metadata(), tmp_path / "nat") as conv:
            conv.add_points_batch(batch)
        host = (tmp_path / "host" / "metadata.json").read_bytes()
        nat = (tmp_path / "nat" / "metadata.json").read_bytes()
        assert host == nat

    def test_empty_batch(self, tmp_path):
        with native_converter(Metadata(), tmp_path / "nat") as conv:
            conv.add_points_batch(PointBatch.empty())
        assert conv.metadata.number_of_points == 0


class TestEngineThreadedParity:
    """The engine's cell-sharded parallelism must be byte-deterministic:
    deterministic cell ownership + the stable owner partition preserve
    per-cell arrival order (the dedup tie-break), so an n_threads=4 run
    produces the exact bytes of the single-threaded run (this container
    exposes one core, so the default never exercises the threaded
    paths — pin n_threads explicitly)."""

    @pytest.mark.parametrize("n_threads", [2, 4, 8])
    def test_threads_byte_identical(self, tmp_path, n_threads):
        # batches must beat the 2^13-row thread-spawn break-even
        # (pc_engine.cpp run_parallel/run_sharded) or the threaded code
        # never runs; 30k dense rows keep level 1+ above it too
        n = 60_000
        batch = random_batch(n, seed=13, lo=-120, hi=120)
        with native_converter(Metadata(), tmp_path / "t1",
                              n_threads=1) as conv:
            for i in range(0, n, 30_000):
                conv.add_points_batch(batch[i : i + 30_000])
        with native_converter(Metadata(), tmp_path / "tn",
                              n_threads=n_threads) as conv:
            for i in range(0, n, 30_000):
                conv.add_points_batch(batch[i : i + 30_000])
        assert_stores_equal(tmp_path / "t1", tmp_path / "tn")

    def test_threads_incremental_merge_parity(self, tmp_path):
        a = random_batch(20_000, seed=21)
        b = random_batch(20_000, seed=22, lo=-150, hi=150)
        for d, kw in (("t1", {"n_threads": 1}), ("tn", {"n_threads": 4})):
            out = tmp_path / d
            with native_converter(load_metadata(out), out, **kw) as conv:
                conv.add_points_batch(a)
            with native_converter(load_metadata(out), out, **kw) as conv:
                conv.add_points_batch(b)
        assert_stores_equal(tmp_path / "t1", tmp_path / "tn")


class TestEngineLoadCellAbi:
    """pc_engine_load_cell (C-ABI preload from caller bytes): the loaded
    cell must round-trip through save_all even though cells parsed from
    the store's own files are write-skipped when unmodified — the ABI's
    bytes are of unknown provenance, so they are always written."""

    def test_preloaded_cell_is_saved(self, tmp_path):
        import ctypes

        from point_cloud_tpu.native import load_native

        with native_converter(Metadata(), tmp_path / "src") as conv:
            conv.add_points_batch(random_batch(3_000, seed=7))
        src_files = store_files(tmp_path / "src")
        cell_files = {k: v for k, v in src_files.items()
                      if k.endswith(".bin")}
        assert cell_files

        lib = load_native()
        engine = lib.pc_engine_create(5000, ctypes.c_float(1000.0), 96, 1)
        try:
            for data in cell_files.values():
                assert lib.pc_engine_load_cell(engine, data, len(data)) == 0
            out = tmp_path / "out"
            out.mkdir()
            assert lib.pc_engine_save_all(
                engine, str(out).encode(), 1
            ) == 0
        finally:
            lib.pc_engine_destroy(engine)
        out_files = {k: v for k, v in store_files(out).items()
                     if k.endswith(".bin")}
        assert out_files == cell_files


class TestEngineSpilling:
    """Cell spilling: with a tiny in-RAM budget, cold cells evict to the
    store between batches and reload lazily — stores stay byte-identical
    (the engine's analogue of the LRU-converter small-cache tests)."""

    @pytest.mark.parametrize("budget", [2, 8])
    def test_tiny_budget_byte_identical(self, tmp_path, budget):
        n = 20_000
        batch = random_batch(n, seed=99, lo=-300, hi=300)
        with Converter(Metadata(), tmp_path / "host", cache_size=2) as conv:
            for i in range(0, n, 4_000):
                conv.add_points_batch(batch[i : i + 4_000])
        with native_converter(
            Metadata(), tmp_path / "nat", cache_size=budget
        ) as conv:
            for i in range(0, n, 4_000):
                conv.add_points_batch(batch[i : i + 4_000])
        assert_stores_equal(tmp_path / "host", tmp_path / "nat")

    def test_lazy_merge_with_budget(self, tmp_path):
        """Incremental merge works without loading the store up front."""
        a = random_batch(6_000, seed=51)
        b = random_batch(6_000, seed=52, lo=-150, hi=150)
        for make, d, kw in (
            (Converter, "host", {}),
            (native_converter, "nat", {"cache_size": 4}),
        ):
            out = tmp_path / d
            with make(load_metadata(out), out, **kw) as conv:
                conv.add_points_batch(a)
            with make(load_metadata(out), out, **kw) as conv:
                conv.add_points_batch(b)
        assert_stores_equal(tmp_path / "host", tmp_path / "nat")

def native_device_converter(*args, **kwargs):
    from point_cloud_tpu.convert.native_device import NativeDeviceConverter

    try:
        return NativeDeviceConverter(*args, **kwargs)
    except RuntimeError:
        pytest.skip("no C++ toolchain")


class TestNativeDeviceParity:
    """Device dedup pass + C++ merge engine (pc_engine_merge_level):
    stores must stay byte-identical to the host oracle across both the
    per-level device-merge path and the native tail cascade."""

    @pytest.fixture(params=[0, None], ids=["all_device_levels", "default"])
    def threshold(self, request, monkeypatch):
        """0 forces every level (even tiny tails) through merge_level;
        None keeps the default, exercising the cascade_from tail."""
        if request.param is not None:
            from point_cloud_tpu.convert import native_device

            monkeypatch.setattr(
                native_device, "HOST_CASCADE_THRESHOLD", request.param
            )
        return request.param

    @pytest.mark.parametrize(
        "name,n,kwargs,config",
        [
            ("sparse", 10_000, dict(lo=-300, hi=300), MetadataConfig()),
            ("dense", 30_000, dict(lo=-2, hi=2), MetadataConfig()),
            (
                "overflow",
                5_000,
                dict(lo=-0.5, hi=0.5),
                MetadataConfig(cell_point_overflow_limit=40),
            ),
        ],
    )
    def test_store_byte_identical_to_host(self, tmp_path, threshold, name,
                                          n, kwargs, config):
        batch = random_batch(n, seed=zlib.crc32(name.encode()), **kwargs)
        with Converter(Metadata(config=dataclasses.replace(config)),
                       tmp_path / "host") as conv:
            for i in range(0, n, 4_000):
                conv.add_points_batch(batch[i : i + 4_000])
        with native_device_converter(
            Metadata(config=dataclasses.replace(config)), tmp_path / "nd"
        ) as conv:
            for i in range(0, n, 4_000):
                conv.add_points_batch(batch[i : i + 4_000])
        assert_stores_equal(tmp_path / "host", tmp_path / "nd")

    def test_incremental_merge_parity(self, tmp_path, threshold):
        a = random_batch(5_000, seed=21)
        b = random_batch(5_000, seed=22, lo=-150, hi=150)
        for make, d in [(Converter, "host"),
                        (native_device_converter, "nd")]:
            out = tmp_path / d
            with make(load_metadata(out), out) as conv:
                conv.add_points_batch(a)
            with make(load_metadata(out), out) as conv:
                conv.add_points_batch(b)
        assert_stores_equal(tmp_path / "host", tmp_path / "nd")

    def test_forced_collision_suspects_byte_identical(self, tmp_path):
        """Flood the device pass with hash collisions (1-bit hashes) so
        every level carries suspect rows: the engine's C++ re-dedup
        (pc_engine.cpp resolve_suspects) must reproduce the exact winner
        set — the store stays byte-identical to the host oracle."""
        import jax

        import point_cloud_tpu.ops.dedup as dd
        from point_cloud_tpu.convert import native_device

        n = 8_000
        batch = random_batch(n, seed=77, lo=-3, hi=3)
        with Converter(Metadata(), tmp_path / "host") as conv:
            for i in range(0, n, 3_000):
                conv.add_points_batch(batch[i : i + 3_000])

        orig_hash = dd._hash_cols
        orig_light = dd.dedup_pass_light
        orig_res = dd.dedup_pass_resident
        try:
            dd._hash_cols = lambda cols, primes: orig_hash(cols, primes) & 1
            dd.dedup_pass_light = jax.jit(dd._dedup_light_body)
            dd.dedup_pass_resident = jax.jit(dd._dedup_resident_body)
            with pytest.MonkeyPatch.context() as mp:
                mp.setattr(native_device, "HOST_CASCADE_THRESHOLD", 0)
                with native_device_converter(
                    Metadata(), tmp_path / "nd"
                ) as conv:
                    for i in range(0, n, 3_000):
                        conv.add_points_batch(batch[i : i + 3_000])
        finally:
            dd._hash_cols = orig_hash
            dd.dedup_pass_light = orig_light
            dd.dedup_pass_resident = orig_res
        assert_stores_equal(tmp_path / "host", tmp_path / "nd")

    def test_tiny_budget_byte_identical(self, tmp_path, threshold):
        """Spilling composes with the device-merge path: cells evicted
        between batches reload lazily inside merge_level workers."""
        n = 20_000
        batch = random_batch(n, seed=99, lo=-300, hi=300)
        with Converter(Metadata(), tmp_path / "host", cache_size=2) as conv:
            for i in range(0, n, 4_000):
                conv.add_points_batch(batch[i : i + 4_000])
        with native_device_converter(
            Metadata(), tmp_path / "nd", cache_size=2
        ) as conv:
            for i in range(0, n, 4_000):
                conv.add_points_batch(batch[i : i + 4_000])
        assert_stores_equal(tmp_path / "host", tmp_path / "nd")

    def test_prefetch_driver_loop(self, tmp_path, threshold):
        """convert_from_paths drives prefetch (read-ahead batch) — the
        engine-backed converter must pick dispatched level-0 passes up."""
        from point_cloud_tpu.convert.converter import convert_from_paths
        from point_cloud_tpu.convert.native_device import (
            NativeDeviceConverter,
        )
        from point_cloud_tpu.io.ply import write_ply

        batch = random_batch(12_000, seed=77, lo=-200, hi=200)
        src = tmp_path / "cloud.ply"
        write_ply(src, batch)
        try:
            convert_from_paths(
                [src], tmp_path / "nd", batch_size=4_000,
                converter_factory=NativeDeviceConverter,
            )
        except RuntimeError:
            pytest.skip("no C++ toolchain")
        with Converter(load_metadata(tmp_path / "host"),
                       tmp_path / "host") as conv:
            for i in range(0, 12_000, 4_000):
                conv.add_points_batch(batch[i : i + 4_000])
        assert_stores_equal(tmp_path / "host", tmp_path / "nd")

    def test_corrupt_cell_aborts_without_store_writes(self, tmp_path,
                                                      threshold):
        """The latched lazy-load error propagates through merge_level /
        end_batch and blocks every store write."""
        a = random_batch(4_000, seed=61)
        out = tmp_path / "store"
        with native_device_converter(load_metadata(out), out) as conv:
            conv.add_points_batch(a)
        before = store_files(out)

        victim = next((out / "h_0").glob("*.bin"))
        victim.write_bytes(victim.read_bytes()[:60])
        before[str(victim.relative_to(out))] = victim.read_bytes()

        b = random_batch(4_000, seed=62)
        conv = native_device_converter(load_metadata(out), out,
                                       cache_size=4)
        with pytest.raises(OSError, match="corrupt"):
            conv.add_points_batch(b)
            conv.close()
        try:
            conv.close()
        except OSError:
            pass
        assert store_files(out) == before, (
            "store was modified after a load error"
        )


class TestEngineSpillingCorruption:
    def test_corrupt_cell_aborts_without_store_writes(self, tmp_path):
        """A corrupt cell file in an existing store must abort the merge
        and leave every store file untouched (no silent data loss)."""
        a = random_batch(4_000, seed=61)
        out = tmp_path / "store"
        with native_converter(load_metadata(out), out) as conv:
            conv.add_points_batch(a)
        before = store_files(out)

        # truncate one cell mid-body (valid header, short points)
        victim = next((out / "h_0").glob("*.bin"))
        victim.write_bytes(victim.read_bytes()[:60])
        before[str(victim.relative_to(out))] = victim.read_bytes()

        b = random_batch(4_000, seed=62)
        conv = native_converter(load_metadata(out), out, cache_size=4)
        with pytest.raises(OSError, match="corrupt"):
            conv.add_points_batch(b)
            conv.close()
        # a later close must also refuse to write
        try:
            conv.close()
        except OSError:
            pass
        assert store_files(out) == before, "store was modified after a load error"


def native_device_pipelined(*args, **kwargs):
    from point_cloud_tpu.convert.native_device import NativeDevicePipelined

    try:
        return NativeDevicePipelined(*args, **kwargs)
    except RuntimeError:
        pytest.skip("no C++ toolchain")


class TestNativeDevicePipelinedParity:
    """Wavefront engine converter (NativeDevicePipelined): overlapping
    batches' cascades + the device-resident cascade must leave stores
    byte-identical — the per-level barriers force serial engine order."""

    @pytest.mark.parametrize(
        "name,n,kwargs,config",
        [
            ("sparse", 10_000, dict(lo=-300, hi=300), MetadataConfig()),
            ("dense", 30_000, dict(lo=-2, hi=2), MetadataConfig()),
            (
                "overflow",
                8_000,
                dict(lo=-0.5, hi=0.5),
                MetadataConfig(cell_point_overflow_limit=40),
            ),
        ],
    )
    def test_store_byte_identical_to_host(self, tmp_path, monkeypatch,
                                          name, n, kwargs, config):
        from point_cloud_tpu.convert import native_device

        # force every level through the device merge so the wavefront
        # barriers are exercised at every hierarchy
        monkeypatch.setattr(native_device, "HOST_CASCADE_THRESHOLD", 0)
        batch = random_batch(n, seed=zlib.crc32(name.encode()), **kwargs)
        with Converter(Metadata(config=dataclasses.replace(config)),
                       tmp_path / "host") as conv:
            for i in range(0, n, 4_000):
                conv.add_points_batch(batch[i : i + 4_000])
        with native_device_pipelined(
            Metadata(config=dataclasses.replace(config)), tmp_path / "nd"
        ) as conv:
            for i in range(0, n, 4_000):
                conv.add_points_batch(batch[i : i + 4_000])
        assert_stores_equal(tmp_path / "host", tmp_path / "nd")

    def test_tiny_budget_byte_identical(self, tmp_path):
        """Spilling under the wavefront: end_batch runs strictly in batch
        order, so eviction bookkeeping cannot interleave."""
        n = 20_000
        batch = random_batch(n, seed=98, lo=-300, hi=300)
        with Converter(Metadata(), tmp_path / "host", cache_size=2) as conv:
            for i in range(0, n, 4_000):
                conv.add_points_batch(batch[i : i + 4_000])
        with native_device_pipelined(
            Metadata(), tmp_path / "nd", cache_size=2
        ) as conv:
            for i in range(0, n, 4_000):
                conv.add_points_batch(batch[i : i + 4_000])
        assert_stores_equal(tmp_path / "host", tmp_path / "nd")
