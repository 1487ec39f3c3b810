"""Converter CLI.

Flag parity with the reference CLI (reference: point-converter/src/main.rs:11-50):
``-o/--output DIR``, ``-d/--directories DIRS...`` (each directory's entries
are flattened into the file list), ``-f/--files FILES...``; default output
is the current working directory.

Extensions beyond the reference: ``--batch-size`` (the reference hardcodes
10,000, lib.rs:32), ``--device`` to run the dedup pipeline on TPU via the
device-accelerated converter, and ``--mesh`` to shard conversion over
multiple chips.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="point-converter",
        description=(
            "Point converter will convert your points to a format that the "
            "point cloud renderer can use. Currently supported file formats "
            "are las/laz and ply and the generated metadata.json."
        ),
    )
    parser.add_argument(
        "-o", "--output", metavar="DIR", type=Path, default=None,
        help="Output directory of the converted format. "
             "Will be created if it doesn't exist.",
    )
    parser.add_argument(
        "-d", "--directories", metavar="DIRS", type=Path, nargs="*",
        default=[], help="Directories with input files to convert.",
    )
    parser.add_argument(
        "-f", "--files", metavar="FILES", type=Path, nargs="*",
        default=[], help="Input files with the points to convert.",
    )
    def positive_int(text: str) -> int:
        value = int(text)
        if value < 1:
            raise argparse.ArgumentTypeError("must be >= 1")
        return value

    parser.add_argument(
        "--batch-size", type=positive_int, default=None,
        help="Points per conversion batch (defaults: 10000 host — the "
        "reference's lib.rs:32 — 2^18 device/native, 2^20 mesh). Store "
        "BYTES depend on the batch schedule (overflow groups stage "
        "per-batch canonical chunks, like the reference's arrival-order "
        "dependence), so pin the same --batch-size when byte-comparing "
        "stores across backends; every backend is byte-identical at "
        "equal batch size (tests/test_converter.py backend matrix).",
    )
    parser.add_argument(
        "--device", action="store_true",
        help="Run the dedup pipeline on the JAX default device (TPU).",
    )
    parser.add_argument(
        "--mesh", type=int, default=None, metavar="N",
        help="Shard conversion over an N-device mesh (implies --device); "
             "0 = every visible device (every local device under "
             "--multihost).",
    )
    parser.add_argument(
        "--native", action="store_true",
        help="Run the whole cascade in the C++ engine (host-only, fastest "
             "when the accelerator link is thin; keeps all cells in RAM).",
    )
    parser.add_argument(
        "--device-native", action="store_true",
        help="Device dedup pass + C++ merge engine: the TPU pipeline with "
             "the per-level host half running natively (fastest device-"
             "backed mode; see convert/native_device.py).",
    )
    parser.add_argument(
        "--cache-size", type=positive_int, default=None, metavar="N",
        help="Cells kept in RAM before evicting to disk (default 65536; "
             "the reference keeps 100, converter.rs:92 — results are "
             "identical at any size, only disk traffic changes).",
    )
    parser.add_argument(
        "--multihost", action="store_true",
        help="Pod launch: initialize jax.distributed from the environment "
             "(PCT_NUM_PROCESSES / PCT_PROCESS_ID / "
             "PCT_COORDINATOR_ADDRESS; all optional on Cloud TPU), convert "
             "this worker's file shard, barrier, and let rank 0 merge the "
             "staging stores into the output (parallel/launch.py).",
    )
    parser.add_argument(
        "--profile", action="store_true",
        help="Print a per-stage timing summary after conversion.",
    )
    parser.add_argument("-v", "--verbose", action="store_true")
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(levelname)s %(name)s: %(message)s",
    )
    log = logging.getLogger("point_cloud_tpu.cli")

    files = list(args.files)
    for directory in args.directories:
        try:
            files.extend(sorted(directory.iterdir()))
        except OSError as err:
            log.error("Failed to read directory %s: %s", directory, err)
            return 1

    if not files:
        log.warning("Please provide some files or directories")
        return 0

    output = args.output if args.output is not None else Path(os.getcwd())

    from .converter import DEFAULT_BATCH_SIZE, Converter, convert_from_paths

    factory = Converter
    batch_size = args.batch_size
    if args.native:
        from .native import NativeConverter

        factory = NativeConverter
        batch_size = batch_size or 1 << 18
    elif args.device_native:
        from .native_device import NativeDevicePipelined

        factory = NativeDevicePipelined
        batch_size = batch_size or 1 << 18
    elif args.mesh is not None:
        from ..parallel.mesh_converter import make_mesh_converter_factory

        factory = make_mesh_converter_factory(
            args.mesh, local=args.multihost
        )
        batch_size = batch_size or 1 << 20
    elif args.device:
        from .pipelined import PipelinedConverter

        factory = PipelinedConverter
        batch_size = batch_size or 1 << 18
    else:
        batch_size = batch_size or DEFAULT_BATCH_SIZE

    if args.device or args.mesh is not None or args.device_native:
        from ..ops.runtime import device_reachable, setup_jax_cache

        setup_jax_cache()
        # a wedged tunnel hangs PJRT client creation uninterruptibly
        # (environment constraint, PERF.md); probe in a bounded
        # subprocess BEFORE committing the conversion to a device
        # backend. Stores are byte-identical across every backend, so
        # failing over to the C++ engine only changes throughput.
        if not device_reachable():
            if args.multihost:
                log.error(
                    "accelerator unreachable (PCT_DEVICE_PROBE_S budget "
                    "exceeded); refusing the multihost launch"
                )
                return 1
            log.error(
                "accelerator unreachable within the probe budget; "
                "falling back to the host C++ engine (byte-identical "
                "store, host-side throughput)"
            )
            from ..native import hex_lockstep_ok

            if hex_lockstep_ok():
                from .native import NativeConverter

                factory = NativeConverter
            else:
                factory = Converter
            batch_size = args.batch_size or 1 << 18

    from .converter import DEFAULT_CACHE_SIZE

    cache_size = (
        args.cache_size if args.cache_size is not None else DEFAULT_CACHE_SIZE
    )
    if args.multihost:
        from ..parallel.launch import LaunchConfig, run_multihost

        config = LaunchConfig.from_env()
        log.info(
            "multihost launch: process %d of %d (coordinator %s)",
            config.process_id, config.num_processes,
            config.coordinator_address or "<auto>",
        )
        run_multihost(
            files, output, config=config, converter_factory=factory,
            batch_size=batch_size, cache_size=cache_size,
        )
        return 0
    if args.profile:
        from ..utils.tracing import StageTimer

        with StageTimer() as timer:
            metadata = convert_from_paths(
                files, output, batch_size=batch_size,
                cache_size=cache_size, converter_factory=factory,
            )
        print(timer.summary(points=metadata.number_of_points),
              file=sys.stderr)
    else:
        convert_from_paths(files, output, batch_size=batch_size,
                           cache_size=cache_size, converter_factory=factory)
    return 0


if __name__ == "__main__":
    sys.exit(main())
