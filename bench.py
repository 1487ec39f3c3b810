#!/usr/bin/env python
"""End-to-end conversion benchmark (the BASELINE.json headline metric).

Measures sustained points/sec through the full pipeline on the default JAX
device: synthetic LiDAR-like cloud -> device hex-dedup cascade -> on-disk
cell store (metadata.json + h_n/c_*.bin), including all host staging and
file writes. This is the workload the reference's `point_converter` CLI
runs single-threaded on CPU (reference: point-converter/src/lib.rs:11-60).

Baseline: the reference publishes no numbers (see BASELINE.md); the
BASELINE.json north star is 100 Mpts/s on a v5e-8, i.e. 12.5 Mpts/s per
chip. vs_baseline reports the per-chip share achieved against that target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

import numpy as np

N_POINTS = 2 << 20  # 2 Mi points
BATCH = 1 << 18
TARGET_PER_CHIP = 12.5e6  # BASELINE.json: 100 Mpts/s on 8 chips


def synth_cloud(n: int, seed: int = 0) -> np.ndarray:
    """LiDAR-like mix: a ground plane sheet + building clusters + scatter."""
    rng = np.random.default_rng(seed)
    n_ground = n // 2
    n_clusters = n // 4
    n_scatter = n - n_ground - n_clusters

    ground = np.empty((n_ground, 3), np.float32)
    ground[:, :2] = rng.uniform(-400, 400, (n_ground, 2))
    ground[:, 2] = rng.normal(0.0, 0.3, n_ground)

    centers = rng.uniform(-350, 350, (64, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(5, 40, 64)
    which = rng.integers(0, 64, n_clusters)
    clusters = centers[which] + rng.normal(0, 8.0, (n_clusters, 3))

    scatter = rng.uniform(-500, 500, (n_scatter, 3))
    return np.concatenate(
        [ground, clusters.astype(np.float32), scatter.astype(np.float32)]
    ).astype(np.float32)


def main() -> None:
    from point_cloud_tpu.ops.runtime import setup_jax_cache

    setup_jax_cache()

    from point_cloud_tpu.convert.pipelined import PipelinedConverter
    from point_cloud_tpu.core.metadata import Metadata
    from point_cloud_tpu.core.point import PointBatch

    positions = synth_cloud(N_POINTS)
    rng = np.random.default_rng(1)
    colors = rng.integers(0, 256, (N_POINTS, 4), dtype=np.uint8)
    colors[:, 3] = 255

    def convert_all():
        out_dir = tempfile.mkdtemp(prefix="pct_bench_")
        try:
            t0 = time.perf_counter()
            with PipelinedConverter(Metadata(), out_dir) as conv:
                for i in range(0, N_POINTS, BATCH):
                    conv.add_points_batch(
                        PointBatch(
                            positions[i : i + BATCH], colors[i : i + BATCH]
                        )
                    )
            return time.perf_counter() - t0, conv.metadata.number_of_points
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    # warmup pass: compiles every shape this data profile reaches (results
    # land in the persistent compile cache, so this is cheap after the
    # first-ever run on a machine)
    convert_all()
    # timed pass
    elapsed, n_converted = convert_all()

    assert n_converted == N_POINTS
    value = N_POINTS / elapsed / 1e6
    print(
        json.dumps(
            {
                "metric": "end_to_end_conversion_throughput",
                "value": round(value, 3),
                "unit": "Mpts/s",
                "vs_baseline": round(value * 1e6 / TARGET_PER_CHIP, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
