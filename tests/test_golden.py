"""Golden-byte fixtures: cell files and metadata.json constructed by hand.

The byte layouts here are written out field by field from the format spec
(docs/FORMAT.md, mirroring point-converter/src/cell.rs:155-229 and
metadata.rs:51-57) with NO use of the production codec, so a codec
regression cannot silently re-define the format.
"""

import struct

import numpy as np

from point_cloud_tpu.core.cell import Cell, CellId
from point_cloud_tpu.core.metadata import Metadata, MetadataConfig
from point_cloud_tpu.core.point import PointBatch


class TestGoldenCell:
    def test_cell_bytes_match_hand_built_fixture(self):
        """One grid point + one overflow entry + one tombstone."""
        config = MetadataConfig()
        cell_size = config.cell_size(0)  # 1000.0
        sub_cell_size = config.sub_cell_size(cell_size)  # 1000/96
        cell = Cell(
            CellId(0, (1, -2, 3)), sub_cell_size, cell_size,
            config.cell_pos(np.asarray([1, -2, 3], np.int32), cell_size),
        )
        # one point -> occupies exactly one slot
        p = np.array([[1500.25, -1999.5, 3250.0]], np.float32)
        c = np.array([[10, 20, 30, 255]], np.uint8)
        losers = cell.add_points(PointBatch(p, c))
        assert len(losers) == 0
        # one staged overflow group + one tombstoned group
        small = PointBatch(
            np.array([[1501.0, -1998.0, 3251.0]], np.float32),
            np.array([[1, 2, 3, 4]], np.uint8),
        )
        big = PointBatch(
            np.tile(np.array([[1502.0, -1997.0, 3252.0]], np.float32), (6, 1)),
            np.tile(np.array([[9, 9, 9, 9]], np.uint8), (6, 1)),
        )
        limit_cfg = MetadataConfig(cell_point_overflow_limit=5)
        remaining = cell.add_points_in_overflow(
            {(3, -4, 6): small, (3, -4, 7): big}, limit_cfg
        )
        assert list(remaining) == [(3, -4, 7)]  # flushed + tombstoned

        # hand-built expected bytes
        expected = b"".join([
            struct.pack("<I", 0),                      # hierarchy
            struct.pack("<iii", 1, -2, 3),             # index
            struct.pack("<I", 2),                      # total (1 grid + 1 ovf)
            struct.pack("<I", 1),                      # grid points
            struct.pack("<I", 1),                      # overflow points
            struct.pack("<f", 1000.0),                 # size
            struct.pack("<f", np.float32(1000.0) / np.float32(96.0)),
            struct.pack("<fff", 1500.0, -1500.0, 3500.0),  # cell center
            # grid point record
            struct.pack("<fff", 1500.25, -1999.5, 3250.0),
            bytes([10, 20, 30, 255]),
            # overflow directory: 2 entries, sorted by key
            struct.pack("<B", 2),
            struct.pack("<iii", 3, -4, 6), struct.pack("<I", 1),
            struct.pack("<fff", 1501.0, -1998.0, 3251.0), bytes([1, 2, 3, 4]),
            struct.pack("<iii", 3, -4, 7), struct.pack("<I", 0),  # tombstone
        ])
        assert cell.to_bytes() == expected

    def test_metadata_json_matches_hand_built_fixture(self):
        metadata = Metadata()
        metadata.number_of_points = 12345
        metadata.hierarchies = 4
        metadata.bounding_box.min = np.array([-1.5, 0.0, 2.25], np.float32)
        metadata.bounding_box.max = np.array([10.0, 0.125, 1e10], np.float32)
        expected = (
            '{\n'
            '  "version": "1.0",\n'
            '  "name": "Unknown",\n'
            '  "number_of_points": 12345,\n'
            '  "hierarchies": 4,\n'
            '  "bounding_box": {\n'
            '    "min": [\n'
            '      -1.5,\n'
            '      0.0,\n'
            '      2.25\n'
            '    ],\n'
            '    "max": [\n'
            '      10.0,\n'
            '      0.125,\n'
            '      10000000000.0\n'
            '    ]\n'
            '  },\n'
            '  "config": {\n'
            '    "cell_point_overflow_limit": 5000,\n'
            '    "sub_grid_dimension": 96,\n'
            '    "max_cell_size": 1000.0\n'
            '  }\n'
            '}'
        )
        assert metadata.dumps() == expected
