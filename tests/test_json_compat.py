"""serde_json byte-compatibility tests for the metadata writer."""

import json

import numpy as np

from point_cloud_tpu.core.json_compat import F32, dumps_pretty, format_f32
from point_cloud_tpu.core.metadata import Metadata


class TestFormatF32:
    """Expected strings verified against serde_json/ryu behavior."""

    def test_integers(self):
        assert format_f32(0.0) == "0.0"
        assert format_f32(-0.0) == "-0.0"
        assert format_f32(1.0) == "1.0"
        assert format_f32(1000.0) == "1000.0"
        assert format_f32(-42.0) == "-42.0"

    def test_fractions(self):
        assert format_f32(0.1) == "0.1"
        assert format_f32(0.5) == "0.5"
        assert format_f32(-3.25) == "-3.25"
        # 1/3 rounded to f32 prints its shortest round-trip repr
        assert format_f32(np.float32(1.0) / np.float32(3.0)) == "0.33333334"

    def test_small_magnitude(self):
        assert format_f32(0.001) == "0.001"
        assert format_f32(0.0001) == "0.0001"
        assert format_f32(1e-5) == "0.00001"
        # kk <= -5 switches to exponent notation
        assert format_f32(1e-7) == "1e-7"

    def test_large_magnitude(self):
        assert format_f32(1e15) == "1000000000000000.0"
        assert format_f32(1e16) == "1e16"
        assert format_f32(3.4e38) == "3.4e38"

    def test_round_trip_random(self):
        rng = np.random.default_rng(0)
        vals = np.concatenate(
            [
                rng.uniform(-1e6, 1e6, 2000).astype(np.float32),
                rng.normal(0, 1e-3, 2000).astype(np.float32),
                (rng.normal(0, 1, 1000) * 10.0 ** rng.integers(-30, 30, 1000)).astype(
                    np.float32
                ),
            ]
        )
        for v in vals:
            s = format_f32(float(v))
            assert np.float32(float(s)) == v, (v, s)


class TestDumpsPretty:
    def test_layout_matches_serde_pretty(self):
        doc = {"a": 1, "b": [1.0, 2.0], "c": {"d": "x"}}
        expected = (
            "{\n"
            '  "a": 1,\n'
            '  "b": [\n'
            "    1.0,\n"
            "    2.0\n"
            "  ],\n"
            '  "c": {\n'
            '    "d": "x"\n'
            "  }\n"
            "}"
        )
        assert dumps_pretty(doc) == expected

    def test_f32_marker(self):
        assert dumps_pretty({"v": F32(np.float32(0.1))}) == '{\n  "v": 0.1\n}'


class TestMetadataJson:
    def test_default_metadata_exact_bytes(self):
        """Byte-exact serde_json::to_string_pretty of Metadata::default()
        (reference: point-converter/src/metadata.rs:30-41,80-88)."""
        expected = (
            "{\n"
            '  "version": "1.0",\n'
            '  "name": "Unknown",\n'
            '  "number_of_points": 0,\n'
            '  "hierarchies": 0,\n'
            '  "bounding_box": {\n'
            '    "min": [\n'
            "      0.0,\n"
            "      0.0,\n"
            "      0.0\n"
            "    ],\n"
            '    "max": [\n'
            "      0.0,\n"
            "      0.0,\n"
            "      0.0\n"
            "    ]\n"
            "  },\n"
            '  "config": {\n'
            '    "cell_point_overflow_limit": 5000,\n'
            '    "sub_grid_dimension": 96,\n'
            '    "max_cell_size": 1000.0\n'
            "  }\n"
            "}"
        )
        assert Metadata().dumps() == expected

    def test_round_trip(self):
        m = Metadata(number_of_points=123456789012, hierarchies=7)
        m.bounding_box.min = np.array([-1.5, 0.25, 3e-5], np.float32)
        m.bounding_box.max = np.array([10.125, 2e7, 0.1], np.float32)
        m2 = Metadata.loads(m.dumps())
        assert m2.dumps() == m.dumps()
        assert m2.number_of_points == m.number_of_points
        assert np.array_equal(m2.bounding_box.min, m.bounding_box.min)

    def test_parseable_by_standard_json(self):
        json.loads(Metadata().dumps())
