"""Line-renderer geometry + rasterization unit tests (render/lines.py)."""

import numpy as np

from point_cloud_tpu.render.camera import Camera
from point_cloud_tpu.render.lines import (
    frustum_lines,
    line_box,
    line_sphere,
    line_strip,
    rasterize_lines,
)


class TestGenerators:
    def test_line_strip(self):
        pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0]], np.float32)
        segs = line_strip(pts, None)
        assert segs.shape == (2, 2, 3)
        np.testing.assert_array_equal(segs[0], [[0, 0, 0], [1, 0, 0]])

    def test_line_box_has_12_edges_of_correct_lengths(self):
        segs = line_box([0, 0, 0], [1, 2, 3])
        assert segs.shape == (12, 2, 3)
        lengths = np.linalg.norm(segs[:, 1] - segs[:, 0], axis=1)
        # 4 edges of each length
        assert sorted(np.round(lengths, 5).tolist()) == sorted(
            [1.0] * 4 + [2.0] * 4 + [3.0] * 4
        )
        # every corner appears exactly 3 times as an endpoint
        corners, counts = np.unique(
            segs.reshape(-1, 3), axis=0, return_counts=True
        )
        assert len(corners) == 8
        assert (counts == 3).all()

    def test_line_sphere_points_on_radius(self):
        segs = line_sphere([1.0, 2.0, 3.0], radius=5.0, segments=16)
        pts = segs.reshape(-1, 3) - np.array([1.0, 2.0, 3.0], np.float32)
        np.testing.assert_allclose(
            np.linalg.norm(pts, axis=1), 5.0, rtol=1e-5
        )

    def test_frustum_lines_count(self):
        segs = frustum_lines(Camera().frustum())
        assert segs.shape == (12, 2, 3)  # 2 quads + 4 connectors


class TestRasterizeLines:
    def test_draws_visible_segment_and_clips_offscreen(self):
        cam = Camera()
        cam.projection.far = 100.0
        vp = cam.view_projection_matrix()
        img = np.zeros((32, 32, 3), np.float32)
        # camera at (0,-1,0) looking +Y: a horizontal line ahead
        segs = np.array(
            [[[-2.0, 10.0, 0.0], [2.0, 10.0, 0.0]],     # visible
             [[-2.0, -50.0, 0.0], [2.0, -50.0, 0.0]]],  # behind camera
            np.float32,
        )
        rasterize_lines(img, segs, (1.0, 0.0, 0.0), vp)
        assert (img[:, :, 0] > 0).sum() > 5  # pixels written
        # nothing outside the red channel
        assert img[:, :, 1].max() == 0.0

    def test_empty_segments_noop(self):
        img = np.zeros((4, 4, 3), np.float32)
        out = rasterize_lines(
            img, np.empty((0, 2, 3), np.float32), (1, 1, 1),
            np.eye(4, dtype=np.float32),
        )
        assert out.sum() == 0
