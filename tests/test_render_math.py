"""Camera math tests: transform, projection, frustum culling."""

import numpy as np
import pytest

from point_cloud_tpu.render.camera import Camera, Frustum, PerspectiveProjection
from point_cloud_tpu.render.transform import (
    Transform,
    quat_from_mat3,
    quat_mul,
    quat_rotate,
    quat_to_mat3,
)


class TestTransform:
    def test_identity(self):
        t = Transform()
        np.testing.assert_allclose(t.compute_matrix(), np.eye(4), atol=1e-6)
        np.testing.assert_allclose(t.forward(), [0, 0, -1], atol=1e-6)

    def test_look_at_z_up(self):
        """The reference startup camera: at (0,-1,0) looking at origin, +Z up
        (src/plugins/camera.rs:107-122)."""
        t = Transform.from_xyz(0.0, -1.0, 0.0).looking_at(
            np.zeros(3), np.array([0.0, 0.0, 1.0])
        )
        np.testing.assert_allclose(t.forward(), [0, 1, 0], atol=1e-6)
        np.testing.assert_allclose(t.up(), [0, 0, 1], atol=1e-6)
        np.testing.assert_allclose(t.right(), [1, 0, 0], atol=1e-6)

    def test_quat_round_trip(self):
        rng = np.random.default_rng(3)
        for _ in range(20):
            q = rng.normal(size=4).astype(np.float32)
            q /= np.linalg.norm(q)
            m = quat_to_mat3(q)
            q2 = quat_from_mat3(m)
            if np.dot(q, q2) < 0:
                q2 = -q2
            np.testing.assert_allclose(q, q2, atol=1e-5)

    def test_quat_rotate_matches_matrix(self):
        rng = np.random.default_rng(4)
        q = rng.normal(size=4).astype(np.float32)
        q /= np.linalg.norm(q)
        v = rng.normal(size=3).astype(np.float32)
        np.testing.assert_allclose(
            quat_rotate(q, v), quat_to_mat3(q) @ v, atol=1e-5
        )

    def test_transform_point_srt_order(self):
        t = Transform.from_xyz(1, 2, 3)
        t.scale = np.array([2.0, 2.0, 2.0], np.float32)
        p = t.transform_point([1.0, 0.0, 0.0])
        np.testing.assert_allclose(p, [3, 2, 3], atol=1e-6)

    def test_compute_matrix_matches_transform_point(self):
        rng = np.random.default_rng(5)
        t = Transform.from_xyz(*rng.normal(size=3))
        q = rng.normal(size=4).astype(np.float32)
        t.rotation = q / np.linalg.norm(q)
        t.scale = np.abs(rng.normal(size=3)).astype(np.float32)
        p = rng.normal(size=3).astype(np.float32)
        m = t.compute_matrix()
        expected = (m @ np.array([*p, 1.0], np.float32))[:3]
        np.testing.assert_allclose(t.transform_point(p), expected, atol=1e-5)


class TestProjection:
    def test_perspective_rh_wgpu_depth_range(self):
        """Depth range must be [0, 1]: near plane -> 0, far plane -> 1."""
        proj = PerspectiveProjection(near=1.0, far=100.0)
        m = proj.compute_matrix()
        for dist, expected in [(1.0, 0.0), (100.0, 1.0)]:
            clip = m @ np.array([0, 0, -dist, 1], np.float32)
            assert clip[2] / clip[3] == pytest.approx(expected, abs=1e-5)

    def test_slope(self):
        proj = PerspectiveProjection()
        assert proj.slope() == pytest.approx(np.tan(np.pi / 8))


class TestFrustum:
    def make_camera(self):
        cam = Camera()
        cam.projection.far = 100.0
        return cam

    def test_points_inside_frustum_not_culled(self):
        cam = self.make_camera()
        frustum = cam.frustum()
        # camera at (0,-1,0) looking +Y: a box straight ahead
        mins = np.array([[-1, 10, -1]], np.float32)
        maxs = np.array([[1, 12, 1]], np.float32)
        assert not frustum.cull_aabbs(mins, maxs)[0]

    def test_boxes_outside_culled(self):
        cam = self.make_camera()
        frustum = cam.frustum()
        cases = [
            ([-1, -50, -1], [1, -48, 1]),   # behind camera
            ([-1, 200, -1], [1, 202, 1]),   # beyond far plane
            ([500, 10, -1], [502, 12, 1]),  # far right
            ([-1, 10, 500], [1, 12, 502]),  # far above
        ]
        mins = np.array([c[0] for c in cases], np.float32)
        maxs = np.array([c[1] for c in cases], np.float32)
        assert frustum.cull_aabbs(mins, maxs).all()

    def test_straddling_box_kept(self):
        cam = self.make_camera()
        frustum = cam.frustum()
        assert not frustum.cull_aabb(
            __import__(
                "point_cloud_tpu.core.aabb", fromlist=["Aabb"]
            ).Aabb(np.array([-100, -100, -100]), np.array([100, 100, 100]))
        )

    def test_frustum_aabb_contains_corners(self):
        cam = self.make_camera()
        frustum = cam.frustum()
        box = frustum.aabb()
        corners = np.concatenate([frustum.near, frustum.far])
        assert (corners >= box.min - 1e-5).all()
        assert (corners <= box.max + 1e-5).all()

    def test_vectorized_matches_scalar(self):
        cam = self.make_camera()
        frustum = cam.frustum()
        rng = np.random.default_rng(6)
        centers = rng.uniform(-150, 150, (200, 3)).astype(np.float32)
        mins = centers - 5
        maxs = centers + 5
        batch = frustum.cull_aabbs(mins, maxs)
        from point_cloud_tpu.core.aabb import Aabb

        scalar = np.array(
            [frustum.cull_aabb(Aabb(mn, mx)) for mn, mx in zip(mins, maxs)]
        )
        np.testing.assert_array_equal(batch, scalar)


class TestStreamingFrustums:
    def test_far_plane_pulled_in_per_hierarchy(self):
        from point_cloud_tpu.core.metadata import Metadata
        from point_cloud_tpu.render.frustums import update_streaming_frustums

        metadata = Metadata(hierarchies=4)
        cam = Camera()
        cam.projection.far = metadata.config.max_cell_size * 5.0
        frustum = cam.frustum()
        frustums = update_streaming_frustums(
            metadata, cam.transform, cam.projection, frustum, scale=2.0
        )
        assert len(frustums) == 4
        # far distance = near + min(cell_size * scale, far): halves per level
        fwd = cam.transform.forward()
        cam_pos = cam.transform.translation
        dists = []
        for h, f in enumerate(frustums):
            far_center = f.far.mean(axis=0)
            d = np.dot(far_center - cam_pos, fwd)
            expected = cam.projection.near + min(
                float(metadata.config.cell_size(h)) * 2.0, cam.projection.far
            )
            assert d == pytest.approx(expected, rel=1e-4)
            dists.append(d)
        assert dists == sorted(dists, reverse=True)

    def test_near_plane_unchanged(self):
        from point_cloud_tpu.core.metadata import Metadata
        from point_cloud_tpu.render.frustums import update_streaming_frustums

        metadata = Metadata(hierarchies=2)
        cam = Camera()
        frustum = cam.frustum()
        frustums = update_streaming_frustums(
            metadata, cam.transform, cam.projection, frustum
        )
        for f in frustums:
            np.testing.assert_array_equal(f.near, frustum.near)
            np.testing.assert_array_equal(f.planes[0], frustum.planes[0])


class TestTransformCompose:
    def test_mul_transform_matches_matrix_product(self):
        import numpy as np

        rng = np.random.default_rng(8)
        a = Transform.from_xyz(*rng.normal(size=3))
        q = rng.normal(size=4).astype(np.float32)
        a.rotation = q / np.linalg.norm(q)
        b = Transform.from_xyz(*rng.normal(size=3))
        q = rng.normal(size=4).astype(np.float32)
        b.rotation = q / np.linalg.norm(q)
        c = a * b
        np.testing.assert_allclose(
            c.compute_matrix(), a.compute_matrix() @ b.compute_matrix(),
            atol=1e-5,
        )


class TestViewerResize:
    def test_aspect_ratio_follows_surface(self):
        from point_cloud_tpu.render.renderer import RenderSettings
        from point_cloud_tpu.viewer import Viewer

        viewer = Viewer(RenderSettings(width=200, height=100))
        assert viewer.camera.projection.aspect_ratio == 2.0
        viewer.resize(100, 400)
        assert viewer.camera.projection.aspect_ratio == 0.25
        assert viewer.settings.height == 400
        viewer.close()
