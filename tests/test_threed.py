"""3D triangulation + camera IO tests with synthetic multi-camera rigs."""

import numpy as np
import pytest

from openpose_tpu.threed import camera, triangulation


def _make_rig(n_cams=4, radius=3.0):
    """Cameras on an arc looking at the origin; returns [V, 3, 4] K[R|t]."""
    k = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]])
    cams = []
    for i in range(n_cams):
        angle = (i - (n_cams - 1) / 2) * 0.35
        c = np.array([radius * np.sin(angle), 0.0, -radius * np.cos(angle)])
        z = -c / np.linalg.norm(c)                   # look at origin
        x = np.cross([0, 1, 0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        r = np.stack([x, y, z])
        t = -r @ c
        cams.append(k @ np.hstack([r, t[:, None]]))
    return np.stack(cams)


def _project(cams, pts3d):
    homog = np.concatenate([pts3d, np.ones((len(pts3d), 1))], axis=1)
    proj = np.einsum("vij,kj->kvi", cams, homog)
    return proj[..., :2] / proj[..., 2:3]


class TestTriangulation:
    def test_exact_recovery(self):
        cams = _make_rig(4)
        pts3d = np.array([[0.1, 0.2, 0.3], [-0.2, 0.1, -0.1],
                          [0.0, -0.3, 0.2]])
        pts2d = _project(cams, pts3d)
        scores = np.full((3, 4), 0.9, np.float32)
        wh = np.tile([640.0, 480.0], (4, 1))
        xyzs, ok = triangulation.triangulate_points(
            pts2d.astype(np.float32), scores, cams.astype(np.float32),
            wh.astype(np.float32))
        assert np.asarray(ok).all()
        np.testing.assert_allclose(np.asarray(xyzs)[:, :3], pts3d, atol=1e-3)
        np.testing.assert_allclose(np.asarray(xyzs)[:, 3], 0.9, atol=1e-5)

    def test_noise_robust_refinement(self):
        rng = np.random.RandomState(0)
        cams = _make_rig(5)
        pts3d = rng.uniform(-0.3, 0.3, (10, 3))
        pts2d = _project(cams, pts3d) + rng.normal(0, 0.5, (10, 5, 2))
        # corrupt ONE view per point badly; Huber should resist
        pts2d[:, 2] += 30.0
        scores = np.full((10, 5), 0.9, np.float32)
        wh = np.tile([640.0, 480.0], (5, 1))
        xyzs, ok = triangulation.triangulate_points(
            pts2d.astype(np.float32), scores, cams.astype(np.float32),
            wh.astype(np.float32))
        err = np.linalg.norm(np.asarray(xyzs)[:, :3] - pts3d, axis=1)
        assert np.median(err) < 0.02

    def test_min_views_gate(self):
        cams = _make_rig(4)
        pts3d = np.array([[0.0, 0.0, 0.0]])
        pts2d = _project(cams, pts3d)
        scores = np.array([[0.9, 0.9, 0.1, 0.1]], np.float32)  # only 2 valid
        wh = np.tile([640.0, 480.0], (4, 1))
        # default min_views = clamp(4-1, 2, 4) = 3 -> rejected
        _, ok = triangulation.triangulate_points(
            pts2d.astype(np.float32), scores, cams.astype(np.float32),
            wh.astype(np.float32))
        assert not np.asarray(ok)[0]
        # explicit min_views=2 -> accepted
        _, ok2 = triangulation.triangulate_points(
            pts2d.astype(np.float32), scores, cams.astype(np.float32),
            wh.astype(np.float32), min_views=2)
        assert np.asarray(ok2)[0]

    def test_border_keypoints_invalid(self):
        cams = _make_rig(3)
        pts2d = np.full((1, 3, 2), 4.0, np.float32)  # < 8 px from border
        scores = np.full((1, 3), 0.9, np.float32)
        wh = np.tile([640.0, 480.0], (3, 1))
        _, ok = triangulation.triangulate_points(
            pts2d, scores, cams.astype(np.float32), wh.astype(np.float32),
            min_views=2)
        assert not np.asarray(ok)[0]

    def test_reconstruct_array(self):
        cams = _make_rig(3)
        pts3d = np.array([[0.1, 0.0, 0.1], [0.0, 0.2, -0.1]])
        pts2d = _project(cams, pts3d)        # [2 parts, 3 views, 2]
        views = []
        for v in range(3):
            kv = np.zeros((1, 2, 3), np.float32)
            kv[0, :, :2] = pts2d[:, v]
            kv[0, :, 2] = 0.9
            views.append(kv)
        out = triangulation.reconstruct_array(
            views, cams.astype(np.float32), [(640, 480)] * 3, min_views=2)
        assert out.shape == (1, 2, 4)
        np.testing.assert_allclose(out[0, :, :3], pts3d, atol=1e-3)


class TestCameraIO:
    def test_reference_example_roundtrip(self, tmp_path):
        p = camera.read_camera_xml(
            "/root/reference/models/cameraParameters/flir/"
            "17012332.xml.example")
        assert p.camera_matrix.shape == (3, 4)
        assert p.intrinsics.shape == (3, 3)
        assert p.distortion.shape == (8,)
        assert p.intrinsics[0, 0] == pytest.approx(817.934816, abs=1e-4)
        out = tmp_path / "cam.xml"
        camera.write_camera_xml(str(out), p)
        p2 = camera.read_camera_xml(str(out))
        np.testing.assert_allclose(p2.intrinsics, p.intrinsics)
        np.testing.assert_allclose(p2.camera_matrix, p.camera_matrix)
        np.testing.assert_allclose(p2.distortion, p.distortion)
        np.testing.assert_allclose(p.full_matrix,
                                   p.intrinsics @ p.camera_matrix)
