"""Haar-cascade face detector fallback (openpose_tpu.face.haar)."""

import numpy as np
import pytest

from openpose_tpu.face import haar


def _cascade_or_skip():
    path = haar._find_default_cascade()
    if path is None:
        pytest.skip("no system haarcascade XML available")
    return haar.parse_cascade(path)


class TestDiscovery:
    def test_model_folder_takes_priority(self, tmp_path):
        """--model_folder/face/haarcascade_frontalface_alt.xml wins over
        system locations (the reference keeps the cascade in its model
        folder, faceDetectorOpenCV.cpp:33-37)."""
        face_dir = tmp_path / "face"
        face_dir.mkdir()
        target = face_dir / "haarcascade_frontalface_alt.xml"
        target.write_text("<opencv_storage/>")
        assert haar._find_default_cascade(str(tmp_path)) == str(target)

    def test_model_folder_without_cascade_falls_back(self, tmp_path):
        found = haar._find_default_cascade(str(tmp_path))
        assert found is None or found in haar.DEFAULT_CASCADE_PATHS


class TestParser:
    def test_structure(self):
        casc = _cascade_or_skip()
        assert casc.window == (20, 20)
        assert len(casc.stage_thresholds) == 22
        assert casc.stage_bounds[0] == 0
        assert casc.stage_bounds[-1] == len(casc.stump_feature)
        assert casc.stump_leaves.shape == (len(casc.stump_feature), 2)
        assert casc.stump_feature.max() < len(casc.rects)

    def test_features_zero_sum(self):
        """Haar features are zero-mean: sum of weight*area vanishes."""
        casc = _cascade_or_skip()
        areas = casc.rects[:, :, 2] * casc.rects[:, :, 3]
        total = (casc.rects[:, :, 4] * areas).sum(axis=1)
        np.testing.assert_allclose(total, 0.0, atol=1e-3)


class TestGroupRectangles:
    def test_clusters_and_threshold(self):
        base = (10.0, 10.0, 40.0, 40.0)
        jitter = [(10 + d, 10 - d, 40, 40 + d) for d in (-2, -1, 0, 1, 2)]
        lone = [(200.0, 200.0, 40.0, 40.0)]
        out = haar.group_rectangles(jitter + lone, min_neighbors=3)
        assert len(out) == 1
        np.testing.assert_allclose(out[0], base, atol=2.5)

    def test_empty(self):
        assert haar.group_rectangles([], 3) == []


class TestDetector:
    def test_noise_has_no_faces(self):
        """The whole point of a 22-stage cascade: reject non-faces."""
        casc = _cascade_or_skip()
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (120, 160), np.uint8)
        faces = haar.detect_multiscale(img, casc)
        assert len(faces) == 0

    def test_flat_image_has_no_faces(self):
        casc = _cascade_or_skip()
        img = np.full((100, 100), 128, np.uint8)
        assert haar.detect_multiscale(img, casc) == []

    def test_detector_class_api(self):
        haar._find_default_cascade() or pytest.skip("no cascade")
        det = haar.FaceDetectorOpenCV()
        rng = np.random.RandomState(1)
        img = rng.randint(0, 255, (80, 120, 3), np.uint8)
        out = det.detect_faces(img)
        assert out.shape[1:] == (4,)

    def test_integral_rect_sums(self):
        rng = np.random.RandomState(2)
        img = rng.randint(0, 255, (30, 30)).astype(np.float32)
        ii, sq = haar._integral(img)
        ys = np.array([3, 7])
        xs = np.array([5, 2])
        rect = np.array([2, 1, 6, 4], np.float32)  # x y w h
        got = haar._rect_sums(ii, ys, xs, rect)
        for k in range(2):
            want = img[ys[k] + 1:ys[k] + 5, xs[k] + 2:xs[k] + 8].sum()
            np.testing.assert_allclose(got[k], want, rtol=1e-6)
