"""Calibration CLI: synthetic chessboard renders -> recovered K and [R|t].

Mirrors the reference calibration.bin modes 1/2
(examples/calibration/calibration.cpp) end-to-end through
openpose_tpu.calibration_cli.
"""

import pathlib

import cv2
import numpy as np
import pytest

from openpose_tpu.calibration_cli import main as calib_main
from openpose_tpu.threed.camera import read_camera_xml

GRID = (9, 6)          # inner corners
SQUARE_MM = 100.0
IMG_WH = (640, 480)


def _board_image(px_per_square: int = 60) -> np.ndarray:
    cols, rows = GRID[0] + 1, GRID[1] + 1
    img = np.zeros((rows * px_per_square, cols * px_per_square), np.uint8)
    for r in range(rows):
        for c in range(cols):
            if (r + c) % 2 == 0:
                img[r * px_per_square:(r + 1) * px_per_square,
                    c * px_per_square:(c + 1) * px_per_square] = 255
    return cv2.copyMakeBorder(img, 40, 40, 40, 40,
                              cv2.BORDER_CONSTANT, value=255)


def _render_view(board: np.ndarray, k: np.ndarray, rvec: np.ndarray,
                 tvec: np.ndarray, px_per_square: int = 60) -> np.ndarray:
    """Project the board plane (z=0, meters) through K[R|t] into a view."""
    sq_m = SQUARE_MM / 1000.0
    # board-image pixel -> board meters: meters = (px - border) / pps * sq_m
    corners_px = np.float32([[40, 40],
                             [40 + 10 * px_per_square, 40],
                             [40 + 10 * px_per_square,
                              40 + 7 * px_per_square],
                             [40, 40 + 7 * px_per_square]])
    corners_m = np.float32([[-sq_m, -sq_m, 0], [9 * sq_m, -sq_m, 0],
                            [9 * sq_m, 6 * sq_m, 0], [-sq_m, 6 * sq_m, 0]])
    proj, _ = cv2.projectPoints(corners_m, rvec, tvec, k, None)
    h, _ = cv2.findHomography(corners_px, proj.reshape(-1, 2))
    out = cv2.warpPerspective(board, h, IMG_WH,
                              flags=cv2.INTER_LINEAR,
                              borderValue=255)
    return cv2.cvtColor(out, cv2.COLOR_GRAY2BGR)


K_TRUE = np.array([[620.0, 0, 320.0],
                   [0, 615.0, 240.0],
                   [0, 0, 1.0]])

VIEWS = [  # (rvec, tvec) of the board in camera frame
    (np.float32([0.12, -0.1, 0.02]), np.float32([-0.45, -0.3, 1.3])),
    (np.float32([-0.25, 0.15, 0.1]), np.float32([-0.35, -0.25, 1.1])),
    (np.float32([0.05, 0.3, -0.15]), np.float32([-0.5, -0.35, 1.5])),
    (np.float32([0.3, 0.05, 0.2]), np.float32([-0.3, -0.2, 1.2])),
    (np.float32([-0.1, -0.25, -0.05]), np.float32([-0.4, -0.4, 1.4])),
]


@pytest.fixture(scope="module")
def board():
    return _board_image()


def test_mode1_intrinsics(tmp_path, board):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i, (rv, tv) in enumerate(VIEWS):
        cv2.imwrite(str(img_dir / f"view_{i}.png"),
                    _render_view(board, K_TRUE, rv, tv))
    out_dir = tmp_path / "params"
    rc = calib_main([
        "--mode", "1", "--calibration_image_dir", str(img_dir),
        "--grid_number_inner_corners", "9x6",
        "--grid_square_size_mm", str(SQUARE_MM),
        "--camera_serial_number", "camtest",
        "--camera_parameter_folder", str(out_dir)])
    assert rc == 0
    got = read_camera_xml(str(out_dir / "camtest.xml"))
    # focal lengths / principal point within a few percent on clean renders
    assert np.allclose(np.diag(got.intrinsics)[:2],
                       np.diag(K_TRUE)[:2], rtol=0.05)
    assert np.allclose(got.intrinsics[:2, 2], K_TRUE[:2, 2], rtol=0.08)


def test_mode2_extrinsics(tmp_path, board):
    from openpose_tpu.threed.camera import (CameraParameters,
                                            write_camera_xml)
    out_dir = tmp_path / "params"
    out_dir.mkdir()
    ident = np.hstack([np.eye(3), np.zeros((3, 1))])
    for serial in ("cam0", "cam1"):
        write_camera_xml(str(out_dir / f"{serial}.xml"), CameraParameters(
            serial, ident.copy(), K_TRUE.copy(), np.zeros(8)))

    # cam1 = cam0 shifted 20 cm along +x with a slight yaw
    r_rel, _ = cv2.Rodrigues(np.float32([0, 0.08, 0]))
    t_rel = np.float32([-0.2, 0.0, 0.0])

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i, (rv, tv) in enumerate(VIEWS):
        cv2.imwrite(str(img_dir / f"pair{i}_cam0.png"),
                    _render_view(board, K_TRUE, rv, tv))
        r0, _ = cv2.Rodrigues(rv)
        r1 = r_rel @ r0
        t1 = r_rel @ tv.reshape(3) + t_rel
        rv1, _ = cv2.Rodrigues(r1)
        cv2.imwrite(str(img_dir / f"pair{i}_cam1.png"),
                    _render_view(board, K_TRUE, rv1.reshape(-1),
                                 np.float32(t1)))

    rc = calib_main([
        "--mode", "2", "--calibration_image_dir", str(img_dir),
        "--grid_number_inner_corners", "9x6",
        "--grid_square_size_mm", str(SQUARE_MM),
        "--camera_parameter_folder", str(out_dir),
        "--cam0", "cam0", "--cam1", "cam1"])
    assert rc == 0
    got = read_camera_xml(str(out_dir / "cam1.xml"))
    assert np.allclose(got.camera_matrix[:3, :3], r_rel, atol=0.02)
    assert np.allclose(got.camera_matrix[:3, 3], t_rel, atol=0.02)


class TestVisualSFMExport:
    def test_sift_binary_layout_roundtrip(self, tmp_path):
        """Exact SiftGPU V4.0 layout (writeVisualSFMSiftGPU,
        cameraParameterEstimation.cpp:662-719)."""
        import struct
        from openpose_tpu.threed import visualsfm
        pts = np.array([[1.5, 2.5], [10.0, 20.0], [-1.0, -1.0]], np.float32)
        path = tmp_path / "00_00.sift"
        visualsfm.write_visualsfm_sift(str(path), pts)
        data = path.read_bytes()
        name, ver, n, kdim, ddim = struct.unpack_from("<5i", data)
        assert name == visualsfm.SIFT_NAME and ver == visualsfm.SIFT_VERSION_4
        assert (n, kdim, ddim) == (3, 5, 128)
        assert len(data) == 20 + 3 * 5 * 4 + 3 * 128 + 4
        keys = np.frombuffer(data, np.float32, count=15, offset=20)
        keys = keys.reshape(3, 5)
        np.testing.assert_array_equal(keys[:, :2], pts)
        np.testing.assert_array_equal(keys[:, 3], 1.0)     # scale
        np.testing.assert_array_equal(
            visualsfm.read_visualsfm_sift(str(path)), pts)

    def test_camera_file_stem(self):
        from openpose_tpu.threed import visualsfm
        assert visualsfm.camera_file_stem(3) == "00_03"
        assert visualsfm.camera_file_stem(12) == "00_12"
        with pytest.raises(ValueError):
            visualsfm.camera_file_stem(100)

    def test_feature_matches_intersection(self, tmp_path):
        from openpose_tpu.threed import visualsfm
        path = tmp_path / "FeatureMatches.txt"
        visualsfm.write_feature_matches(
            str(path), [[0, 1, 2, 3], [2, 3, 4], [0, 2]])
        lines = path.read_text().splitlines()
        assert lines[0] == "00_00.jpg 00_01.jpg 2"
        assert lines[1].split() == ["2", "3"]
        assert lines[1] == lines[2]                # repeated twice
        assert lines[4] == "00_00.jpg 00_02.jpg 2"
        assert lines[8] == "00_01.jpg 00_02.jpg 1"

    def test_mode4_end_to_end(self, tmp_path, board):
        """Two cameras x three views of the rendered board -> .sift files
        whose corner counts and match file agree."""
        from openpose_tpu.threed import visualsfm
        img_dir = tmp_path / "sift_imgs"
        img_dir.mkdir()
        r_rel, _ = cv2.Rodrigues(np.float32([0, 0.06, 0]))
        t_rel = np.float32([-0.15, 0.0, 0.0])
        for i, (rv, tv) in enumerate(VIEWS[:3]):
            cv2.imwrite(str(img_dir / f"v{i}_a.png"),
                        _render_view(board, K_TRUE, rv, tv))
            r0, _ = cv2.Rodrigues(rv)
            rv1, _ = cv2.Rodrigues(r_rel @ r0)
            t1 = r_rel @ tv.reshape(3) + t_rel
            cv2.imwrite(str(img_dir / f"v{i}_b.png"),
                        _render_view(board, K_TRUE, rv1.reshape(-1),
                                     np.float32(t1)))
        rc = calib_main([
            "--mode", "4", "--calibration_image_dir", str(img_dir),
            "--grid_number_inner_corners", "9x6", "--number_cameras", "2"])
        assert rc == 0
        n_corners = GRID[0] * GRID[1]
        for cam in range(2):
            pts = visualsfm.read_visualsfm_sift(
                str(img_dir / f"00_0{cam}.sift"))
            assert pts.shape == (3 * n_corners, 2)
        matches = (img_dir / "FeatureMatches.txt").read_text().splitlines()
        assert matches[0].startswith("00_00.jpg 00_01.jpg")
        n_matched = int(matches[0].split()[-1])
        assert n_matched > 0 and n_matched % n_corners == 0
