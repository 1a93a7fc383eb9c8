"""Face/hand detector geometry + batched crop/decode tests."""

import numpy as np
import pytest

from openpose_tpu.face import detector as face_det
from openpose_tpu.hand import detector as hand_det
from openpose_tpu.ops import warp
from openpose_tpu.params import PoseModel


def _person(parts=25):
    kp = np.zeros((parts, 3), np.float32)
    # frontal face: nose, neck, both eyes and ears visible
    kp[0] = (100, 50, 0.9)    # nose
    kp[1] = (100, 80, 0.9)    # neck
    kp[15] = (92, 45, 0.9)    # reye
    kp[16] = (108, 45, 0.9)   # leye
    kp[17] = (85, 50, 0.9)    # rear
    kp[18] = (115, 50, 0.9)   # lear
    # right arm: shoulder, elbow, wrist
    kp[2] = (80, 90, 0.9)
    kp[3] = (70, 120, 0.9)
    kp[4] = (60, 150, 0.9)
    return kp


class TestFaceDetector:
    def test_frontal_face(self):
        rect = face_det.face_rect_from_pose(_person(), PoseModel.BODY_25)
        x, y, w, h = rect
        assert w == h > 0
        # center must be around the nose/eyes region
        assert 80 < x + w / 2 < 120
        assert 20 < y + h / 2 < 80

    def test_profile_face(self):
        kp = _person()
        kp[15, 2] = kp[17, 2] = 0.0  # right eye+ear hidden -> left profile
        x, y, w, h = face_det.face_rect_from_pose(kp, PoseModel.BODY_25)
        assert w > 0

    def test_no_face(self):
        kp = np.zeros((25, 3), np.float32)
        rect = face_det.face_rect_from_pose(kp, PoseModel.BODY_25)
        assert rect[2] == 0


class TestHandDetector:
    def test_right_hand_beyond_wrist(self):
        rects = hand_det.detect_hands(_person()[None], PoseModel.BODY_25)
        left, right = rects[0]
        assert left[2] == 0  # left arm not visible
        x, y, w, h = right
        assert w == h > 0
        # center extrapolated beyond the wrist along elbow->wrist
        cx, cy = x + w / 2, y + h / 2
        assert cx < 60 and cy > 150

    def test_track_hand_smooths(self):
        cur = (10.0, 10.0, 20.0, 20.0)
        prev = [(12.0, 12.0, 22.0, 22.0)]
        out = hand_det.track_hand(cur, prev)
        assert out[2] == out[3] > 20  # grown by the ratio-2 blend

    def test_track_hand_no_overlap(self):
        cur = (10.0, 10.0, 20.0, 20.0)
        out = hand_det.track_hand(cur, [(500.0, 500.0, 10.0, 10.0)])
        assert out == cur


class TestWarp:
    def test_identity_crop(self):
        img = np.arange(64 * 64 * 3, dtype=np.float32).reshape(64, 64, 3)
        t = np.array([[1.0, 1.0, 0.0, 0.0]], np.float32)
        out = np.asarray(warp.crop_affine_batch(img, t, 32))
        np.testing.assert_allclose(out[0], img[:32, :32], atol=1e-4)

    def test_scale_and_border(self):
        img = np.full((20, 20, 3), 7.0, np.float32)
        # scale 2: crop reads src = 2*dst -> beyond 20 px becomes 0
        t = np.array([[2.0, 2.0, 0.0, 0.0]], np.float32)
        out = np.asarray(warp.crop_affine_batch(img, t, 16))
        np.testing.assert_allclose(out[0, :9, :9], 7.0, atol=1e-4)
        np.testing.assert_allclose(out[0, 11:, 11:], 0.0, atol=1e-4)

    def test_mirror_roundtrip(self):
        rng = np.random.RandomState(0)
        img = rng.uniform(0, 255, (50, 50, 3)).astype(np.float32)
        rect = (5.0, 5.0, 32.0, 32.0)
        tm = warp.rect_to_transform(rect, 32, mirror=True)
        tn = warp.rect_to_transform(rect, 32, mirror=False)
        out = np.asarray(warp.crop_affine_batch(
            img, np.array([tm, tn], np.float32), 32))
        # mirrored crop flipped back equals the plain crop shifted one column:
        # src_mirror(x) = rect.x + w - x  vs  src_plain(x) = rect.x + x
        flipped = out[0, :, ::-1]
        np.testing.assert_allclose(flipped[:, :-1], out[1][:, 1:], atol=1e-3)
        # keypoint at crop x maps back into the rect for both
        pt = warp.map_back(np.array([[16.0, 16.0]]), tm)
        assert rect[0] <= pt[0, 0] <= rect[0] + rect[2]
