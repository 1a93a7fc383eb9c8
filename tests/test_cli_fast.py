"""CLI batched fast path: --image_dir/--video -> JSON through VideoRunner.

The user-facing equivalent of the reference's multi-GPU worker graph must be
reachable from `python -m openpose_tpu.cli` (not only from library code), and
must produce the same per-frame JSON schema as the synchronous path.
"""

import json
import pathlib

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from openpose_tpu import cli


def _write_images(tmp_path, n=6, hw=(48, 64)):
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(n):
        img = rng.randint(0, 255, (hw[0], hw[1], 3), np.uint8)
        cv2.imwrite(str(d / f"frame_{i:03d}.png"), img)
    return d


class TestFastPathEligibility:
    def _args(self, **over):
        defaults = dict(image_dir="x", video="", batch=0, face=False,
                        hand=False, threed=False, tracking=-1,
                        identification=False, part_candidates=False,
                        num_views=1, frames_repeat=False,
                        process_real_time=False, fps_max=-1.0,
                        scale_number=1, frame_flip=False, frame_rotate=0,
                        frame_undistort=False, keypoint_scale=0, udp_host="",
                        body=1, write_images="", write_video="", display=0,
                        part_to_show=0, show_info=False, write_heatmaps="",
                        write_video_3d="", write_bvh="", frame_first=0,
                        face_detector=0, hand_detector=0,
                        hand_scale_number=1)
        defaults.update(over)
        import argparse
        return argparse.Namespace(**defaults)

    def test_eligible_plain(self):
        from openpose_tpu.io.native_loader import available
        assert cli.fast_path_eligible(self._args()) == available()

    @pytest.mark.parametrize("over", [
        # multi-scale and video whole-body now ride the batched path
        dict(scale_number=4),
        dict(image_dir="", video="v.avi", face=True, hand=True),
    ])
    def test_eligible_extended(self, over):
        from openpose_tpu.io.native_loader import available
        assert cli.fast_path_eligible(self._args(**over)) == available()

    @pytest.mark.parametrize("over", [
        dict(batch=1), dict(image_dir="", video=""), dict(face=True),
        dict(hand=True), dict(threed=True), dict(tracking=0),
        dict(display=2), dict(write_images="out"), dict(part_to_show=-1),
        dict(num_views=2), dict(keypoint_scale=3),
        dict(image_dir="", video="v.avi", frame_first=3),
        # whole-body needs the video pump's raw frames / default detectors
        dict(image_dir="", video="v.avi", face=True, face_detector=2),
        dict(image_dir="", video="v.avi", hand=True, hand_scale_number=2),
    ])
    def test_ineligible(self, over):
        assert not cli.fast_path_eligible(self._args(**over))


@pytest.mark.slow
class TestFastPathEndToEnd:
    def test_image_dir_to_json(self, tmp_path):
        from openpose_tpu.io.native_loader import available
        if not available():
            pytest.skip("native frame pump not built")
        d = _write_images(tmp_path)
        out = tmp_path / "json"
        rc = cli.main([
            "--image_dir", str(d), "--write_json", str(out),
            "--net_resolution", "64x48", "--batch", "4", "--fp32"])
        assert rc == 0
        files = sorted(out.glob("*_keypoints.json"))
        assert len(files) == 6
        data = json.loads(files[0].read_text())
        assert data["version"] == 1.3
        assert "people" in data
        for person in data["people"]:
            assert "pose_keypoints_2d" in person

    def test_video_whole_body_to_json(self, tmp_path):
        from openpose_tpu.io.native_loader import available
        if not available():
            pytest.skip("native frame pump not built")
        path = str(tmp_path / "v.avi")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10,
                            (64, 48))
        rng = np.random.RandomState(0)
        for i in range(5):
            w.write(rng.randint(0, 255, (48, 64, 3), np.uint8))
        w.release()
        out = tmp_path / "json_wb"
        rc = cli.main([
            "--video", path, "--write_json", str(out),
            "--net_resolution", "64x48", "--batch", "4", "--fp32",
            "--face", "--hand",
            "--face_net_resolution", "64x64",
            "--hand_net_resolution", "64x64",
            "--number_people_max", "2"])
        assert rc == 0
        files = sorted(out.glob("*_keypoints.json"))
        assert len(files) == 5
        data = json.loads(files[0].read_text())
        assert data["version"] == 1.3
        for person in data["people"]:
            # whole-body schema: face + both hand streams present
            assert "face_keypoints_2d" in person
            assert "hand_left_keypoints_2d" in person
            assert "hand_right_keypoints_2d" in person

    def test_respects_frame_window(self, tmp_path):
        from openpose_tpu.io.native_loader import available
        if not available():
            pytest.skip("native frame pump not built")
        d = _write_images(tmp_path)
        out = tmp_path / "json2"
        rc = cli.main([
            "--image_dir", str(d), "--write_json", str(out),
            "--net_resolution", "64x48", "--batch", "4", "--fp32",
            "--frame_first", "1", "--frame_step", "2", "--frame_last", "4"])
        assert rc == 0
        files = sorted(out.glob("*_keypoints.json"))
        assert [f.name for f in files] == ["frame_001_keypoints.json",
                                           "frame_003_keypoints.json"]


@pytest.mark.slow
class TestSmoothKeyframes:
    def test_fast_path_smoothing_emits_all_frames(self, tmp_path):
        from openpose_tpu.io.native_loader import available
        if not available():
            pytest.skip("native frame pump not built")
        d = _write_images(tmp_path)
        out = tmp_path / "json_sm"
        rc = cli.main([
            "--image_dir", str(d), "--write_json", str(out),
            "--net_resolution", "64x48", "--batch", "4", "--fp32",
            "--smooth_keyframes", "5"])
        assert rc == 0
        files = sorted(out.glob("*_keypoints.json"))
        assert len(files) == 6           # lookahead delay fully flushed
        data = json.loads(files[0].read_text())
        assert data["version"] == 1.3

    def test_main_loop_smoothing_emits_all_frames(self, tmp_path):
        d = _write_images(tmp_path)
        out = tmp_path / "json_sm2"
        img_out = tmp_path / "imgs_out"
        # --write_images forces the synchronous main loop (fast path
        # ineligible), exercising the deferred-emission wiring there
        rc = cli.main([
            "--image_dir", str(d), "--write_json", str(out),
            "--write_images", str(img_out),
            "--net_resolution", "64x48", "--fp32",
            "--smooth_keyframes", "5"])
        assert rc == 0
        files = sorted(out.glob("*_keypoints.json"))
        assert len(files) == 6
        assert len(sorted(img_out.glob("*.png"))) == 6
