"""Top-down refinement (--top_down_refinement): ROI geometry, matching
rules, and the full pass (reference: poseExtractorCaffe.cpp:340-618)."""

import numpy as np
import pytest

from openpose_tpu.pose import refine


class TestHelpers:
    def test_keypoints_rectangle(self):
        kp = np.zeros((5, 3), np.float32)
        kp[0] = (10, 20, 0.9)
        kp[1] = (30, 60, 0.9)
        kp[2] = (99, 99, 0.01)       # below threshold: excluded
        assert refine._keypoints_rectangle(kp, 0.05) == (10, 20, 20, 40)
        assert refine._keypoints_rectangle(np.zeros((5, 3), np.float32),
                                           0.05) is None

    def test_distance_average_only_shared_parts(self):
        a = np.zeros((3, 3), np.float32)
        b = np.zeros((3, 3), np.float32)
        a[0] = (0, 0, 0.9)
        b[0] = (3, 4, 0.9)           # dist 5
        a[1] = (10, 10, 0.9)
        b[1] = (10, 10, 0.01)        # b below thr: excluded
        assert refine._distance_average(a, b, 0.05) == pytest.approx(5.0)

    def test_rect_iou(self):
        a = (0.0, 0.0, 10.0, 10.0)
        b = (5.0, 5.0, 10.0, 10.0)
        assert refine._rect_iou(a, b) == pytest.approx(25.0 / 175.0)
        assert refine._rect_iou(a, (20.0, 20.0, 5.0, 5.0)) == 0.0

    def test_person_rois_geometry(self):
        kp = np.zeros((1, 25, 3), np.float32)
        kp[0, 0] = (100, 50, 0.9)
        kp[0, 1] = (150, 250, 0.9)
        rois = refine._person_rois(kp, 0.05, 1.0, (656, 368))
        assert len(rois) == 1
        roi = rois[0]
        # expanded 1.4x around the 50x200 rect, clamped inside the net input
        assert roi.rect[0] <= 90 and roi.rect[1] <= 10
        assert roi.scale_net_to_roi > 1.0
        assert roi.target == (368, 368)

    def test_person_rois_skips_large_person(self):
        # person already filling the net input: scale <= 1 -> no refinement
        kp = np.zeros((1, 25, 3), np.float32)
        kp[0, 0] = (5, 5, 0.9)
        kp[0, 1] = (650, 360, 0.9)
        assert refine._person_rois(kp, 0.05, 1.0, (656, 368)) == []


class TestMerge:
    def _person(self, offset, score=0.9, n=25):
        kp = np.zeros((n, 3), np.float32)
        kp[:, 0] = 100 + offset + np.arange(n)
        kp[:, 1] = 200 + 2 * np.arange(n)
        kp[:, 2] = score
        return kp

    def test_accepts_close_candidate(self):
        kp_all = self._person(0)[None]
        scores = np.array([0.5], np.float32)
        cand = self._person(1.0, score=0.95)[None]   # 1 px away
        ok = refine._merge_refined(kp_all, scores, 0, cand,
                                   np.array([0.9], np.float32), 0.05)
        assert ok
        assert scores[0] == pytest.approx(0.9)
        assert kp_all[0, 0, 0] == pytest.approx(101.0)

    def test_rejects_far_candidate(self):
        kp_all = self._person(0)[None]
        scores = np.array([0.5], np.float32)
        cand = self._person(500.0)[None]             # far away
        ok = refine._merge_refined(kp_all, scores, 0, cand,
                                   np.array([0.9], np.float32), 0.05)
        assert not ok
        assert kp_all[0, 0, 0] == pytest.approx(100.0)

    def test_rejects_low_keypoint_count(self):
        kp_all = self._person(0)[None]
        scores = np.array([0.5], np.float32)
        cand = self._person(1.0)[None].copy()
        cand[0, 10:, 2] = 0.0                        # < 75% of original kps
        ok = refine._merge_refined(kp_all, scores, 0, cand,
                                   np.array([0.9], np.float32), 0.05)
        assert not ok


class TestFullPass:
    def test_refine_runs_and_preserves_on_no_match(self):
        # random weights: the re-run net yields garbage candidates that fail
        # the matching gates, so keypoints must come back unchanged
        import jax.numpy as jnp
        from openpose_tpu.models import zoo
        from openpose_tpu.params import PoseModel
        from openpose_tpu.pose.extractor import PoseExtractor
        model = zoo.load_pose_model(PoseModel.BODY_25)
        ex = PoseExtractor(model, compute_dtype=jnp.float32)
        img = np.random.RandomState(0).randint(
            0, 255, (96, 160, 3)).astype(np.float32)
        pred = ex.forward(img, net_resolution=(160, 96))
        if pred.keypoints.shape[0] == 0:
            pytest.skip("random net produced no people")
        before = pred.keypoints.copy()
        out = refine.refine_prediction(ex, img, pred, people_cap=2)
        assert out.keypoints.shape == before.shape

    def test_wrapper_flag(self):
        import jax.numpy as jnp
        from openpose_tpu.wrapper import PoseConfig, Wrapper
        cfg = PoseConfig(net_resolution=(160, 96), compute_dtype="float32",
                         top_down_refinement=True)
        w = Wrapper(pose=cfg)
        img = np.random.RandomState(1).randint(
            0, 255, (96, 160, 3)).astype(np.uint8)
        datum = w.process(img)
        assert datum.pose_keypoints is not None
