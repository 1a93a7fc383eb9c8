"""Closed-loop accuracy: synthetic scenes through the REAL user path
(sharded program with net-output injection -> NMS -> PAF scoring -> greedy
assembly -> CocoJsonSaver -> pycocotools-exact evaluator) must score
near-perfect AP on clean scenes and degrade gracefully under perturbation.
Mirrors the reference's COCO accuracy protocol
(scripts/tests/pose_accuracy_coco_val.sh) with synthetic ground truth."""

import numpy as np
import pytest

from openpose_tpu import scenes
from openpose_tpu.accuracy import synthetic_coco_eval, synthetic_topdown_eval
from openpose_tpu.models import zoo
from openpose_tpu.params import PoseModel


@pytest.fixture(scope="module")
def model():
    return zoo.load_pose_model(PoseModel.BODY_25)


class TestScenes:
    def test_random_people_shapes_and_bounds(self):
        rng = np.random.RandomState(0)
        people = scenes.random_people(rng, 3, (368, 656))
        assert people.shape == (3, 25, 3)
        assert (people[:, :, 2] == 1.0).all()
        assert (people[:, :, 0] >= 0).all() and (people[:, :, 0] < 656).all()
        assert (people[:, :, 1] >= 0).all() and (people[:, :, 1] < 368).all()

    def test_coco_ground_truth_order(self):
        rng = np.random.RandomState(1)
        people = scenes.random_people(rng, 2, (368, 656))
        gts = scenes.coco_ground_truth(people, image_id=7)
        assert len(gts) == 2
        g = gts[0]
        assert g["image_id"] == 7 and g["num_keypoints"] == 17
        # nose is COCO keypoint 0 == BODY_25 part 0
        assert g["keypoints"][0] == pytest.approx(people[0, 0, 0])
        assert g["keypoints"][1] == pytest.approx(people[0, 0, 1])
        # left eye is COCO keypoint 1 == BODY_25 part 16
        assert g["keypoints"][3] == pytest.approx(people[0, 16, 0])
        assert g["area"] > 0


class TestClosedLoopAP:
    def test_clean_scenes_ap(self, model):
        m = synthetic_coco_eval(n_images=16, net_hw=(368, 656), batch=8,
                                seed=0, model=model)
        assert m["AP"] >= 0.95, m
        assert m["AR"] >= 0.95, m

    def test_small_resolution_ap(self, model):
        m = synthetic_coco_eval(n_images=16, net_hw=(176, 320), batch=8,
                                seed=0, model=model)
        assert m["AP"] >= 0.90, m

    def test_face_closed_loop_localization(self):
        """Face decode + crop geometry round trip: sub-2px at net 64 (the
        error scales with rect/net ratio; production 368 is ~6x finer)."""
        m = synthetic_topdown_eval("face", n_frames=8, net_size=64, batch=8,
                                   seed=0)
        assert m["n_instances"] >= 8, m
        assert m["rmse_px"] < 2.0, m
        assert m["pck05"] >= 0.99, m

    def test_hand_closed_loop_localization(self):
        """Hands exercise the mirrored-left-crop path
        (handExtractorCaffe.cpp:44-75) through the same loop."""
        m = synthetic_topdown_eval("hand", n_frames=8, net_size=64, batch=8,
                                   seed=1)
        assert m["n_instances"] >= 8, m
        assert m["rmse_px"] < 2.0, m
        assert m["pck05"] >= 0.99, m

    def test_jitter_degrades_gracefully(self, model):
        clean = synthetic_coco_eval(n_images=8, net_hw=(368, 656), batch=8,
                                    seed=2, model=model)
        j4 = synthetic_coco_eval(n_images=8, net_hw=(368, 656), batch=8,
                                 seed=2, kp_jitter=4.0, model=model)
        # 4 px localization error: people still all FOUND (AP50 high),
        # tight-threshold AP drops
        assert j4["AP50"] >= 0.95, j4
        assert j4["AP"] < clean["AP"]
        assert j4["AP"] > 0.5, j4
