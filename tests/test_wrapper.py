"""Wrapper facade + pyopenpose shim tests (tiny nets on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from openpose_tpu.params import PoseModel
from openpose_tpu.wrapper import Datum, PoseConfig, Wrapper


@pytest.fixture(scope="module")
def small_wrapper():
    return Wrapper(pose=PoseConfig(
        model=PoseModel.MPI_15_4, net_resolution=(-1, 64),
        compute_dtype="float32", number_people_max=2))


class TestWrapper:
    def test_process_shapes(self, small_wrapper):
        img = np.random.RandomState(0).randint(
            0, 255, (60, 80, 3), np.uint8)
        d = small_wrapper.process(img, datum_id=7, name="f7")
        assert isinstance(d, Datum)
        assert d.id == 7 and d.name == "f7"
        assert d.pose_keypoints.shape[1:] == (15, 3)
        assert d.pose_keypoints.shape[0] <= 2  # number_people_max
        assert d.pose_scores.shape[0] == d.pose_keypoints.shape[0]

    def test_render_returns_frame(self, small_wrapper):
        img = np.random.RandomState(1).randint(
            0, 255, (60, 80, 3), np.uint8)
        d = small_wrapper.process(img)
        out = small_wrapper.render(d)
        assert out.shape == img.shape
        assert d.output_frame is not None

    def test_rejects_bad_input(self, small_wrapper):
        with pytest.raises(ValueError, match="BGR"):
            small_wrapper.process(np.zeros((32, 32), np.uint8))


class TestPyOpenPoseShim:
    def test_emplace_and_pop(self):
        from openpose_tpu import pyopenpose as op
        wrapper = op.WrapperPython()
        wrapper.configure({"model_pose": "MPI_15_4",
                           "net_resolution": "-1x64",
                           "number_people_max": 1})
        wrapper.start()
        datum = op.Datum()
        datum.cvInputData = np.random.RandomState(2).randint(
            0, 255, (48, 64, 3), np.uint8)
        ok = wrapper.emplaceAndPop(op.VectorDatum([datum]))
        assert ok
        assert datum.poseKeypoints is not None
        assert datum.poseKeypoints.shape[1:] == (15, 3)
        assert datum.cvOutputData.shape == (48, 64, 3)

    def test_model_info_helpers(self):
        from openpose_tpu import pyopenpose as op
        assert op.getPoseNumberBodyParts("BODY_25") == 25
        assert op.getPoseBodyPartMapping("BODY_25")[0] == "Nose"
        assert len(op.getPosePartPairs("COCO_18")) == 38
        assert len(op.getPoseMapIndex("BODY_25")) == 52

    def test_requires_start(self):
        from openpose_tpu import pyopenpose as op
        wrapper = op.WrapperPython()
        with pytest.raises(RuntimeError, match="start"):
            wrapper.emplaceAndPop([op.Datum()])


class TestPyopenposeExecute:
    def test_execute_runs_cli_pipeline(self, tmp_path):
        import cv2
        import json
        from openpose_tpu import pyopenpose as op
        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.RandomState(0)
        for i in range(2):
            cv2.imwrite(str(d / f"f_{i:03d}.png"),
                        rng.randint(0, 255, (48, 64, 3), np.uint8))
        out = tmp_path / "json"
        w = op.WrapperPython()
        w.configure({"image_dir": str(d), "write_json": str(out),
                     "net_resolution": "64x48", "fp32": True, "batch": 1})
        rc = w.execute()
        assert rc == 0
        files = sorted(out.glob("*_keypoints.json"))
        assert len(files) == 2
        assert json.loads(files[0].read_text())["version"] == 1.3
