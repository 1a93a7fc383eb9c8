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


_REF_PYBIND = "/root/reference/python/openpose/openpose_python.cpp"


class TestPyOpenPoseSurfaceParity:
    """Automated parity of the shim's surface against the reference pybind
    module (openpose_python.cpp), parsed from the source itself."""

    @pytest.fixture(scope="class")
    def ref_source(self):
        import pathlib
        p = pathlib.Path(_REF_PYBIND)
        if not p.exists():
            pytest.skip("reference source not mounted")
        return p.read_text()

    def test_datum_field_surface(self, ref_source):
        import re
        from openpose_tpu import pyopenpose as op
        block = ref_source.split('py::class_<Datum', 1)[1].split(";", 1)[0]
        fields = re.findall(r'def_readwrite\("(\w+)"', block)
        assert len(fields) >= 30            # guard against parse regressions
        datum = op.Datum()
        missing = [f for f in fields if not hasattr(datum, f)]
        assert not missing, f"Datum lacks reference fields: {missing}"

    def test_wrapper_method_surface(self, ref_source):
        import re
        from openpose_tpu import pyopenpose as op
        block = ref_source.split('py::class_<WrapperPython', 1)[1] \
            .split(";", 1)[0]
        methods = re.findall(r'\.def\("(\w+)"', block)
        w = op.WrapperPython()
        missing = [m for m in methods if not hasattr(w, m)]
        assert not missing, f"WrapperPython lacks methods: {missing}"

    def test_module_function_surface(self, ref_source):
        import re
        from openpose_tpu import pyopenpose as op
        fns = re.findall(r'm\.def\("(\w+)"', ref_source)
        missing = [f for f in fns if not hasattr(op, f)]
        assert not missing, f"module lacks functions: {missing}"

    def test_enum_surface(self, ref_source):
        import re
        from openpose_tpu import pyopenpose as op
        for enum_name, block in re.findall(
                r'py::enum_<(\w+)>[^;]*?\)((?:\s*\.value\("\w+[^;]*?)*);',
                ref_source):
            values = re.findall(r'\.value\("(\w+)"', block)
            holder = getattr(op, enum_name)
            missing = [v for v in values if not hasattr(holder, v)]
            assert not missing, f"{enum_name} lacks values: {missing}"


class TestPyOpenPoseAsyncAndInjection:
    @pytest.fixture(scope="class")
    def started(self):
        from openpose_tpu import pyopenpose as op
        w = op.WrapperPython(op.ThreadManagerMode.Asynchronous)
        w.configure({"model_pose": "MPI_15_4", "net_resolution": "-1x64",
                     "number_people_max": 1})
        w.start()
        return op, w

    def test_wait_and_emplace_pop(self, started):
        op, w = started
        datum = op.Datum()
        datum.cvInputData = np.random.RandomState(3).randint(
            0, 255, (48, 64, 3), np.uint8)
        assert w.waitAndEmplace(op.VectorDatum([datum]))
        out = []
        assert w.waitAndPop(out)
        assert out and out[0].poseKeypoints is not None
        assert not w.waitAndPop(out)        # queue drained

    def test_geometry_fields_filled(self, started):
        op, w = started
        datum = op.Datum()
        datum.cvInputData = np.random.RandomState(4).randint(
            0, 255, (48, 64, 3), np.uint8)
        w.emplaceAndPop([datum])
        assert datum.scaleInputToNetInputs
        assert datum.netInputSizes and datum.netInputSizes[0].y == 64
        assert datum.scaleNetToOutput > 0
        assert datum.netOutputSize.x > 0

    def test_pose_net_output_injection(self, started):
        """datum.poseNetOutput bypasses the CNN (datum.hpp:212-217): the
        injected map, not the image, determines the detected peaks."""
        op, w = started
        from openpose_tpu.params import POSE_MODEL_INFO, PoseModel
        info = POSE_MODEL_INFO[PoseModel.MPI_15_4]
        datum = op.Datum()
        datum.cvInputData = np.zeros((48, 64, 3), np.uint8)
        w.emplaceAndPop([datum])            # discover net-output geometry
        nw, nh = datum.netOutputSize.x, datum.netOutputSize.y
        inj = np.zeros((nh // 8, nw // 8, info.heatmap_channels), np.float32)
        y, x = nh // 16, nw // 16
        inj[y - 1:y + 2, x - 1:x + 2, 0] = 0.5
        inj[y, x, 0] = 1.0                  # one clean peak on part 0
        injected = op.Datum()
        injected.cvInputData = datum.cvInputData
        injected.poseNetOutput = inj
        w.emplaceAndPop([injected])
        kp = injected.poseKeypoints
        assert kp is not None and kp.shape[0] >= 0
        # part 0 candidate exists near the injected location (input px)
        cands = injected.poseCandidates
        if cands is not None:
            assert len(cands) == info.num_parts

    def test_hand_rectangle_pairs_injection(self):
        """handRectangles carries (left, right) pairs per person
        (datum.hpp:166-172); the shim must preserve the pair structure
        for detector mode 2."""
        from openpose_tpu import pyopenpose as op
        w = op.WrapperPython()
        w.configure({"model_pose": "MPI_15_4", "net_resolution": "-1x64",
                     "hand": 1, "hand_detector": 2})
        w.start()
        d = op.Datum()
        d.cvInputData = np.random.RandomState(6).randint(
            0, 255, (96, 128, 3), np.uint8)
        d.handRectangles = [[op.Rectangle(10, 10, 30, 30),
                             op.Rectangle(60, 30, 30, 30)]]
        assert w.emplaceAndPop([d])
        left, right = d.handKeypoints
        assert left is not None and left.shape[1:] == (21, 3)
        assert right is not None and right.shape[1:] == (21, 3)

    def test_get_images_on_directory(self, tmp_path):
        from openpose_tpu import pyopenpose as op
        (tmp_path / "b.jpg").write_bytes(b"x")
        (tmp_path / "a.png").write_bytes(b"x")
        (tmp_path / "c.txt").write_bytes(b"x")
        found = op.get_images_on_directory(str(tmp_path))
        assert [f.split("/")[-1] for f in found] == ["a.png", "b.jpg"]

    def test_init_argv_and_configure_merge(self):
        from openpose_tpu import pyopenpose as op
        op._GLOBAL_PARAMS.clear()
        op.init_argv(["--model_pose", "MPI_15_4", "--face",
                      "--net_resolution=-1x64"])
        w = op.WrapperPython()
        w.configure({"face": 0})
        assert w._params["model_pose"] == "MPI_15_4"
        assert w._params["net_resolution"] == "-1x64"
        assert w._params["face"] == 0       # explicit configure wins
        op._GLOBAL_PARAMS.clear()


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
