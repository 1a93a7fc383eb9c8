"""Drop-in compatibility shim for the reference Python API (`pyopenpose`).

Mirrors python/openpose/openpose_python.cpp:81-205 so scripts written
against the original bindings port with an import change:

    # import pyopenpose as op
    from openpose_tpu import pyopenpose as op

    params = {"model_folder": "models/", "net_resolution": "-1x368"}
    opWrapper = op.WrapperPython()
    opWrapper.configure(params)
    opWrapper.start()
    datum = op.Datum()
    datum.cvInputData = image_bgr
    opWrapper.emplaceAndPop(op.VectorDatum([datum]))
    print(datum.poseKeypoints)   # numpy [people, 25, 3]

Config keys follow the reference gflags names (openpose_python.cpp re-parses
the dict through gflags).  Unsupported keys raise with a clear message.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from openpose_tpu.params import PoseModel, POSE_MODEL_INFO


class Datum:
    """Field names follow the reference Datum bindings
    (openpose_python.cpp:315-410)."""

    def __init__(self):
        self.cvInputData: Optional[np.ndarray] = None
        self.cvOutputData: Optional[np.ndarray] = None
        self.poseKeypoints: Optional[np.ndarray] = None
        self.poseScores: Optional[np.ndarray] = None
        self.poseIds: Optional[np.ndarray] = None
        self.faceKeypoints: Optional[np.ndarray] = None
        self.faceRectangles: Optional[List] = None
        self.handKeypoints: List[Optional[np.ndarray]] = [None, None]
        self.handRectangles: Optional[List] = None
        self.poseKeypoints3D: Optional[np.ndarray] = None
        self.id: int = 0
        self.name: str = ""


def VectorDatum(datums: List[Datum]) -> List[Datum]:
    """The reference wraps datums in an opaque vector; a list works here."""
    return list(datums)


class WrapperPython:
    def __init__(self, mode: int = 0):
        self._params: Dict = {}
        self._wrapper = None
        self._id_extractor = None

    def configure(self, params: Dict) -> None:
        self._params = dict(params)

    def start(self) -> None:
        from openpose_tpu.wrapper import (FaceConfig, HandConfig, PoseConfig,
                                          Wrapper)
        p = self._params

        def res(key, default):
            text = p.get(key, default)
            w, h = str(text).lower().split("x")
            return (int(w), int(h))

        model = PoseModel(p.get("model_pose", "BODY_25"))
        pose = PoseConfig(
            enable=bool(p.get("body", 1)),
            model=model,
            net_resolution=res("net_resolution", "-1x368"),
            scale_number=int(p.get("scale_number", 1)),
            scale_gap=float(p.get("scale_gap", 0.25)),
            maximize_positives=bool(p.get("maximize_positives", False)),
            caffemodel=p.get("caffemodel_path") or None,
            number_people_max=int(p.get("number_people_max", -1)),
            render_threshold=float(p.get("render_threshold", 0.05)))
        face = FaceConfig(enable=bool(p.get("face", False)),
                          caffemodel=p.get("face_caffemodel_path") or None)
        hand = HandConfig(enable=bool(p.get("hand", False)),
                          caffemodel=p.get("hand_caffemodel_path") or None,
                          scale_number=int(p.get("hand_scale_number", 1)),
                          scale_range=float(p.get("hand_scale_range", 0.4)))
        self._wrapper = Wrapper(pose=pose, face=face, hand=hand)
        if p.get("identification"):
            from openpose_tpu.tracking.person_id import PersonIdExtractor
            self._id_extractor = PersonIdExtractor()

    def stop(self) -> None:
        self._wrapper = None

    def emplaceAndPop(self, datums: List[Datum]) -> bool:
        """Synchronous process of one datum vector (openpose_python.cpp:221)."""
        if self._wrapper is None:
            raise RuntimeError("call start() before emplaceAndPop()")
        for datum in datums:
            if datum.cvInputData is None:
                raise ValueError("datum.cvInputData is empty")
            d = self._wrapper.process(datum.cvInputData, datum.id, datum.name)
            datum.poseKeypoints = d.pose_keypoints
            datum.poseScores = d.pose_scores
            datum.faceKeypoints = d.face_keypoints
            datum.faceRectangles = d.face_rectangles
            datum.handKeypoints = [d.hand_left_keypoints,
                                   d.hand_right_keypoints]
            datum.handRectangles = d.hand_rectangles
            if self._id_extractor is not None and d.pose_keypoints is not None:
                datum.poseIds = self._id_extractor.extract_ids(
                    d.pose_keypoints, datum.cvInputData)
            datum.cvOutputData = self._wrapper.render(d)
        return True

    def execute(self) -> int:
        """Run the full CLI-style pipeline from the configured params until
        the producer is exhausted (the reference's WrapperPython::exec,
        openpose_python.cpp:205-214: blocks processing --image_dir/--video
        with all output writers).  Params map 1:1 to the CLI flag surface;
        returns the CLI exit code."""
        from openpose_tpu import cli
        argv = []
        for key, value in self._params.items():
            flag = f"--{key}"
            if isinstance(value, bool):
                if value:
                    argv.append(flag)
            else:
                argv += [flag, str(value)]
        return cli.main(argv)


# Model info helpers (openpose_python.cpp:60-80)
def getPoseBodyPartMapping(pose_model: str) -> Dict[int, str]:
    from openpose_tpu import params as _p
    return {
        "BODY_25": dict(_p.BODY_25_PARTS),
        "COCO_18": dict(_p.COCO_18_PARTS),
        "MPI_15": dict(_p.MPI_15_PARTS),
        "MPI_15_4": dict(_p.MPI_15_PARTS),
    }[pose_model]


def getPoseNumberBodyParts(pose_model: str) -> int:
    return POSE_MODEL_INFO[PoseModel(pose_model)].num_parts


def getPosePartPairs(pose_model: str) -> List[int]:
    return list(POSE_MODEL_INFO[PoseModel(pose_model)].pairs)


def getPoseMapIndex(pose_model: str) -> List[int]:
    return list(POSE_MODEL_INFO[PoseModel(pose_model)].map_idx)
