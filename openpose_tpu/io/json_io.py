"""Keypoint JSON writers: per-frame people JSON and COCO evaluation JSON.

People JSON reproduces the reference schema byte-compatibly at the structural
level (version "1.3", key order) — reference:
src/openpose/filestream/fileStream.cpp:306-345 savePeopleJson and
include/openpose/filestream/wPeopleJsonSaver.hpp:78-92 (key list).

COCO JSON reproduces CocoJsonSaver::record
(src/openpose/filestream/cocoJsonSaver.cpp:93-280): per-person entries with
model-specific part reordering into the 17-keypoint COCO order, -1 fill for
missing points, visibility 1/0, score = person score.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import numpy as np


def _flatten(arr: Optional[np.ndarray], person: int) -> List[float]:
    if arr is None or arr.size == 0:
        return []
    return [round(float(v), 6) for v in np.asarray(arr)[person].reshape(-1)]


def people_json(pose_keypoints: Optional[np.ndarray] = None,
                face_keypoints: Optional[np.ndarray] = None,
                hand_left_keypoints: Optional[np.ndarray] = None,
                hand_right_keypoints: Optional[np.ndarray] = None,
                pose_keypoints_3d: Optional[np.ndarray] = None,
                face_keypoints_3d: Optional[np.ndarray] = None,
                hand_left_keypoints_3d: Optional[np.ndarray] = None,
                hand_right_keypoints_3d: Optional[np.ndarray] = None,
                person_ids: Optional[Sequence[int]] = None,
                candidates: Optional[List[np.ndarray]] = None) -> Dict:
    """Build the per-frame people dict (serialize with json.dump)."""
    n_people = 0
    for arr in (pose_keypoints, face_keypoints, hand_left_keypoints,
                hand_right_keypoints):
        if arr is not None and arr.size:
            n_people = max(n_people, arr.shape[0])
    people = []
    for person in range(n_people):
        entry = {
            "person_id": [int(person_ids[person]) if person_ids is not None
                          and person < len(person_ids) else -1],
            "pose_keypoints_2d": _flatten(pose_keypoints, person),
            "face_keypoints_2d": _flatten(face_keypoints, person),
            "hand_left_keypoints_2d": _flatten(hand_left_keypoints, person),
            "hand_right_keypoints_2d": _flatten(hand_right_keypoints, person),
            "pose_keypoints_3d": _flatten(pose_keypoints_3d, person),
            "face_keypoints_3d": _flatten(face_keypoints_3d, person),
            "hand_left_keypoints_3d": _flatten(hand_left_keypoints_3d, person),
            "hand_right_keypoints_3d": _flatten(hand_right_keypoints_3d, person),
        }
        people.append(entry)
    out = {"version": 1.3, "people": people}
    if candidates is not None:
        out["part_candidates"] = [{
            str(part): [round(float(v), 6) for v in np.asarray(c).reshape(-1)]
            for part, c in enumerate(candidates)}]
    return out


def save_people_json(path: str, **kwargs) -> None:
    with open(path, "w") as f:
        json.dump(people_json(**kwargs), f, separators=(",", ":"))


# COCO part order maps (cocoJsonSaver.cpp:117-134)
_COCO_ORDER_BY_PARTS = {
    18: [0, 15, 14, 17, 16, 5, 2, 6, 3, 7, 4, 11, 8, 12, 9, 13, 10],
    25: [0, 16, 15, 18, 17, 5, 2, 6, 3, 7, 4, 12, 9, 13, 10, 14, 11],
    19: [0, 16, 15, 18, 17, 5, 2, 6, 3, 7, 4, 12, 9, 13, 10, 14, 11],
}
_FOOT_ORDER_BY_PARTS = {25: [19, 20, 21, 22, 23, 24]}


class CocoJsonSaver:
    """Accumulate COCO-format detection entries; write with .save()."""

    def __init__(self, foot: bool = False):
        self.entries: List[Dict] = []
        self.foot = foot

    def record(self, pose_keypoints: np.ndarray, pose_scores: np.ndarray,
               image_id: int) -> None:
        if pose_keypoints.size == 0:
            return
        num_parts = pose_keypoints.shape[1]
        order = (_FOOT_ORDER_BY_PARTS if self.foot
                 else _COCO_ORDER_BY_PARTS).get(num_parts)
        if order is None:
            raise ValueError(f"no COCO order for {num_parts} parts")
        for person in range(pose_keypoints.shape[0]):
            kp = pose_keypoints[person]
            valid = kp[order, 2] > 0
            if not valid.any():
                continue
            flat: List[float] = []
            for idx, v in zip(order, valid):
                flat += [float(kp[idx, 0]) if v else -1.0,
                         float(kp[idx, 1]) if v else -1.0,
                         1 if v else 0]
            self.entries.append({
                "image_id": int(image_id),
                "category_id": 1,
                "keypoints": [round(v, 3) if isinstance(v, float) else v
                              for v in flat],
                "score": round(float(pose_scores[person]), 6),
            })

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.entries, f)


def image_id_from_name(name: str) -> int:
    """Last number in the file name (getLastNumber, cocoJsonSaver.cpp)."""
    import re
    nums = re.findall(r"\d+", name)
    if not nums:
        raise ValueError(f"no number in image name {name!r}")
    return int(nums[-1])
