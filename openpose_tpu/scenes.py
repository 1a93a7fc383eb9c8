"""Synthetic multi-person scene generation for closed-loop evaluation.

The reference measures accuracy by running COCO val through the binary and
scoring offline (scripts/tests/pose_accuracy_coco_val.sh:14-30); real weights
cannot be fetched in this environment, so accuracy is measured closed-loop:
scenes with known keypoints are rendered to net-output tensors
(train.make_targets), pushed through the REAL user path (sharded program ->
NMS -> PAF scoring -> greedy assembly -> CocoJsonSaver), and scored with the
built-in pycocotools-exact evaluator.  This module provides the scenes.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# Standing-person template for the 25 BODY_25 parts, unit height, origin at
# the nose, x right / y down (part order: poseParameters.cpp:7-33).
BODY25_TEMPLATE = np.array([
    (0.000, 0.000),    # 0  Nose
    (0.000, 0.120),    # 1  Neck
    (-0.100, 0.120),   # 2  RShoulder
    (-0.140, 0.260),   # 3  RElbow
    (-0.160, 0.400),   # 4  RWrist
    (0.100, 0.120),    # 5  LShoulder
    (0.140, 0.260),    # 6  LElbow
    (0.160, 0.400),    # 7  LWrist
    (0.000, 0.450),    # 8  MidHip
    (-0.060, 0.450),   # 9  RHip
    (-0.070, 0.650),   # 10 RKnee
    (-0.080, 0.850),   # 11 RAnkle
    (0.060, 0.450),    # 12 LHip
    (0.070, 0.650),    # 13 LKnee
    (0.080, 0.850),    # 14 LAnkle
    (-0.025, -0.030),  # 15 REye
    (0.025, -0.030),   # 16 LEye
    (-0.055, -0.010),  # 17 REar
    (0.055, -0.010),   # 18 LEar
    (0.100, 0.920),    # 19 LBigToe
    (0.120, 0.910),    # 20 LSmallToe
    (0.070, 0.880),    # 21 LHeel
    (-0.100, 0.920),   # 22 RBigToe
    (-0.120, 0.910),   # 23 RSmallToe
    (-0.070, 0.880),   # 24 RHeel
], np.float32)

# BODY_25 -> 17-keypoint COCO order (matches cocoJsonSaver.cpp:117-141 and
# io/json_io._COCO_ORDER_BY_PARTS[25])
COCO_ORDER_25 = [0, 16, 15, 18, 17, 5, 2, 6, 3, 7, 4, 12, 9, 13, 10, 14, 11]


def random_people(rng: np.random.RandomState, n_people: int,
                  frame_hw: Tuple[int, int],
                  height_range: Tuple[float, float] = (180.0, 300.0),
                  jitter: float = 2.0,
                  min_spacing: float = 90.0) -> np.ndarray:
    """[n_people, 25, 3] keypoints for one frame; all keypoints visible.

    People are horizontally spread (centers at least `min_spacing` px apart)
    so distinct people produce distinct heatmap blobs, with per-keypoint
    jitter so poses are not identical."""
    h, w = frame_hw
    people = np.zeros((n_people, 25, 3), np.float32)
    # candidate x-centers, spaced then shuffled
    margin = 60.0
    slots = np.linspace(margin, w - margin,
                        max(n_people, int((w - 2 * margin) // min_spacing)))
    rng.shuffle(slots)
    for p in range(n_people):
        height = rng.uniform(*height_range)
        height = min(height, (h - 20.0) / 0.95)  # template spans -0.03..0.92
        cx = slots[p % len(slots)] + rng.uniform(-15, 15)
        top = rng.uniform(8.0, max(9.0, h - height * 0.95 - 8.0))
        pts = BODY25_TEMPLATE.copy()
        if rng.rand() < 0.5:
            pts[:, 0] = -pts[:, 0]          # mirrored person
        kp = pts * height
        kp[:, 0] += cx
        kp[:, 1] += top + height * 0.03     # nose sits 3% below the top
        kp += rng.uniform(-jitter, jitter, kp.shape)
        kp[:, 0] = np.clip(kp[:, 0], 2.0, w - 3.0)
        kp[:, 1] = np.clip(kp[:, 1], 2.0, h - 3.0)
        people[p, :, :2] = kp
        people[p, :, 2] = 1.0
    return people


def render_scene_image(people: np.ndarray, frame_hw: Tuple[int, int],
                       background_noise: float = 8.0,
                       rng: np.random.RandomState = None) -> np.ndarray:
    """Render [H, W, 3] uint8 BGR image of the skeletons for TRAINING.

    Joints are disks color-coded by part index (HSV hue wheel) and limbs are
    lines colored by their pair index — a learnable synthetic domain: the
    CNN must map the drawn geometry back to part heatmaps + PAFs, closing
    the train->detect->assemble->AP loop without real photos."""
    import cv2
    h, w = frame_hw
    img = np.zeros((h, w, 3), np.uint8)
    if rng is not None and background_noise > 0:
        img[:] = np.clip(rng.normal(24, background_noise, (h, w, 3)),
                         0, 64).astype(np.uint8)
    n_parts = people.shape[1] if people.size else 25
    pairs = BODY25_DRAW_PAIRS if n_parts == 25 else \
        [(a, b) for a, b in BODY25_DRAW_PAIRS if a < n_parts and b < n_parts]

    def hue_color(idx, total, s=255, v=255):
        hsv = np.uint8([[[int(180 * idx / total), s, v]]])
        return tuple(int(c) for c in cv2.cvtColor(hsv,
                                                  cv2.COLOR_HSV2BGR)[0, 0])

    for person in people:
        for li, (a, b) in enumerate(pairs):
            if person[a, 2] > 0 and person[b, 2] > 0:
                cv2.line(img, tuple(person[a, :2].astype(int)),
                         tuple(person[b, :2].astype(int)),
                         hue_color(li, len(pairs), s=140, v=170), 2)
        for part in range(n_parts):
            if person[part, 2] > 0:
                cv2.circle(img, tuple(person[part, :2].astype(int)), 4,
                           hue_color(part, n_parts), -1)
    return img


# Limb drawing pairs (BODY_25 assembly pairs, poseParameters.cpp:416-422)
BODY25_DRAW_PAIRS = [
    (1, 8), (1, 2), (1, 5), (2, 3), (3, 4), (5, 6), (6, 7), (8, 9),
    (9, 10), (10, 11), (8, 12), (12, 13), (13, 14), (1, 0), (0, 15),
    (15, 17), (0, 16), (16, 18), (14, 19), (19, 20), (14, 21), (11, 22),
    (22, 23), (11, 24)]


def coco_ground_truth(people: np.ndarray, image_id: int) -> List[Dict]:
    """COCO annotation dicts (17-kp order, visibility 2, bbox area) for the
    [n, 25, 3] keypoints of one frame."""
    out = []
    for person in people:
        pts = person[COCO_ORDER_25]
        xs, ys = pts[:, 0], pts[:, 1]
        x0, y0 = float(xs.min()), float(ys.min())
        bw, bh = float(xs.max() - x0), float(ys.max() - y0)
        kp = []
        for x, y in zip(xs, ys):
            kp += [float(x), float(y), 2]
        out.append({"image_id": int(image_id), "keypoints": kp,
                    "num_keypoints": 17, "area": bw * bh,
                    "bbox": [x0, y0, bw, bh]})
    return out
