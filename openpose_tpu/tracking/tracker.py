"""Temporal person tracker: fill CNN-skipped frames with LK-propagated poses.

Mirrors PersonTracker (src/openpose/tracking/personTracker.cpp:386-535) +
the stride logic of PoseExtractor (src/openpose/pose/poseExtractor.cpp:37-54):
with ``tracking = N``, the CNN runs on frames where
``frame_id % (N+1) == 0``; in between, keypoints ride optical flow.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from openpose_tpu.tracking import lk


class PersonTracker:
    def __init__(self, confidence_threshold: float = 0.05,
                 merge_results: bool = True):
        self.confidence_threshold = confidence_threshold
        self.merge_results = merge_results
        self.prev_gray: Optional[np.ndarray] = None
        self.keypoints: Optional[np.ndarray] = None   # [P, parts, 3]

    def reset(self) -> None:
        self.prev_gray = None
        self.keypoints = None

    def observe(self, pose_keypoints: np.ndarray,
                frame_bgr: np.ndarray) -> None:
        """Record a CNN-detected frame as the new tracking base."""
        self.keypoints = np.asarray(pose_keypoints, np.float32).copy()
        self.prev_gray = frame_bgr.mean(axis=-1).astype(np.float32)

    def track(self, frame_bgr: np.ndarray) -> np.ndarray:
        """Propagate the last observed keypoints to this frame via LK."""
        gray = frame_bgr.mean(axis=-1).astype(np.float32)
        if self.keypoints is None or self.prev_gray is None \
                or self.keypoints.size == 0:
            self.prev_gray = gray
            return self.keypoints if self.keypoints is not None \
                else np.zeros((0, 0, 3), np.float32)
        p, parts, _ = self.keypoints.shape
        pts = self.keypoints[..., :2].reshape(-1, 2)
        new_pts, valid = lk.pyramidal_lk(self.prev_gray, gray, pts)
        new_pts = np.asarray(new_pts).reshape(p, parts, 2)
        valid = np.asarray(valid).reshape(p, parts)
        out = self.keypoints.copy()
        conf_ok = out[..., 2] > self.confidence_threshold
        move = conf_ok & valid
        out[..., 0] = np.where(move, new_pts[..., 0], out[..., 0])
        out[..., 1] = np.where(move, new_pts[..., 1], out[..., 1])
        out[..., 2] = np.where(conf_ok & ~valid, 0.0, out[..., 2])
        self.keypoints = out
        self.prev_gray = gray
        return out


class TrackingPoseExtractor:
    """PoseExtractor + tracking stride (poseExtractor.cpp:37-54)."""

    def __init__(self, pose_extractor, tracking: int = 0,
                 **forward_kwargs):
        self.pose_extractor = pose_extractor
        self.tracking = tracking
        self.forward_kwargs = forward_kwargs
        self.tracker = PersonTracker()
        self.frame_id = 0

    def forward(self, frame_bgr: np.ndarray) -> np.ndarray:
        run_cnn = (self.tracking <= 0
                   or self.frame_id % (self.tracking + 1) == 0)
        if run_cnn:
            pred = self.pose_extractor.forward(frame_bgr,
                                               **self.forward_kwargs)
            keypoints = pred.keypoints
            self.tracker.observe(keypoints, frame_bgr)
        else:
            keypoints = self.tracker.track(frame_bgr)
        self.frame_id += 1
        return keypoints
