"""Hand keypoint extractor: 2 x 21 keypoints per person.

Mirrors HandExtractorCaffe::forwardPass
(src/openpose/hand/handExtractorCaffe.cpp:305-430): left-hand crops are
mirrored before the net (cropFrame, ibid:44-74) — encoded here as a negative
x-scale in the batched affine transform, so left and right hands run in the
SAME batched forward.  Optional multi-scale re-runs keep the best-scoring
scale per hand (ibid:390-430).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from openpose_tpu.models.zoo import Model
from openpose_tpu.params import HAND_NUMBER_PARTS
from openpose_tpu.runtime.topdown import Rect, TopDownExtractor


def _recenter(rect: Rect, new_w: float, new_h: float) -> Rect:
    """recenter (include/openpose/utilities/rectangle-like helper)."""
    cx = rect[0] + rect[2] / 2.0
    cy = rect[1] + rect[3] / 2.0
    return (cx - new_w / 2.0, cy - new_h / 2.0, new_w, new_h)


class HandExtractor:
    def __init__(self, model: Model, net_size: int = 368,
                 compute_dtype=jnp.bfloat16,
                 scale_number: int = 1, scale_range: float = 0.4):
        self._topdown = TopDownExtractor(model, net_size, compute_dtype)
        self.scale_number = scale_number
        self.scale_range = scale_range

    def _run(self, image, rects_lr: Sequence[Tuple[Rect, Rect]]):
        rects: List[Rect] = []
        mirror: List[bool] = []
        for left, right in rects_lr:
            rects.append(left)
            mirror.append(True)     # left hand is mirrored
            rects.append(right)
            mirror.append(False)
        kp = self._topdown.extract(image, rects, mirror, HAND_NUMBER_PARTS)
        n = len(rects_lr)
        return kp.reshape(n, 2, HAND_NUMBER_PARTS, 3)

    def forward(self, image: np.ndarray,
                hand_rects: Sequence[Tuple[Rect, Rect]]
                ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (left [people, 21, 3], right [people, 21, 3]) image coords."""
        n = len(hand_rects)
        if n == 0:
            z = np.zeros((0, HAND_NUMBER_PARTS, 3), np.float32)
            return z, z.copy()
        if self.scale_number <= 1:
            kp = self._run(image, hand_rects)
            return kp[:, 0], kp[:, 1]

        # Multi-scale: evaluate each scale for all hands, keep best avg score
        best = None
        init_scale = 1.0 - self.scale_range / 2.0
        for i in range(self.scale_number):
            scale = init_scale + self.scale_range * i / (self.scale_number - 1.0)
            scaled = [tuple(
                _recenter(r, round(r[2] * scale) // 2 * 2,
                          round(r[3] * scale) // 2 * 2) for r in lr)
                for lr in hand_rects]
            kp = self._run(image, scaled)
            if best is None:
                best = kp
            else:
                cur_score = kp[..., 2].mean(axis=-1)       # [n, 2]
                best_score = best[..., 2].mean(axis=-1)
                take = cur_score > best_score
                best = np.where(take[..., None, None], kp, best)
        return best[:, 0], best[:, 1]
