"""Face keypoint extractor: 70 keypoints per detected face ROI.

Mirrors FaceExtractorCaffe::forwardPass
(src/openpose/face/faceExtractorCaffe.cpp:205-330) with the per-person loop
replaced by one batched crop+forward (openpose_tpu.runtime.topdown).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from openpose_tpu.models.zoo import Model
from openpose_tpu.params import FACE_NUMBER_PARTS
from openpose_tpu.runtime.topdown import Rect, TopDownExtractor


class FaceExtractor:
    def __init__(self, model: Model, net_size: int = 368,
                 compute_dtype=jnp.bfloat16):
        self._topdown = TopDownExtractor(model, net_size, compute_dtype)

    def forward(self, image: np.ndarray,
                face_rects: Sequence[Rect]) -> np.ndarray:
        """-> [people, 70, 3] keypoints in image coordinates."""
        return self._topdown.extract(
            image, face_rects, [False] * len(face_rects), FACE_NUMBER_PARTS)
