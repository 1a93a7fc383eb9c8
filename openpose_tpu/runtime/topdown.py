"""Shared top-down (per-person crop) extraction used by face and hand.

The reference loops the per-person crop -> CNN -> decode chain one person at
a time (faceExtractorCaffe.cpp:205-310, handExtractorCaffe.cpp:305-430);
here all people are batched into one device program: batched affine crop,
one CNN forward at batch = padded #people, 8x upsample, per-channel argmax.
Padding to power-of-two buckets bounds jit recompilation.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openpose_tpu.models.zoo import Model
from openpose_tpu.ops import maximum, resize, warp

Rect = Tuple[float, float, float, float]


def _bucket(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


class TopDownExtractor:
    """Batched crop -> net -> argmax decode for one (face or hand) model."""

    def __init__(self, model: Model, net_size: int = 368,
                 compute_dtype=jnp.bfloat16):
        self.model = model
        self.net_size = net_size
        self.compute_dtype = compute_dtype
        self._fn_cache = {}

    def _device_fn(self, batch: int, in_hw: Tuple[int, int]):
        key = (batch, in_hw)
        if key in self._fn_cache:
            return self._fn_cache[key]
        model = self.model
        net_size = self.net_size
        dtype = self.compute_dtype

        def run(params, image, transforms):
            crops = warp.crop_affine_batch(image, transforms, net_size)
            x = resize.normalize_vgg(crops)
            from openpose_tpu.models import graph as _graph
            out = _graph.forward(params, model.spec, x, dtype)
            # windowed equivalent of 8x-upsample + argmax (ops/maximum)
            return maximum.channel_argmax_refined(out)

        fn = jax.jit(run)
        self._fn_cache[key] = fn
        return fn

    def extract(self, image: np.ndarray, rects: Sequence[Rect],
                mirror: Sequence[bool], num_parts: int) -> np.ndarray:
        """image [H, W, 3] BGR float/uint8; rects/mirror per crop.

        Returns [len(rects), num_parts, 3] keypoints in image coordinates.
        Empty rects (w*h < minimum area, handExtractorCaffe.cpp:363) yield 0.
        """
        n = len(rects)
        out = np.zeros((n, num_parts, 3), np.float32)
        active = [i for i, r in enumerate(rects)
                  if min(r[2], r[3]) > 1 and r[2] * r[3] > 10]
        if not active:
            return out
        bucket = _bucket(len(active))
        transforms = np.zeros((bucket, 4), np.float32)
        for slot, i in enumerate(active):
            transforms[slot] = warp.rect_to_transform(
                rects[i], self.net_size, mirror[i])
        # inactive slots: zero-scale transform -> samples pixel (0,0); harmless
        transforms[len(active):] = (1.0, 1.0, -self.net_size * 2, 0.0)

        fn = self._device_fn(bucket, image.shape[:2])
        img = jnp.asarray(np.ascontiguousarray(image, np.float32))
        peaks = np.asarray(fn(self.model.params, img,
                              jnp.asarray(transforms)))  # [bucket, C, 3]
        for slot, i in enumerate(active):
            kp = peaks[slot, :num_parts]          # drop background channel
            xy = warp.map_back(kp[:, :2], transforms[slot])
            out[i, :, 0] = xy[:, 0]
            out[i, :, 1] = xy[:, 1]
            out[i, :, 2] = kp[:, 2]
        return out
