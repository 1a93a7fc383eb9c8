"""Per-channel argmax decode (single-person top-down keypoints).

Mirrors MaximumCaffe / maximumCpu (src/openpose/net/maximumBase.cpp:7-55):
for each channel, the (x, y) of the first row-major maximum and its value.
Used by the face/hand extractors after the 8x heatmap upsample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def channel_argmax(heatmaps: jax.Array) -> jax.Array:
    """[N, H, W, C] -> [N, C, 3] (x, y, score), first max in row-major order."""
    n, h, w, c = heatmaps.shape
    flat = heatmaps.transpose(0, 3, 1, 2).reshape(n, c, h * w)
    idx = jnp.argmax(flat, axis=-1)
    score = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    x = (idx % w).astype(jnp.float32)
    y = (idx // w).astype(jnp.float32)
    return jnp.stack([x, y, score], axis=-1)
