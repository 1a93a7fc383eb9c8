"""Batched affine crop: extract per-person square ROIs as net inputs.

Replaces the reference's per-person cv::warpAffine calls
(src/openpose/face/faceExtractorCaffe.cpp:231-244, hand cropFrame in
src/openpose/hand/handExtractorCaffe.cpp:44-74) with ONE batched gather:
all people of a frame are cropped in a single device op, so the downstream
face/hand CNN runs a single batched forward instead of a per-person loop
(the reference's known O(#people) weakness, SURVEY §7 "Hard parts").

Semantics per crop (WARP_INVERSE_MAP): dst(x, y) = src(a*x + tx, s*y + ty)
with a = -s, tx = rect.x + rect.w for mirrored (left-hand) crops;
bilinear taps, black constant border.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_size",))
def crop_affine_batch(image: jax.Array, transforms: jax.Array,
                      out_size=368) -> jax.Array:
    """image: [H, W, 3] float; transforms: [P, 4] rows (sx, sy, tx, ty)
    meaning src_x = sx*dst_x + tx, src_y = sy*dst_y + ty.
    out_size: int (square) or (out_h, out_w).
    Returns [P, out_h, out_w, 3]; out-of-image samples are 0.
    """
    out_h, out_w = (out_size, out_size) if isinstance(out_size, int) \
        else out_size
    h, w = image.shape[0], image.shape[1]
    gx = jnp.arange(out_w, dtype=jnp.float32)
    gy = jnp.arange(out_h, dtype=jnp.float32)

    sx = transforms[:, 0][:, None, None]
    sy = transforms[:, 1][:, None, None]
    tx = transforms[:, 2][:, None, None]
    ty = transforms[:, 3][:, None, None]
    src_x = sx * gx[None, None, :] + tx            # [P, 1, W] -> bcast
    src_y = sy * gy[None, :, None] + ty            # [P, H, 1]
    src_x = jnp.broadcast_to(src_x, (transforms.shape[0], out_h, out_w))
    src_y = jnp.broadcast_to(src_y, (transforms.shape[0], out_h, out_w))

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    dx = (src_x - x0)[..., None]
    dy = (src_y - y0)[..., None]

    def tap(yy, xx):
        valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        vals = image[yi, xi]                        # [P, S, S, 3]
        return jnp.where(valid[..., None], vals, 0.0)

    out = (tap(y0, x0) * (1 - dx) * (1 - dy)
           + tap(y0, x0 + 1) * dx * (1 - dy)
           + tap(y0 + 1, x0) * (1 - dx) * dy
           + tap(y0 + 1, x0 + 1) * dx * dy)
    return out


def rect_to_transform(rect_xywh, net_side: int, mirror: bool):
    """(x, y, w, h) square rect -> (sx, sy, tx, ty) row.

    Mirrored crops use sx = -scale, tx = x + w (cropFrame,
    handExtractorCaffe.cpp:51-62)."""
    x, y, rw, rh = rect_xywh
    scale = max(rw, rh) / float(net_side)
    if mirror:
        return (-scale, scale, x + rw, y)
    return (scale, scale, x, y)


def map_forward(keypoints_xy, transform):
    """Inverse of map_back: [.., 2] image-space keypoints -> crop space
    (dst = (src - t) / s per axis)."""
    sx, sy, tx, ty = transform
    import numpy as np
    out = np.asarray(keypoints_xy, dtype=np.float32).copy()
    out[..., 0] = (keypoints_xy[..., 0] - tx) / sx
    out[..., 1] = (keypoints_xy[..., 1] - ty) / sy
    return out


def map_back(keypoints_xy, transform):
    """Map [.., 2] crop-space keypoints back to image space via the same
    affine (connectKeypoints, handExtractorCaffe.cpp:76-95)."""
    sx, sy, tx, ty = transform
    import numpy as np
    out = np.asarray(keypoints_xy, dtype=np.float32).copy()
    out[..., 0] = sx * keypoints_xy[..., 0] + tx
    out[..., 1] = sy * keypoints_xy[..., 1] + ty
    return out
