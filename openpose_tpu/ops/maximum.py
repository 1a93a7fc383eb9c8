"""Per-channel argmax decode (single-person top-down keypoints).

Mirrors MaximumCaffe / maximumCpu (src/openpose/net/maximumBase.cpp:7-55):
for each channel, the (x, y) of the first row-major maximum and its value.
The reference decodes face/hand crops by 8x-bicubic-upsampling the net
output and argmaxing the full upsampled image (faceExtractorCaffe.cpp:
230-310); ``channel_argmax_refined`` computes the SAME result from a small
window around the coarse peak — the upsample of a 368x368x71 crop is pure
HBM traffic (~38 MB/crop) of which only the +-2-map-px neighborhood of the
max can contain the upsampled argmax of a unimodal peak.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


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


_WIN = 9            # map-px window half-width 4 around the coarse peak


def _win_params(upsample: int):
    """(up_lo, up_n): local upsampled px j in [up*c + up_lo,
    up*c + up_lo + up_n), i.e. +-1.5..2.5 map px around the coarse peak —
    wide enough that the interpolated argmax of a unimodal peak cannot
    escape it, narrow enough that every cubic tap stays inside _WIN."""
    return -(3 * upsample) // 2, 4 * upsample


@functools.lru_cache(maxsize=None)
def _window_cubic_matrix(upsample: int) -> np.ndarray:
    """[up_n, _WIN] Catmull-Rom weights: local upsampled px u (global
    j = upsample*c + up_lo + u) sampled at map coord (j+0.5)/up - 0.5,
    expressed relative to window row 0 (= map row c - 4).  All taps fall
    strictly inside the window, so the matrix is position-independent."""
    from openpose_tpu.ops.resize import _cubic_weights
    up_lo, up_n = _win_params(upsample)
    u = np.arange(up_n, dtype=np.float64)
    rel = (u + up_lo + 0.5) / upsample - 0.5 + (_WIN - 1) / 2
    t1 = np.floor(rel).astype(np.int64)
    if (t1 - 1).min() < 0 or (t1 + 2).max() >= _WIN:
        raise ValueError(f"cubic taps escape the {_WIN}-px window for "
                         f"upsample={upsample}")
    w4 = _cubic_weights(rel - t1, a=-0.5)
    mat = np.zeros((up_n, _WIN), dtype=np.float64)
    for i in range(4):
        np.add.at(mat, (np.arange(up_n), t1 - 1 + i), w4[:, i])
    return mat.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("upsample",))
def channel_argmax_refined(maps: jax.Array, upsample: int = 8) -> jax.Array:
    """[N, h, w, C] net-output maps -> [N, C, 3] (x, y, score) in
    UPSAMPLED (crop) pixel coordinates — equivalent to
    ``channel_argmax(resize_bicubic(maps, (h*up, w*up)))`` for unimodal
    channels, at ~1/(up^2) of the HBM traffic.

    Window semantics: coarse per-channel argmax, a 9x9 map window around it
    (edge-clamped), Catmull-Rom-upsampled to 32x32 covering +-2 map px, then
    the window argmax.  Differences vs the full upsample are possible only
    for peaks within 4 map px of the border or secondary modes > 2 map px
    away that beat the primary after interpolation (neither occurs for the
    Gaussian-like peaks trained nets emit).
    """
    n, h, w, c = maps.shape
    chw = maps.transpose(0, 3, 1, 2)                 # [n, c, h, w]
    flat = chw.reshape(n, c, h * w)
    idx = jnp.argmax(flat, axis=-1)
    cx = (idx % w).astype(jnp.int32)                 # [n, c]
    cy = (idx // w).astype(jnp.int32)

    offs = jnp.arange(-(_WIN // 2), _WIN // 2 + 1)
    ys = jnp.clip(cy[..., None] + offs, 0, h - 1)    # [n, c, 9]
    xs = jnp.clip(cx[..., None] + offs, 0, w - 1)
    rows = jnp.take_along_axis(chw, ys[..., None], axis=2)   # [n, c, 9, w]
    patch = jnp.take_along_axis(rows, xs[..., None, :], axis=3)

    up_lo, up_n = _win_params(upsample)
    wmat = jnp.asarray(_window_cubic_matrix(upsample))
    up = jnp.einsum("ui,ncij,vj->ncuv", wmat, patch.astype(jnp.float32),
                    wmat, precision=jax.lax.Precision.HIGHEST)
    uflat = up.reshape(n, c, up_n * up_n)
    uidx = jnp.argmax(uflat, axis=-1)
    score = jnp.take_along_axis(uflat, uidx[..., None], axis=-1)[..., 0]
    uy = (uidx // up_n).astype(jnp.int32)
    ux = (uidx % up_n).astype(jnp.int32)
    x = jnp.clip(cx * upsample + up_lo + ux, 0, w * upsample - 1)
    y = jnp.clip(cy * upsample + up_lo + uy, 0, h * upsample - 1)
    return jnp.stack([x.astype(jnp.float32), y.astype(jnp.float32),
                      score], axis=-1)
