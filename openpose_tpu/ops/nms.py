"""NMS peak extraction: 3x3 local maxima + 7x7 sub-pixel refinement.

Reference semantics (src/openpose/net/nmsBase.cpp:6-170, CUDA twin
nmsBase.cu):

* interior pixels (1 < x < W-2, 1 < y < H-2): peak iff value > threshold and
  strictly greater than all 8 neighbors;
* first inner border (x==1 | x==W-2 | y==1 | y==H-2): ``>=`` comparisons, with
  missing neighbors treated as `threshold` (this asymmetric rule absorbs the
  resize artifacts the reference documents at nmsBase.cpp:10-14);
* outermost border: never a peak;
* peaks are emitted in row-major scan order, capped at `max_peaks`;
* sub-pixel refinement (nmsAccuratePeakPosition, nmsBase.cpp:70-107): score-
  weighted centroid over the 7x7 window (only score>0 samples) plus a
  (+0.5, +0.5) "Matlab offset"; the reported score is the raw peak value.

Output layout matches the reference target blob: [N, C, max_peaks+1, 3] with
slot 0 carrying the peak count in component 0.

The implementation is pure XLA: shifted compares + two separable 7-tap
convolutions + top_k compaction — all fusable, no data-dependent shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _shift2d(x: jax.Array, dy: int, dx: int, fill: jax.Array) -> jax.Array:
    """x[..., y+dy, x+dx, ...] for NHWC input, filling out-of-range with fill."""
    n, h, w, c = x.shape
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=0.0)
    shifted = jax.lax.dynamic_slice(padded, (0, 1 + dy, 1 + dx, 0), x.shape)
    # Mark out-of-range lanes with `fill`
    ys = jnp.arange(h)[None, :, None, None] + dy
    xs = jnp.arange(w)[None, None, :, None] + dx
    valid = (ys >= 0) & (ys < h) & (xs >= 0) & (xs < w)
    return jnp.where(valid, shifted, fill)


def _refine_at_peaks(heat_c: jax.Array, peak_idx: jax.Array, h: int, w: int,
                     offset: Tuple[float, float]
                     ) -> Tuple[jax.Array, jax.Array]:
    """Sub-pixel refinement gathered only at the peak windows.

    heat_c: [N, C, H*W]; peak_idx: [N, C, K] flat indices.  Returns refined
    (x, y) [N, C, K].  Mirrors nmsAccuratePeakPosition (nmsBase.cpp:70-107):
    score-weighted centroid of score>0 samples over the in-bounds part of the
    7x7 window, plus the (+0.5, +0.5) offset.  Gathering 49 taps at <=K peaks
    is ~200x less memory traffic than box-filtering the whole map.
    """
    n, c, k = peak_idx.shape
    py = peak_idx // w                                   # [N,C,K]
    px = peak_idx % w
    d = jnp.arange(-3, 4, dtype=jnp.int32)
    wy = py[..., None, None] + d[:, None]                # [N,C,K,7,1]
    wx = px[..., None, None] + d[None, :]                # [N,C,K,1,7]
    inside = (wy >= 0) & (wy < h) & (wx >= 0) & (wx < w)  # [N,C,K,7,7]
    idx = (jnp.clip(wy, 0, h - 1) * w
           + jnp.clip(wx, 0, w - 1)).reshape(n, c, -1)
    vals = jnp.take_along_axis(heat_c, idx, axis=-1).reshape(n, c, k, 7, 7)
    s = jnp.where(inside, jnp.maximum(vals, 0.0), 0.0)
    s_sum = s.sum(axis=(-1, -2))
    denom = jnp.where(s_sum > 0, s_sum, 1.0)
    x_ref = (s * wx.astype(s.dtype)).sum(axis=(-1, -2)) / denom + offset[0]
    y_ref = (s * wy.astype(s.dtype)).sum(axis=(-1, -2)) / denom + offset[1]
    return x_ref, y_ref


@functools.partial(jax.jit, static_argnames=("max_peaks", "offset"))
def nms(heatmaps: jax.Array, threshold: jax.Array, max_peaks: int = 127,
        offset: Tuple[float, float] = (0.5, 0.5)) -> jax.Array:
    """Extract peaks from [N, H, W, C] part heatmaps.

    Returns [N, C, max_peaks+1, 3] float32; [n, c, 0, 0] is the count,
    slots 1..count are (x, y, score) in row-major discovery order.
    """
    heat = heatmaps.astype(jnp.float32)
    n, h, w, c = heat.shape
    thr = jnp.asarray(threshold, jnp.float32)

    neigh = [_shift2d(heat, dy, dx, thr)
             for dy in (-1, 0, 1) for dx in (-1, 0, 1) if not (dy == 0 and dx == 0)]
    gt_all = jnp.ones_like(heat, bool)
    ge_all = jnp.ones_like(heat, bool)
    for nb in neigh:
        gt_all &= heat > nb
        ge_all &= heat >= nb

    ys = jnp.arange(h)[None, :, None, None]
    xs = jnp.arange(w)[None, None, :, None]
    interior = (xs > 1) & (xs < w - 2) & (ys > 1) & (ys < h - 2)
    inner = ((xs == 1) | (xs == w - 2) | (ys == 1) | (ys == h - 2))
    is_peak = (heat > thr) & ((interior & gt_all) | (inner & ge_all))

    # Compaction: first `max_peaks` peaks in row-major order per (n, c).
    # Two-stage exact selection: a direct top_k over H*W elements is slow on
    # TPU (O(k * n) partial-sort passes); instead reduce to candidate blocks
    # first.  The first `max_peaks` peaks lie within the first <= max_peaks
    # 128-pixel blocks that contain any peak, so selecting those blocks by
    # their first-peak index (a cheap min-reduce) and running top_k on the
    # gathered candidates is exact and ~15x less work.
    flat_idx = (ys * w + xs).astype(jnp.int32)          # [1,H,W,1]
    big = jnp.int32(h * w)
    masked = jnp.where(is_peak, flat_idx, big)          # [N,H,W,C]
    masked = masked.transpose(0, 3, 1, 2).reshape(n, c, h * w)
    bs = 128
    nb = -(-h * w // bs)
    padded = jnp.pad(masked, ((0, 0), (0, 0), (0, nb * bs - h * w)),
                     constant_values=big)
    blocks = padded.reshape(n, c, nb, bs)
    block_first = blocks.min(axis=-1)                   # [N,C,NB]
    k_blocks = min(max_peaks, nb)
    neg_blk, blk_id = jax.lax.top_k(-block_first, k_blocks)
    # blk_id ordered by ascending first-peak index; empty blocks sort last
    cand = jnp.take_along_axis(blocks, blk_id[..., None], axis=2)
    cand = cand.reshape(n, c, k_blocks * bs)
    neg_topk, _ = jax.lax.top_k(-cand, max_peaks)       # ascending row-major idx
    peak_idx = -neg_topk                                # [N,C,max_peaks]
    valid = peak_idx < big
    count = valid.sum(axis=-1).astype(jnp.float32)      # [N,C]
    peak_idx = jnp.where(valid, peak_idx, 0)

    heat_c = heat.transpose(0, 3, 1, 2).reshape(n, c, h * w)
    x_ref, y_ref = _refine_at_peaks(heat_c, peak_idx, h, w, offset)
    px = jnp.where(valid, x_ref, 0.0)
    py = jnp.where(valid, y_ref, 0.0)
    ps = jnp.where(valid, jnp.take_along_axis(heat_c, peak_idx, axis=-1), 0.0)

    peaks = jnp.stack([px, py, ps], axis=-1)            # [N,C,max_peaks,3]
    header = jnp.zeros((n, c, 1, 3), jnp.float32).at[:, :, 0, 0].set(count)
    return jnp.concatenate([header, peaks], axis=2)
