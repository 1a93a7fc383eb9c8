"""PAF line-integral pair scoring on device.

Computes, for every limb pair (A-part, B-part) and every candidate peak
combination (i, j), the part-affinity support of the connection: sample the
PAF vector field along the A->B segment, count samples whose directional
projection exceeds `inter_threshold`, and average if enough of the line
agrees.  Mirrors the reference GPU kernel `pafScoreKernel` / `process`
(src/openpose/net/bodyPartConnectorBase.cu:12-146):

* number of samples: max(5, min(25, round(sqrt(5 * linf_dist)))) — evaluated
  with a static 25-sample grid + mask (TPU-friendly, bit-identical sums);
* sample location: round(start + t * step), clamped to the map;
* acceptance: count / n_samples > inter_min_above_threshold -> sum / count;
* close-keypoint fallback (bodyPartConnectorBase.cu:53-64): if the line fails
  but |AB| < sqrt(W*H)/150, emit default_nms_threshold + 1e-6;
* invalid combinations (peak index >= peak count) score -1.

Output: [N, P, max_peaks, max_peaks] float32.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_LINE_SAMPLES = 25


@functools.partial(jax.jit, static_argnames=())
def paf_scores(heatmaps: jax.Array, peaks: jax.Array, pairs: jax.Array,
               map_idx: jax.Array, inter_threshold: jax.Array,
               inter_min_above_threshold: jax.Array,
               default_nms_threshold: jax.Array) -> jax.Array:
    """Score all pair x peakA x peakB limb connections.

    heatmaps: [N, H, W, C] merged net output (parts + bkg + PAFs, NHWC).
    peaks:    [N, parts(+bkg), max_peaks+1, 3] from ops.nms (slot 0 = count).
    pairs:    [P, 2] int32 part indices (A, B).
    map_idx:  [P, 2] int32 absolute PAF channel indices (already offset by
              parts + bkg, as done in BodyPartConnectorCaffe::Forward,
              src/openpose/net/bodyPartConnectorCaffe.cpp).
    """
    heat = heatmaps.astype(jnp.float32)
    n, h, w, c = heat.shape
    max_peaks = peaks.shape[2] - 1

    counts = peaks[:, :, 0, 0]                       # [N, parts]
    coords = peaks[:, :, 1:, :]                      # [N, parts, K, 3]

    a_part = pairs[:, 0]                             # [P]
    b_part = pairs[:, 1]
    # NOTE: index then slice (coords[:, a_part][..., 0]); a combined
    # coords[:, a_part, :, 0] would trigger NumPy's advanced-indexing
    # transpose (advanced axes move to the front).
    ca = coords[:, a_part]                           # [N, P, K, 3]
    cb = coords[:, b_part]
    ax, ay = ca[..., 0], ca[..., 1]                  # [N, P, K]
    bx, by = cb[..., 0], cb[..., 1]
    count_a = counts[:, a_part]                      # [N, P]
    count_b = counts[:, b_part]

    # Vector A->B for every (i, j): [N, P, K, K]
    vx = bx[:, :, None, :] - ax[:, :, :, None]
    vy = by[:, :, None, :] - ay[:, :, :, None]
    linf = jnp.maximum(jnp.abs(vx), jnp.abs(vy))
    n_samples = jnp.clip(jnp.floor(jnp.sqrt(5.0 * linf) + 0.5), 5, 25)
    norm = jnp.sqrt(vx * vx + vy * vy)
    safe_norm = jnp.where(norm > 1e-6, norm, 1.0)
    ux, uy = vx / safe_norm, vy / safe_norm

    # Sample points: round(start + lm * v / n_samples), lm = 0..24 masked
    lm = jnp.arange(MAX_LINE_SAMPLES, dtype=jnp.float32)
    sx = ax[:, :, :, None, None] + lm * (vx / n_samples)[..., None]     # [N,P,K,K,L]
    sy = ay[:, :, :, None, None] + lm * (vy / n_samples)[..., None]
    mx = jnp.clip(jnp.floor(sx + 0.5), 0, w - 1).astype(jnp.int32)
    my = jnp.clip(jnp.floor(sy + 0.5), 0, h - 1).astype(jnp.int32)
    flat = my * w + mx                                                  # [N,P,K,K,L]

    # Gather PAF x/y samples.  TPU gather note: arbitrary element gather is
    # latency-bound scalar work on TPU; reshaping the map pool to [rows, 128]
    # and gathering whole 128-lane rows, then selecting the lane with a
    # one-hot reduce, is ~3x faster than take_along_axis here (measured on
    # v5e; 10.5M samples: 114ms -> 36ms).
    pool = heat.transpose(0, 3, 1, 2).reshape(n, c * h * w)
    pad = (-pool.shape[1]) % 128
    if pad:
        pool = jnp.pad(pool, ((0, 0), (0, pad)))
    pool = pool.reshape(n, -1, 128)
    p = pairs.shape[0]
    lane = jnp.arange(128, dtype=jnp.int32)

    def lane_gather(channel_base, flat_idx):
        # channel_base: [P] absolute channel; flat_idx: [N,P,K,K,L] in-map idx
        full = channel_base[None, :, None, None, None] * (h * w) + flat_idx
        q = (full // 128).reshape(n, -1)
        r = (full % 128).reshape(n, -1)
        rows = jax.vmap(lambda m, qq: m[qq])(pool, q)        # [N, S, 128]
        onehot = (r[..., None] == lane).astype(heat.dtype)
        return (rows * onehot).sum(-1).reshape(flat_idx.shape)

    paf_x = lane_gather(map_idx[:, 0], flat)
    paf_y = lane_gather(map_idx[:, 1], flat)

    proj = ux[..., None] * paf_x + uy[..., None] * paf_y                # [N,P,K,K,L]
    sample_valid = lm < n_samples[..., None]
    above = (proj > inter_threshold) & sample_valid
    cnt = above.sum(axis=-1).astype(jnp.float32)                        # [N,P,K,K]
    ssum = jnp.where(above, proj, 0.0).sum(axis=-1)

    accepted = cnt / n_samples > inter_min_above_threshold
    score = jnp.where(accepted, ssum / jnp.maximum(cnt, 1.0), -1.0)

    # Close-keypoint fallback
    close_thr = jnp.sqrt(jnp.float32(w * h)) / 150.0
    fallback = (~accepted) & (norm < close_thr)
    score = jnp.where(fallback, default_nms_threshold + 1e-6, score)

    # Coincident peaks never connect (vectorNorm <= 1e-6 -> return 0 in ref;
    # host filter is score > 1e-6 so 0 and -1 are equivalent downstream)
    score = jnp.where(norm > 1e-6, score, -1.0)

    # Invalid peak slots score -1
    ki = jnp.arange(max_peaks, dtype=jnp.float32)
    valid = (ki[None, None, :, None] < count_a[..., None, None]) & \
            (ki[None, None, None, :] < count_b[..., None, None])
    return jnp.where(valid, score, -1.0)


def pair_tables(info) -> Tuple[np.ndarray, np.ndarray]:
    """Build (pairs [P,2], absolute map_idx [P,2]) int32 tables for a model.

    The +offset mirrors BodyPartConnectorCaffe which adds
    (numberBodyParts + bkg) to POSE_MAP_INDEX before the GPU kernel
    (reference: src/openpose/net/bodyPartConnectorBase.cpp:173-175 uses
    numberBodyPartsAndBkg + mapIdx)."""
    pairs = np.asarray(info.pairs, np.int32).reshape(-1, 2)
    midx = np.asarray(info.map_idx, np.int32).reshape(-1, 2) + info.paf_channel_offset
    return pairs, midx
