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

Two sampling backends:

* `paf_scores` reads a materialized full-resolution merged heatmap tensor
  with an element gather — simple, used for small inputs and as the parity
  reference.
* `paf_scores_multiscale` is the TPU-native production path: the value of
  the (never materialized) 8x-upsampled-and-averaged PAF map at an integer
  pixel is by construction a 4x4-tap Catmull-Rom combination of the low-res
  net output (ops/resize.py semantics), so sampling becomes two small
  matmuls per scale against the ~30 KB low-res maps — MXU work instead of
  10M random gathers (which are latency-bound scalar ops on TPU).

Output: [N, P, max_peaks, max_peaks] float32.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_LINE_SAMPLES = 25


def _line_geometry(peaks: jax.Array, pairs: jax.Array, hw: Tuple[int, int]):
    """Shared geometry: sample pixel coords + masks for all (pair, i, j).

    Returns dict with mx, my [N,P,K,K,L] int32 sample pixels in the target
    grid, plus per-(i,j) quantities (ux, uy, n_samples, norm, validity).
    """
    h, w = hw
    counts = peaks[:, :, 0, 0]                       # [N, parts]
    coords = peaks[:, :, 1:, :]                      # [N, parts, K, 3]
    max_peaks = coords.shape[2]

    a_part = pairs[:, 0]
    b_part = pairs[:, 1]
    # NOTE: index then slice; a combined coords[:, a_part, :, 0] triggers
    # NumPy's advanced-indexing transpose (advanced axes move to the front).
    ca = coords[:, a_part]                           # [N, P, K, 3]
    cb = coords[:, b_part]
    ax, ay = ca[..., 0], ca[..., 1]
    bx, by = cb[..., 0], cb[..., 1]
    count_a = counts[:, a_part]                      # [N, P]
    count_b = counts[:, b_part]

    vx = bx[:, :, None, :] - ax[:, :, :, None]       # [N, P, K, K]
    vy = by[:, :, None, :] - ay[:, :, :, None]
    linf = jnp.maximum(jnp.abs(vx), jnp.abs(vy))
    n_samples = jnp.clip(jnp.floor(jnp.sqrt(5.0 * linf) + 0.5), 5, 25)
    norm = jnp.sqrt(vx * vx + vy * vy)
    safe_norm = jnp.where(norm > 1e-6, norm, 1.0)

    lm = jnp.arange(MAX_LINE_SAMPLES, dtype=jnp.float32)
    sx = ax[:, :, :, None, None] + lm * (vx / n_samples)[..., None]
    sy = ay[:, :, :, None, None] + lm * (vy / n_samples)[..., None]
    mx = jnp.clip(jnp.floor(sx + 0.5), 0, w - 1).astype(jnp.int32)
    my = jnp.clip(jnp.floor(sy + 0.5), 0, h - 1).astype(jnp.int32)

    ki = jnp.arange(max_peaks, dtype=jnp.float32)
    valid = (ki[None, None, :, None] < count_a[..., None, None]) & \
            (ki[None, None, None, :] < count_b[..., None, None])
    return dict(mx=mx, my=my, ux=vx / safe_norm, uy=vy / safe_norm,
                n_samples=n_samples, norm=norm, valid=valid)


def _finalize(proj_x, proj_y, geo, hw, inter_threshold,
              inter_min_above_threshold, default_nms_threshold):
    """From per-sample PAF components to final pair scores."""
    h, w = hw
    lm = jnp.arange(MAX_LINE_SAMPLES, dtype=jnp.float32)
    proj = geo["ux"][..., None] * proj_x + geo["uy"][..., None] * proj_y
    sample_valid = lm < geo["n_samples"][..., None]
    above = (proj > inter_threshold) & sample_valid
    cnt = above.sum(axis=-1).astype(jnp.float32)
    ssum = jnp.where(above, proj, 0.0).sum(axis=-1)

    accepted = cnt / geo["n_samples"] > inter_min_above_threshold
    score = jnp.where(accepted, ssum / jnp.maximum(cnt, 1.0), -1.0)
    close_thr = jnp.sqrt(jnp.float32(w * h)) / 150.0
    fallback = (~accepted) & (geo["norm"] < close_thr)
    score = jnp.where(fallback, default_nms_threshold + 1e-6, score)
    score = jnp.where(geo["norm"] > 1e-6, score, -1.0)
    return jnp.where(geo["valid"], score, -1.0)


@jax.jit
def paf_scores(heatmaps: jax.Array, peaks: jax.Array, pairs: jax.Array,
               map_idx: jax.Array, inter_threshold: jax.Array,
               inter_min_above_threshold: jax.Array,
               default_nms_threshold: jax.Array) -> jax.Array:
    """Full-resolution backend: gather from a materialized [N, H, W, C] map.

    map_idx: [P, 2] absolute PAF channel indices (offset by parts + bkg as in
    BodyPartConnectorCaffe, src/openpose/net/bodyPartConnectorBase.cpp:173).
    """
    heat = heatmaps.astype(jnp.float32)
    n, h, w, c = heat.shape
    geo = _line_geometry(peaks, pairs, (h, w))
    flat = geo["my"] * w + geo["mx"]                 # [N, P, K, K, L]

    heat_c = heat.transpose(0, 3, 1, 2).reshape(n, c, h * w)
    map_x = heat_c[:, map_idx[:, 0]]
    map_y = heat_c[:, map_idx[:, 1]]
    p = pairs.shape[0]
    flat2 = flat.reshape(n, p, -1)
    proj_x = jnp.take_along_axis(map_x, flat2, axis=-1).reshape(flat.shape)
    proj_y = jnp.take_along_axis(map_y, flat2, axis=-1).reshape(flat.shape)
    return _finalize(proj_x, proj_y, geo, (h, w), inter_threshold,
                     inter_min_above_threshold, default_nms_threshold)


def _tap_matrix(coord: jax.Array, in_size: int, scale: float) -> jax.Array:
    """Dense [.., in_size] Catmull-Rom weight rows for integer target coords.

    Reproduces ops/resize semantics (cubicSequentialData + cubicInterpolate,
    include/openpose_private/gpu/cuda.hu:92-121): src = (x+0.5)/scale - 0.5,
    4 clamped taps, dx measured from the clamped floor tap.
    """
    src = (coord.astype(jnp.float32) + 0.5) / scale - 0.5
    t1 = jnp.clip(jnp.floor(src), 0, in_size - 1)
    d = src - t1
    d2, d3 = d * d, d * d * d
    w0 = -0.5 * d3 + d2 - 0.5 * d
    w1 = 1.5 * d3 - 2.5 * d2 + 1.0
    w2 = -1.5 * d3 + 2.0 * d2 + 0.5 * d
    w3 = 0.5 * d3 - 0.5 * d2
    t1i = t1.astype(jnp.int32)
    taps = jnp.stack([jnp.maximum(0, t1i - 1), t1i,
                      jnp.minimum(in_size - 1, t1i + 1),
                      jnp.minimum(in_size - 1,
                                  jnp.minimum(in_size - 1, t1i + 1) + 1)],
                     axis=-1)                         # [.., 4]
    ws = jnp.stack([w0, w1, w2, w3], axis=-1)         # [.., 4]
    grid = jnp.arange(in_size, dtype=jnp.int32)
    onehots = (taps[..., None] == grid)               # [.., 4, in]
    return jnp.sum(jnp.where(onehots, ws[..., None], 0.0), axis=-2)


def _use_pallas_default() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.jit,
                   static_argnames=("target_hw", "scale_ratios",
                                    "inter_threshold",
                                    "inter_min_above_threshold",
                                    "default_nms_threshold",
                                    "use_pallas", "fast_peaks", "precision"))
def paf_scores_multiscale(
        sources: Sequence[jax.Array], scale_ratios: Tuple[float, ...],
        target_hw: Tuple[int, int], peaks: jax.Array, pairs: jax.Array,
        map_idx: jax.Array, inter_threshold: jax.Array,
        inter_min_above_threshold: jax.Array,
        default_nms_threshold: jax.Array,
        use_pallas: Optional[bool] = None,
        fast_peaks=(16, 48),
        precision=None) -> jax.Array:
    """TPU-native backend: evaluate the merged upsampled PAF analytically.

    sources: per-scale low-res net outputs [N, h_s, w_s, C]; the sampled
    value equals the mean over scales of the Catmull-Rom interpolation that
    ops.resize.upsample_merge would produce at that pixel — bit-identical to
    the full-res backend (up to f32 summation order), with zero gathers.

    Tiered peak count: candidate-pair work grows as max_peaks^2, but real
    frames rarely have more than a dozen peaks per part (the reference GPU
    kernel pays nothing for empty candidates because its threads early-exit,
    src/openpose/net/bodyPartConnectorBase.cu:30-33; static TPU shapes do).
    When every part's count <= k the score matrix outside the leading [k, k]
    block is -1 by construction (invalid combinations), so scoring only that
    block and padding is exact.  `fast_peaks` is an ascending ladder of tier
    sizes; nested `lax.cond`s pick the smallest sufficient tier at runtime
    and fall through to the full computation for crowded frames.  Pass an
    int for a single tier or 0/() to disable.
    """
    max_peaks = peaks.shape[2] - 1
    if use_pallas is None:
        # Occupancy routing (explicit True/False is honored — the parity
        # tests force the kernel at small K): the fused kernel pads the
        # B-peak dimension to the 128-lane tile, so at small people caps
        # most of every tap build and matmul is wasted lanes — measured at
        # the 4-scale 736x1312 config with max_peaks=16, the XLA
        # tap-matrix backend runs 4.75 ms/frame vs the kernel's 14.14; at
        # single-scale 368x656 K=16 the two tie (0.451 vs 0.460), so the
        # routing never regresses.  Above ~1/4 tile occupancy the
        # kernel's VMEM residency and per-row early-exit win (127-budget
        # worst case).
        use_pallas = _use_pallas_default() and max_peaks > 32
    if isinstance(fast_peaks, int):
        fast_peaks = (fast_peaks,) if fast_peaks > 0 else ()
    if use_pallas:
        # The fused kernel skips invalid A-rows dynamically (per pair, per
        # frame), which strictly dominates the whole-batch tier ladder.
        fast_peaks = ()
    tiers = tuple(k for k in sorted(fast_peaks) if 0 < k < max_peaks)

    def impl(pk):
        return _multiscale_impl(
            sources, scale_ratios, target_hw, pk, pairs, map_idx,
            inter_threshold, inter_min_above_threshold,
            default_nms_threshold, use_pallas, precision)

    if not tiers:
        return impl(peaks)
    max_count = jnp.max(peaks[:, :, 0, 0])

    def tiered(remaining):
        if not remaining:
            return lambda pk: impl(pk)
        k = remaining[0]

        def fn(pk):
            def fast(p):
                s = impl(p[:, :, :k + 1])
                pad = max_peaks - k
                return jnp.pad(s, ((0, 0), (0, 0), (0, pad), (0, pad)),
                               constant_values=-1.0)
            return jax.lax.cond(max_count <= k, fast,
                                tiered(remaining[1:]), pk)
        return fn

    return tiered(tiers)(peaks)


def _multiscale_impl(
        sources, scale_ratios, target_hw, peaks, pairs, map_idx,
        inter_threshold, inter_min_above_threshold, default_nms_threshold,
        use_pallas, precision=None) -> jax.Array:
    if use_pallas:
        # Fully-fused kernel: geometry + sampling + finalize in VMEM, invalid
        # A-rows skipped dynamically (ops/paf_pallas.py paf_scores_fused).
        from openpose_tpu.ops.paf_pallas import paf_scores_fused
        return paf_scores_fused(
            sources, scale_ratios, target_hw, peaks, pairs, map_idx,
            float(inter_threshold), float(inter_min_above_threshold),
            float(default_nms_threshold), precision=precision,
            interpret=jax.default_backend() != "tpu")
    th, tw = target_hw
    geo = _line_geometry(peaks, pairs, (th, tw))
    n, p = geo["mx"].shape[:2]
    sshape = geo["mx"].shape                          # [N, P, K, K, L]
    mx = geo["mx"].reshape(n, p, -1)                  # [N, P, S]
    my = geo["my"].reshape(n, p, -1)

    h0, w0 = sources[0].shape[1], sources[0].shape[2]
    acc_x = None
    acc_y = None
    for i, src in enumerate(sources):
        rel = scale_ratios[i] / scale_ratios[0]
        scale_h = (th / h0) / rel
        scale_w = (tw / w0) / rel
        hs, ws = src.shape[1], src.shape[2]
        # Low-res PAF maps for this scale: [N, P, 2, hs, ws]
        chans = src.astype(jnp.float32).transpose(0, 3, 1, 2)
        low_xy = jnp.stack([chans[:, map_idx[:, 0]],
                            chans[:, map_idx[:, 1]]], axis=2)

        def per_pair(args, scale_h=scale_h, scale_w=scale_w,
                     hs=hs, ws=ws):
            # Blocked over pairs: the [S, taps] weight matrices for one
            # pair stay ~50 MB instead of P x that.
            lxy, my_p, mx_p = args                # [N,2,hs,ws], [N,S]
            wrow = _tap_matrix(my_p, hs, scale_h)  # [N, S, hs]
            wcol = _tap_matrix(mx_p, ws, scale_w)  # [N, S, ws]
            tx = jnp.einsum("nsh,nhw->nsw", wrow, lxy[:, 0],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
            ty = jnp.einsum("nsh,nhw->nsw", wrow, lxy[:, 1],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
            return (jnp.sum(tx * wcol, axis=-1),   # [N, S]
                    jnp.sum(ty * wcol, axis=-1))

        vx, vy = jax.lax.map(
            per_pair, (low_xy.transpose(1, 0, 2, 3, 4),
                       my.transpose(1, 0, 2),
                       mx.transpose(1, 0, 2)))     # [P, N, S]
        vx = vx.transpose(1, 0, 2)
        vy = vy.transpose(1, 0, 2)
        acc_x = vx if acc_x is None else acc_x + vx
        acc_y = vy if acc_y is None else acc_y + vy
    inv = 1.0 / len(sources)
    proj_x = (acc_x * inv).reshape(sshape)
    proj_y = (acc_y * inv).reshape(sshape)
    return _finalize(proj_x, proj_y, geo, (th, tw), inter_threshold,
                     inter_min_above_threshold, default_nms_threshold)


def pair_tables(info) -> Tuple[np.ndarray, np.ndarray]:
    """Build (pairs [P,2], absolute map_idx [P,2]) int32 tables for a model.

    The +offset mirrors BodyPartConnectorCaffe which adds
    (numberBodyParts + bkg) to POSE_MAP_INDEX before the GPU kernel
    (reference: src/openpose/net/bodyPartConnectorBase.cpp:173-175)."""
    pairs = np.asarray(info.pairs, np.int32).reshape(-1, 2)
    midx = np.asarray(info.map_idx, np.int32).reshape(-1, 2) + info.paf_channel_offset
    return pairs, midx
