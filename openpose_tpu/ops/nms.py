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


def _shifted_neighbors(x: jax.Array, fill: jax.Array):
    """The 8 one-pixel shifts of NHWC `x`, out-of-range lanes = `fill`.

    Pads ONCE with the fill value and takes 8 static slices of the shared
    padded buffer — XLA fuses the slices into the consuming compares, so
    the whole 3x3 neighborhood test is a single pass over the heatmap
    (8 separate pad+where copies cost ~8x the HBM traffic)."""
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=fill)
    return [jax.lax.dynamic_slice(padded, (0, 1 + dy, 1 + dx, 0), x.shape)
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if not (dy == 0 and dx == 0)]


def _searchsorted_rows(cum: jax.Array, ranks: jax.Array) -> jax.Array:
    """Per-row searchsorted-left of `ranks` [K] into monotone `cum` [..., S]:
    first index where cum >= rank, computed as count of entries < rank —
    a pure compare-and-reduce (no sort, no loop), ideal on the VPU."""
    return jnp.sum(cum[..., None, :] < ranks[:, None], axis=-1)


def _refine_at_peaks(heat: jax.Array, peak_idx: jax.Array,
                     offset: Tuple[float, float],
                     blocked: bool = True
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sub-pixel refinement gathered only at the peak windows.

    heat: [N, H, W, C] (layout preserved — no full-map transpose);
    peak_idx: [N, C, K] flat row-major indices.  Returns refined
    (x, y, peak_value) [N, C, K].  Mirrors nmsAccuratePeakPosition
    (nmsBase.cpp:70-107): score-weighted centroid of score>0 samples over
    the in-bounds part of the 7x7 window, plus the (+0.5, +0.5) offset.

    Gather shape matters enormously here: 49 independent element gathers per
    peak cost ~3 ms/frame at batch 8 (TPU gathers of single f32s run on the
    scalar path), and 7x7 tile gathers were no better.  Two shapes are used
    depending on the slot budget (measured batch-8 368x656 post chain):

    * blocked=False (small tiers, k <= ~48): fetch the 7 FULL ROWS covering
      each window — at small k the row tensor is cheap and the single
      7-gather wins (blocked at tier 16 cost +1.4 ms/iter of extra gather
      dispatch);
    * blocked=True (large budgets): fetch, per window row, the TWO aligned
      64-px column blocks covering the window (a 7-px window always fits in
      128 aligned columns) — ~W/128 of the full-row traffic, which at
      k=127 cut the worst-case post chain 20.5 -> 19.0 ms/iter.

    Either way the column selection is a masked reduction over the lane
    dimension, and taps outside the true window mask to zero, reproducing
    the reference's skipped out-of-bounds taps exactly.
    """
    n, h, w, c = heat.shape
    k = peak_idx.shape[2]
    py = peak_idx // w                                   # [N,C,K]
    px = peak_idx % w
    d = jnp.arange(-3, 4, dtype=jnp.int32)
    wy = py[..., None] + d                               # [N,C,K,7]
    row_ok = (wy >= 0) & (wy < h)
    ri = jnp.clip(wy, 0, h - 1)                          # [N,C,K,7]

    heat_nchw = heat.transpose(0, 3, 1, 2)               # [N,C,H,W], W minor
    bs = 64
    nbw = -(-w // bs)
    if not blocked or nbw == 1:
        flat = ri.reshape(n, c, k * 7)
        win = jnp.take_along_axis(
            heat_nchw, flat[..., None], axis=2).reshape(n, c, k, 7, w)
        xs = jnp.arange(w, dtype=jnp.int32)
        xs_local = jnp.broadcast_to(xs, px.shape + (w,))
    else:
        if nbw * bs != w:
            heat_nchw = jnp.pad(heat_nchw,
                                ((0, 0),) * 3 + ((0, nbw * bs - w),))
        blocks = heat_nchw.reshape(n, c, h * nbw, bs)
        blk_lo = jnp.clip((px - 3) // bs, 0, nbw - 2)    # [N,C,K]
        # flat (row, block) indices for the two adjacent blocks of each row
        base = ri * nbw + blk_lo[..., None]              # [N,C,K,7]
        flat = jnp.stack([base, base + 1], axis=-1).reshape(n, c, k * 14)
        win = jnp.take_along_axis(
            blocks, flat[..., None], axis=2).reshape(n, c, k, 7, 2 * bs)
        xs_local = blk_lo[..., None] * bs \
            + jnp.arange(2 * bs, dtype=jnp.int32)        # [N,C,K,128]

    mask_x = (jnp.abs(xs_local - px[..., None]) <= 3) \
        & (xs_local < w)                                 # [N,C,K,L]
    s = jnp.where(mask_x[..., None, :] & row_ok[..., None],
                  jnp.maximum(win, 0.0), 0.0)            # [N,C,K,7,L]
    s_sum = s.sum(axis=(-1, -2))
    denom = jnp.where(s_sum > 0, s_sum, 1.0)
    x_ref = (s.sum(axis=-2) * xs_local).sum(axis=-1) / denom + offset[0]
    y_ref = (s.sum(axis=-1) * wy.astype(s.dtype)).sum(axis=-1) / denom \
        + offset[1]
    center = (xs_local == px[..., None])[..., None, :] \
        & (wy == py[..., None])[..., None]
    value = jnp.sum(jnp.where(center, win, 0.0), axis=(-1, -2))
    return x_ref, y_ref, value


def _refine_dense(heat: jax.Array, peak_idx: jax.Array,
                  offset: Tuple[float, float]
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full-budget refinement as dense separable box sums + K-wide gathers.

    At the 127-slot budget the windowed gather path issues ~370k small
    block gathers per batch-8 call (latency-bound on the TPU scalar
    path); the centroid numerators/denominator are 7x7 BOX SUMS of
    max(heat, 0), x*max(heat, 0), y*max(heat, 0), so computing them
    DENSELY with two 1-D reduce_windows each (pure streaming VPU work,
    ~0.8 GB at 368x656x26 batch 8 against ~819 GB/s HBM) and then
    gathering K elements per (n, c) map beats the gather storm.  Zero
    padding reproduces the reference's skipped out-of-bounds taps
    (score<=0 samples contribute nothing); used only for the top tier —
    small tiers keep the windowed gather (ops/nms._refine_at_peaks),
    whose traffic is proportional to k.
    """
    n, h, w, c = heat.shape
    # ONE transpose to C-major [N,C,H,W]: with C=26 minor the TPU pads the
    # lane dimension 26 -> 128 (~5x wasted bandwidth on every pass), and
    # transposing each box-sum result separately would add 3 more 200 MB
    # relayouts; W-minor wastes only 656 -> 768.
    chw = heat.transpose(0, 3, 1, 2)
    hpos = jnp.maximum(chw, 0.0)
    xs = jnp.arange(w, dtype=heat.dtype)[None, None, None, :]
    ys = jnp.arange(h, dtype=heat.dtype)[None, None, :, None]

    def box7(a):
        """Separable 7x7 box sum via reduce_window — measured FASTER on
        the TPU than both the 7-shifted-slices-summed formulation (27.8 vs
        17.2 ms/iter whole-pass) and an NHWC layout variant; XLA's
        reduce_window lowering keeps the sliding partial sums in
        registers."""
        a = jax.lax.reduce_window(a, 0.0, jax.lax.add, (1, 1, 7, 1),
                                  (1, 1, 1, 1),
                                  ((0, 0), (0, 0), (3, 3), (0, 0)))
        return jax.lax.reduce_window(a, 0.0, jax.lax.add, (1, 1, 1, 7),
                                     (1, 1, 1, 1),
                                     ((0, 0), (0, 0), (0, 0), (3, 3)))

    # Gather the 4 per-peak scalars WITHOUT scalar gathers (TPU scalarizes
    # single-element gathers; 4 x 127 of them per map dominated the whole
    # pass): fetch the peak ROW of each tensor (contiguous W-gather, the
    # same shape the tier path uses) and select the column with a one-hot
    # masked reduction over the lane dimension.  (Concatenating the four
    # maps to share one gather was measured SLOWER — the 800 MB concat
    # costs more than the extra gather descriptors.)
    py = peak_idx // w                                        # [N,C,K]
    px = peak_idx % w
    onehot = jnp.arange(w, dtype=jnp.int32) == px[..., None]  # [N,C,K,W]

    def at_peaks(a):              # [N,C,H,W] -> [N,C,K]
        rows = jnp.take_along_axis(a, py[..., None], axis=2)  # [N,C,K,W]
        return jnp.sum(jnp.where(onehot, rows, 0.0), axis=-1)

    s_at = at_peaks(box7(hpos))
    sx_at = at_peaks(box7(hpos * xs))
    sy_at = at_peaks(box7(hpos * ys))
    value = at_peaks(chw)
    denom = jnp.where(s_at > 0, s_at, 1.0)
    return (sx_at / denom + offset[0], sy_at / denom + offset[1], value)


@functools.partial(jax.jit, static_argnames=("max_peaks", "offset",
                                             "fast_peaks"))
def nms(heatmaps: jax.Array, threshold: jax.Array, max_peaks: int = 127,
        offset: Tuple[float, float] = (0.5, 0.5),
        fast_peaks: Tuple[int, ...] = (16, 48)) -> jax.Array:
    """Extract peaks from [N, H, W, C] part heatmaps.

    Returns [N, C, max_peaks+1, 3] float32; [n, c, 0, 0] is the count,
    slots 1..count are (x, y, score) in row-major discovery order.

    fast_peaks: tier ladder for the sub-pixel refinement (same pattern as
    paf.paf_scores_multiscale).  The refinement fetches 7 heatmap rows per
    peak SLOT; at the static max_peaks=127 that is ~470 MB of HBM traffic
    per batch-8 call even when frames carry a handful of peaks — it
    dominated the whole post chain (~2.1 ms/frame measured).  Nested
    lax.cond picks the smallest tier covering this batch's true max count;
    slots beyond the tier are invalid by construction (count <= k), so
    refining only the leading k slots is exact.  Pass () to disable.
    """
    heat = heatmaps.astype(jnp.float32)
    n, h, w, c = heat.shape
    thr = jnp.asarray(threshold, jnp.float32)

    neigh = _shifted_neighbors(heat, thr)
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
    # Sort-free exact selection (TPU sorts dominate everything else in this
    # op: the old two-stage top_k cost ~3.5 ms/frame, ~10x the rest of NMS
    # combined).  Peaks already appear in ascending flat-index order, so the
    # k-th peak's position is searchsorted(cumsum(is_peak), k) — a monotone
    # binary-search-free compare-and-count, no sort anywhere:
    #   1. block stage: the first <= max_peaks peaks lie in the first
    #      <= max_peaks 128-pixel blocks containing any peak; pick those
    #      blocks by rank via searchsorted over the nonempty-block cumsum;
    #   2. within the <= max_peaks*128 gathered candidates, pick the k-th
    #      flagged entry the same way.
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
    ranks_b = jnp.arange(1, k_blocks + 1, dtype=jnp.int32)
    cum_blocks = jnp.cumsum((block_first < big).astype(jnp.int32), axis=-1)
    # first block index whose nonempty-rank reaches r, ascending by
    # construction; rows with fewer nonempty blocks than k_blocks clamp to
    # the LAST block, which (for small heatmaps, h*w <= k_blocks*bs) can
    # still hold valid peaks — so those duplicate selections must be masked
    # out or the duplicated entries would be counted again downstream.
    blk_id = jnp.minimum(_searchsorted_rows(cum_blocks, ranks_b), nb - 1)
    rank_ok = ranks_b <= cum_blocks[..., -1:]           # [N,C,K]
    cand = jnp.take_along_axis(blocks, blk_id[..., None], axis=2)
    cand = jnp.where(rank_ok[..., None], cand, big)
    cand = cand.reshape(n, c, k_blocks * bs)

    # Second selection stage, two-level: a flat searchsorted over all
    # k_blocks*bs candidates costs O(K * k_blocks*bs) compares (~430M at
    # K=127 — it dominated the whole op); instead find the k-th peak's
    # BLOCK via per-block counts (K * k_blocks), then its slot within the
    # 128-wide block via a local rank (K * bs).  ~60x fewer compares.
    ranks = jnp.arange(1, max_peaks + 1, dtype=jnp.int32)
    cand_blocks = cand.reshape(n, c, k_blocks, bs)
    blk_counts = (cand_blocks < big).sum(axis=-1)       # [N,C,B]
    cum_bc = jnp.cumsum(blk_counts, axis=-1)            # inclusive
    b_id = jnp.minimum(_searchsorted_rows(cum_bc, ranks), k_blocks - 1)
    # one-hot masked reductions instead of [N,C,K] single-element gathers:
    # the TPU scalarizes element gathers (one scalar-unit load each; the
    # ~26k of them here were a measurable chunk of the NMS pass), while a
    # compare+select+sum over the candidate-block axis is pure VPU work.
    b_onehot = b_id[..., None] == jnp.arange(k_blocks)  # [N,C,K,B]
    before = jnp.sum(jnp.where(
        b_onehot, (cum_bc - blk_counts)[..., None, :], 0), axis=-1)
    local_rank = ranks - before                         # [N,C,K], >= 1
    sel = jnp.take_along_axis(cand_blocks, b_id[..., None], axis=2)
    local_cum = jnp.cumsum((sel < big).astype(jnp.int32), axis=-1)
    pos = jnp.minimum(
        jnp.sum(local_cum < local_rank[..., None], axis=-1), bs - 1)
    pos_onehot = pos[..., None] == jnp.arange(bs)       # [N,C,K,bs]
    peak_idx = jnp.sum(jnp.where(pos_onehot, sel, 0),
                       axis=-1)                         # [N,C,max_peaks]
    valid = peak_idx < big
    count = valid.sum(axis=-1).astype(jnp.float32)      # [N,C]
    peak_idx = jnp.where(valid, peak_idx, 0)

    def refined(k):
        """Refine the leading k slots, zero-pad the rest (exact when the
        true count <= k everywhere).  Small tiers gather their windows
        (traffic ~ k); the large/full budget computes the centroid sums
        densely (traffic ~ map size, independent of k)."""
        if k > 48:
            x_ref, y_ref, value = _refine_dense(heat, peak_idx[:, :, :k],
                                                offset)
        else:
            x_ref, y_ref, value = _refine_at_peaks(heat, peak_idx[:, :, :k],
                                                   offset, blocked=False)
        vk = valid[:, :, :k]
        peaks_k = jnp.stack([jnp.where(vk, x_ref, 0.0),
                             jnp.where(vk, y_ref, 0.0),
                             jnp.where(vk, value, 0.0)], axis=-1)
        return jnp.pad(peaks_k,
                       ((0, 0), (0, 0), (0, max_peaks - k), (0, 0)))

    tiers = tuple(k for k in sorted(fast_peaks) if 0 < k < max_peaks)
    if not tiers:
        peaks = refined(max_peaks)
    else:
        max_count = jnp.max(count)

        def tiered(remaining):
            if not remaining:
                return lambda _: refined(max_peaks)
            k = remaining[0]
            return lambda _: jax.lax.cond(
                max_count <= k, lambda __: refined(k),
                tiered(remaining[1:]), 0)
        peaks = tiered(tiers)(0)

    header = jnp.zeros((n, c, 1, 3), jnp.float32).at[:, :, 0, 0].set(count)
    return jnp.concatenate([header, peaks], axis=2)
