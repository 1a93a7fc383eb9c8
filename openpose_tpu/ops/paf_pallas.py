"""Pallas kernel: fused bicubic PAF sampling.

Computes V(s) = sum_{t,u} Wrow(s,t) * LOW(t,u) * Wcol(s,u) for blocks of
samples with the per-pair low-res PAF maps resident in VMEM — the fused
version of the tap-matrix contraction in ops/paf.py `paf_scores_multiscale`.
The XLA version materializes the [S, taps] weight matrices and [S, ws]
intermediates in HBM (~13 GB/frame of traffic at K=127); here they live and
die in VMEM, so HBM traffic collapses to coords in + samples out (~170 MB),
leaving pure MXU work.

Layout: samples ride the LANE dimension throughout — tap weights are built
transposed ([taps, BS]) straight from a broadcasted iota, the map is
pre-transposed ([ws, hs]) by the caller, and both matmuls are
lane-major: T = LOW^T @ WrowT -> [ws, BS]; V = sum_ws(T * WcolT) -> [BS].
Grid = (pairs, sample blocks); singleton-wrapped coord blocks satisfy the
(8, 128) tiling rule.  See /opt/skills/guides/pallas_guide.md.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_SAMPLES = 2048


def _tap_weights_t(coord: jax.Array, in_size: int, scale: float):
    """coord [BS] int32 -> transposed Catmull-Rom weights [in_size, BS] f32.

    Same math as ops/paf.py `_tap_matrix` (cubicSequentialData +
    cubicInterpolate, include/openpose_private/gpu/cuda.hu:92-121).
    """
    bs = coord.shape[0]
    src = (coord.astype(jnp.float32) + 0.5) / scale - 0.5
    t1 = jnp.clip(jnp.floor(src), 0, in_size - 1)
    d = src - t1
    d2, d3 = d * d, d * d * d
    w0 = -0.5 * d3 + d2 - 0.5 * d
    w1 = 1.5 * d3 - 2.5 * d2 + 1.0
    w2 = -1.5 * d3 + 2.0 * d2 + 0.5 * d
    w3 = 0.5 * d3 - 0.5 * d2
    t1i = t1.astype(jnp.int32)
    t0i = jnp.maximum(0, t1i - 1)
    t2i = jnp.minimum(in_size - 1, t1i + 1)
    t3i = jnp.minimum(in_size - 1, t2i + 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (in_size, bs), 0)
    acc = jnp.zeros((in_size, bs), jnp.float32)
    for ti, wi in ((t0i, w0), (t1i, w1), (t2i, w2), (t3i, w3)):
        acc = acc + jnp.where(rows == ti[None, :], wi[None, :], 0.0)
    return acc


def _make_kernel(hs: int, ws: int, scale_h: float, scale_w: float,
                 precision):
    def kernel(low_t_ref, my_ref, mx_ref, vx_ref, vy_ref):
        my = my_ref[0, 0, 0, :]                       # [BS]
        mx = mx_ref[0, 0, 0, :]
        wrow_t = _tap_weights_t(my, hs, scale_h)      # [hs, BS]
        wcol_t = _tap_weights_t(mx, ws, scale_w)      # [ws, BS]
        low_2t = low_t_ref[0, 0]                      # [2*ws, hs] x then y
        # ONE stacked matmul for both components.  Precision trade-off: the
        # default TPU f32 dot is a single bf16 MXU pass (~6x faster than
        # HIGHEST's multi-pass); PAF values are O(1) and feed a 0.05
        # threshold, so bf16's ~4e-3 absolute error flips only samples that
        # sit on the threshold (AP-neutral; the reference itself tolerates
        # larger CPU-vs-GPU resize drift, wrapperAuxiliary.hpp:298).  Parity
        # tests pass precision=HIGHEST.
        txy = jnp.dot(low_2t, wrow_t, preferred_element_type=jnp.float32,
                      precision=precision)            # [2*ws, BS]
        vx_ref[0, 0, 0, :] = jnp.sum(txy[:ws] * wcol_t, axis=0)
        vy_ref[0, 0, 0, :] = jnp.sum(txy[ws:] * wcol_t, axis=0)
    return kernel


PAF_LANES = 128          # peak-B index rides the lane dimension
PAF_BI = 8               # peak-A rows per grid step (one (8,128) out tile)
PAF_SAMPLES = 25         # MAX_LINE_SAMPLES


def _paf_fused_kernel(n_scales, hw_list, scale_hw_list, target_hw,
                      inter_threshold, inter_min_above_threshold,
                      default_nms_threshold, precision):
    """Fully-fused PAF scoring: line geometry + bicubic sampling + score
    finalization for one (batch, pair, 8-row block of A-peaks) per grid step.

    Replaces the three-stage XLA pipeline (materialize [N,P,K,K,L] sample
    coords in HBM -> pallas sampler -> XLA finalize) whose HBM traffic and
    per-sample tap-matrix rebuilds dominated the worst-case (127-peak) cost.
    Here every intermediate lives in VMEM and invalid A-rows are skipped
    dynamically — the TPU analogue of the CUDA kernel's thread early-out on
    peak counts (src/openpose/net/bodyPartConnectorBase.cu:30-33).
    """
    th, tw = target_hw
    L = PAF_SAMPLES
    S = L * PAF_LANES
    close_thr = float(np.sqrt(float(tw * th)) / 150.0)

    def tap_weights(coord, in_size, scale):
        """[1, S] f32 target coords -> [in_size, S] Catmull-Rom tap rows.

        Same math as _tap_weights_t (cubicSequentialData+cubicInterpolate,
        include/openpose_private/gpu/cuda.hu:92-121)."""
        src = coord / scale + (0.5 / scale - 0.5)
        t1 = jnp.clip(jnp.floor(src), 0, in_size - 1)
        d = src - t1
        d2, d3 = d * d, d * d * d
        w0 = -0.5 * d3 + d2 - 0.5 * d
        w1 = 1.5 * d3 - 2.5 * d2 + 1.0
        w2 = -1.5 * d3 + 2.0 * d2 + 0.5 * d
        w3 = 0.5 * d3 - 0.5 * d2
        t1i = t1.astype(jnp.int32)
        t0i = jnp.maximum(0, t1i - 1)
        t2i = jnp.minimum(in_size - 1, t1i + 1)
        t3i = jnp.minimum(in_size - 1, t2i + 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (in_size, S), 0)
        acc = jnp.zeros((in_size, S), jnp.float32)
        for ti, wi in ((t0i, w0), (t1i, w1), (t2i, w2), (t3i, w3)):
            acc = acc + jnp.where(rows == ti, wi, 0.0)
        return acc

    def kernel(*refs):
        ab_ref = refs[0]
        low_refs = refs[1:1 + n_scales]
        out_ref = refs[-1]
        ib = pl.program_id(2)

        lane = jax.lax.broadcasted_iota(
            jnp.int32, (1, PAF_LANES), 1).astype(jnp.float32)
        ax_row = ab_ref[0, 0, 0:1, :]
        ay_row = ab_ref[0, 0, 1:2, :]
        bx = ab_ref[0, 0, 2:3, :]
        by = ab_ref[0, 0, 3:4, :]
        cnt_a = jnp.max(ab_ref[0, 0, 4:5, :])
        cnt_b_row = ab_ref[0, 0, 5:6, :]
        valid_j = lane < cnt_b_row

        for ii in range(PAF_BI):
            i_glob = ib * PAF_BI + ii
            sel = lane == i_glob.astype(jnp.float32)

            @pl.when(i_glob.astype(jnp.float32) >= cnt_a)
            def _skip():
                out_ref[0, 0, ii, :] = jnp.full((PAF_LANES,), -1.0,
                                                jnp.float32)

            @pl.when(i_glob.astype(jnp.float32) < cnt_a)
            def _compute():
                ax = jnp.sum(jnp.where(sel, ax_row, 0.0))
                ay = jnp.sum(jnp.where(sel, ay_row, 0.0))
                vx = bx - ax                       # [1, LANES]
                vy = by - ay
                linf = jnp.maximum(jnp.abs(vx), jnp.abs(vy))
                n_samples = jnp.clip(
                    jnp.floor(jnp.sqrt(5.0 * linf) + 0.5), 5.0, float(L))
                norm = jnp.sqrt(vx * vx + vy * vy)
                safe = jnp.where(norm > 1e-6, norm, 1.0)
                ux, uy = vx / safe, vy / safe
                stepx, stepy = vx / n_samples, vy / n_samples

                # [1, S]: sample l occupies lanes [l*128, (l+1)*128)
                mxs = jnp.concatenate(
                    [jnp.clip(jnp.floor(ax + l * stepx + 0.5), 0, tw - 1)
                     for l in range(L)], axis=1)
                mys = jnp.concatenate(
                    [jnp.clip(jnp.floor(ay + l * stepy + 0.5), 0, th - 1)
                     for l in range(L)], axis=1)

                valx = jnp.zeros((1, S), jnp.float32)
                valy = jnp.zeros((1, S), jnp.float32)
                for s_idx in range(n_scales):
                    hs, ws = hw_list[s_idx]
                    scale_h, scale_w = scale_hw_list[s_idx]
                    wrow = tap_weights(mys, hs, scale_h)     # [hs, S]
                    wcol = tap_weights(mxs, ws, scale_w)     # [ws, S]
                    low = low_refs[s_idx][0, 0]              # [2*hs, ws]
                    # Single-pass bf16 MXU dot by default (see
                    # sample_bicubic_pallas precision note); parity tests
                    # pass precision=HIGHEST.
                    txy = jnp.dot(low, wcol,
                                  preferred_element_type=jnp.float32,
                                  precision=precision)       # [2*hs, S]
                    valx = valx + jnp.sum(txy[:hs] * wrow, axis=0,
                                          keepdims=True)
                    valy = valy + jnp.sum(txy[hs:] * wrow, axis=0,
                                          keepdims=True)
                inv = 1.0 / n_scales
                cnt = jnp.zeros((1, PAF_LANES), jnp.float32)
                ssum = jnp.zeros((1, PAF_LANES), jnp.float32)
                for l in range(L):
                    sl = slice(l * PAF_LANES, (l + 1) * PAF_LANES)
                    proj = (ux * valx[:, sl] + uy * valy[:, sl]) * inv
                    above = (proj > inter_threshold) & (float(l) < n_samples)
                    cnt = cnt + above.astype(jnp.float32)
                    ssum = ssum + jnp.where(above, proj, 0.0)
                accepted = cnt / n_samples > inter_min_above_threshold
                score = jnp.where(accepted, ssum / jnp.maximum(cnt, 1.0),
                                  -1.0)
                fallback = jnp.logical_not(accepted) & (norm < close_thr)
                score = jnp.where(fallback, default_nms_threshold + 1e-6,
                                  score)
                score = jnp.where(norm > 1e-6, score, -1.0)
                score = jnp.where(valid_j, score, -1.0)
                out_ref[0, 0, ii, :] = score[0]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("target_hw", "scale_ratios",
                                    "inter_threshold",
                                    "inter_min_above_threshold",
                                    "default_nms_threshold", "interpret",
                                    "precision"))
def paf_scores_fused(sources, scale_ratios, target_hw, peaks,
                     pairs: jax.Array, map_idx: jax.Array,
                     inter_threshold: float,
                     inter_min_above_threshold: float,
                     default_nms_threshold: float,
                     interpret: bool = False,
                     precision=None) -> jax.Array:
    """Fused-kernel PAF scoring: [N, P, K, K] from peaks + low-res sources.

    Same contract as ops.paf.paf_scores_multiscale's impl: sources are
    per-scale net outputs [N, h_s, w_s, C]; the sampled value equals the
    mean over scales of the Catmull-Rom 8x-upsample at the integer target
    pixel.  K = peaks.shape[2]-1 (<= 128).  Rows i >= count_A are skipped
    (written as -1) without compute, so the cost scales with the actual
    people count like the CUDA early-out, not with the static K.
    """
    n, parts = peaks.shape[0], peaks.shape[1]
    k = peaks.shape[2] - 1
    if k > PAF_LANES:
        raise ValueError(f"max_peaks {k} > {PAF_LANES}")
    p = pairs.shape[0]
    th, tw = target_hw

    counts = peaks[:, :, 0, 0]
    coords = peaks[:, :, 1:, :]
    a_part, b_part = pairs[:, 0], pairs[:, 1]
    ca = coords[:, a_part]                          # [N, P, K, 3]
    cb = coords[:, b_part]
    pad = PAF_LANES - k
    ax = jnp.pad(ca[..., 0], ((0, 0), (0, 0), (0, pad)))
    ay = jnp.pad(ca[..., 1], ((0, 0), (0, 0), (0, pad)))
    bx = jnp.pad(cb[..., 0], ((0, 0), (0, 0), (0, pad)))
    by = jnp.pad(cb[..., 1], ((0, 0), (0, 0), (0, pad)))
    cnt_a = jnp.broadcast_to(counts[:, a_part, None], ax.shape)
    cnt_b = jnp.broadcast_to(counts[:, b_part, None], ax.shape)
    zeros = jnp.zeros_like(ax)
    ab = jnp.stack([ax, ay, bx, by, cnt_a, cnt_b, zeros, zeros], axis=2)

    h0, w0 = sources[0].shape[1], sources[0].shape[2]
    lows = []
    hw_list = []
    scale_hw_list = []
    for i, src in enumerate(sources):
        rel = scale_ratios[i] / scale_ratios[0]
        hs, ws = src.shape[1], src.shape[2]
        hw_list.append((hs, ws))
        scale_hw_list.append(((th / h0) / rel, (tw / w0) / rel))
        chans = src.astype(jnp.float32).transpose(0, 3, 1, 2)
        # [N, P, 2*hs, ws]: x-map rows then y-map rows
        lows.append(jnp.concatenate([chans[:, map_idx[:, 0]],
                                     chans[:, map_idx[:, 1]]], axis=2))

    kernel = _paf_fused_kernel(
        len(sources), tuple(hw_list), tuple(scale_hw_list), (th, tw),
        float(inter_threshold), float(inter_min_above_threshold),
        float(default_nms_threshold), precision)
    grid = (n, p, PAF_LANES // PAF_BI)
    in_specs = [pl.BlockSpec((1, 1, 8, PAF_LANES), lambda ni, pi, bi: (ni, pi, 0, 0),
                             memory_space=pltpu.VMEM)]
    for hs, ws in hw_list:
        in_specs.append(pl.BlockSpec(
            (1, 1, 2 * hs, ws), lambda ni, pi, bi: (ni, pi, 0, 0),
            memory_space=pltpu.VMEM))
    s_total = n * p * PAF_LANES * PAF_SAMPLES * PAF_LANES
    flops = sum(2 * (2 * hs) * (ws + 1) * s_total // PAF_LANES // PAF_SAMPLES
                * PAF_SAMPLES for hs, ws in hw_list)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, PAF_BI, PAF_LANES),
            lambda ni, pi, bi: (ni, pi, bi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, p, PAF_LANES, PAF_LANES),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(flops), transcendentals=0,
            bytes_accessed=int(n * p * (PAF_LANES * PAF_LANES * 4
                                        + 8 * PAF_LANES * 4))),
        interpret=interpret,
    )(ab, *lows)
    return out[:, :, :k, :k]


@functools.partial(jax.jit,
                   static_argnames=("scale_h", "scale_w", "interpret",
                                    "precision"))
def sample_bicubic_pallas(low_xy: jax.Array, my: jax.Array, mx: jax.Array,
                          scale_h: float, scale_w: float,
                          interpret: bool = False,
                          precision=None
                          ) -> Tuple[jax.Array, jax.Array]:
    """low_xy [P, 2, hs, ws] f32; my/mx [P, S] int32 target-grid coords.

    Returns (vx, vy) [P, S]: the upsampled PAF x/y values at those pixels.
    S is padded to BLOCK_SAMPLES internally.  `precision` controls the
    sampling matmul (None = backend default single-pass; pass
    jax.lax.Precision.HIGHEST for bit-accurate parity testing).
    """
    p, _, hs, ws = low_xy.shape
    s = my.shape[1]
    s_pad = -(-s // BLOCK_SAMPLES) * BLOCK_SAMPLES
    if s_pad != s:
        my = jnp.pad(my, ((0, 0), (0, s_pad - s)))
        mx = jnp.pad(mx, ((0, 0), (0, s_pad - s)))
    sb = s_pad // BLOCK_SAMPLES
    my4 = my.reshape(p, sb, 1, BLOCK_SAMPLES)
    mx4 = mx.reshape(p, sb, 1, BLOCK_SAMPLES)
    # [P, 1, 2*ws, hs]: x map rows then y map rows, both transposed
    low_t = low_xy.transpose(0, 1, 3, 2).reshape(p, 1, 2 * ws, hs)

    kernel = _make_kernel(hs, ws, scale_h, scale_w, precision)
    coord_spec = pl.BlockSpec((1, 1, 1, BLOCK_SAMPLES),
                              lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM)
    vx, vy = pl.pallas_call(
        kernel,
        grid=(p, sb),
        in_specs=[
            pl.BlockSpec((1, 1, 2 * ws, hs), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            coord_spec, coord_spec,
        ],
        out_specs=[coord_spec, coord_spec],
        out_shape=[
            jax.ShapeDtypeStruct((p, sb, 1, BLOCK_SAMPLES), jnp.float32),
            jax.ShapeDtypeStruct((p, sb, 1, BLOCK_SAMPLES), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * p * s_pad * hs * (ws + 1) * 2),
            bytes_accessed=int(p * s_pad * 4 * 4 + p * 2 * hs * ws * 4),
            transcendentals=0),
        interpret=interpret,
    )(low_t, my4, mx4)
    return (vx.reshape(p, s_pad)[:, :s], vy.reshape(p, s_pad)[:, :s])
