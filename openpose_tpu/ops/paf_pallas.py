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
