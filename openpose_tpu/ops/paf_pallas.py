"""Pallas kernel: fused bicubic PAF sampling.

Computes V(s) = sum_{t,u} Wrow(s,t) * LOW(t,u) * Wcol(s,u) for blocks of
samples with the per-pair low-res PAF maps resident in VMEM — the fused
version of the tap-matrix contraction in ops/paf.py `paf_scores_multiscale`.
The XLA version materializes the [S, taps] weight matrices and [S, ws]
intermediates in HBM (~13 GB/frame of traffic at K=127); here they live and
die in VMEM, so HBM traffic collapses to coords in + samples out (~170 MB),
leaving pure MXU work.

Grid: (pairs, sample blocks).  Per step: compute Catmull-Rom tap weights for
the block (VPU), one [BS, hs] @ [hs, ws] matmul per component (MXU), row-wise
weighted reduce.  See /opt/skills/guides/pallas_guide.md patterns.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_SAMPLES = 1024


def _tap_weights_block(coord: jax.Array, in_size: int, scale: float):
    """coord [BS] int32 -> dense Catmull-Rom weights [BS, in_size] f32.

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
    grid = jax.lax.broadcasted_iota(jnp.int32, (bs, in_size), 1)
    acc = jnp.zeros((bs, in_size), jnp.float32)
    for ti, wi in ((t0i, w0), (t1i, w1), (t2i, w2), (t3i, w3)):
        acc = acc + jnp.where(grid == ti[:, None], wi[:, None], 0.0)
    return acc


def _make_kernel(n_pairs: int, hs: int, ws: int,
                 scale_h: float, scale_w: float):
    def kernel(low_ref, my_ref, mx_ref, vx_ref, vy_ref):
        # Block = all pairs x BLOCK_SAMPLES; fori_loop over pairs (dynamic
        # leading-dim indexing) keeps compile time flat while each matmul
        # stays MXU-shaped ([BS, hs] @ [hs, ws]).
        def body(p, _):
            my = my_ref[p, :]                   # [BS]
            mx = mx_ref[p, :]
            wrow = _tap_weights_block(my, hs, scale_h)    # [BS, hs]
            wcol = _tap_weights_block(mx, ws, scale_w)    # [BS, ws]
            low_x = low_ref[p, 0]               # [hs, ws]
            low_y = low_ref[p, 1]
            # HIGHEST: full-f32 matmul (default TPU f32 dot is bf16-pass
            # approximate; scores feed threshold comparisons downstream)
            tx = jnp.dot(wrow, low_x, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            ty = jnp.dot(wrow, low_y, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
            vx_ref[p, :] = jnp.sum(tx * wcol, axis=-1)
            vy_ref[p, :] = jnp.sum(ty * wcol, axis=-1)
            return 0

        jax.lax.fori_loop(0, n_pairs, body, 0)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("scale_h", "scale_w", "interpret"))
def sample_bicubic_pallas(low_xy: jax.Array, my: jax.Array, mx: jax.Array,
                          scale_h: float, scale_w: float,
                          interpret: bool = False
                          ) -> Tuple[jax.Array, jax.Array]:
    """low_xy [P, 2, hs, ws] f32; my/mx [P, S] int32 target-grid coords.

    Returns (vx, vy) [P, S]: the upsampled PAF x/y values at those pixels.
    S is padded to BLOCK_SAMPLES internally.
    """
    p, _, hs, ws = low_xy.shape
    s = my.shape[1]
    s_pad = -(-s // BLOCK_SAMPLES) * BLOCK_SAMPLES
    if s_pad != s:
        my = jnp.pad(my, ((0, 0), (0, s_pad - s)))
        mx = jnp.pad(mx, ((0, 0), (0, s_pad - s)))

    grid = (s_pad // BLOCK_SAMPLES,)
    kernel = _make_kernel(p, hs, ws, scale_h, scale_w)
    # Block layout note: blocks must keep the last two dims either divisible
    # by (8, 128) or equal to the full array dims — hence full-pairs blocks
    # (p, BLOCK_SAMPLES) and the in-kernel static pair loop.
    vx, vy = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((p, 2, hs, ws), lambda j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, BLOCK_SAMPLES), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, BLOCK_SAMPLES), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((p, BLOCK_SAMPLES), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, BLOCK_SAMPLES), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((p, s_pad), jnp.float32),
                   jax.ShapeDtypeStruct((p, s_pad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * p * s_pad * hs * (ws + 1) * 2),
            bytes_accessed=int(p * s_pad * 4 * 4 + p * 2 * hs * ws * 4),
            transcendentals=0),
        interpret=interpret,
    )(low_xy, my, mx)
    return vx[:, :s], vy[:, :s]
