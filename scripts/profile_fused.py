#!/usr/bin/env python3
"""On-TPU check + timing of the fused PAF kernel vs the XLA backend."""

import sys
import time

import numpy as np

_T0 = time.perf_counter()


def p(msg):
    print(f"[fused +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from openpose_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from openpose_tpu import train
    from openpose_tpu.models import zoo
    from openpose_tpu.ops import paf
    from openpose_tpu.params import POSE_MAX_PEOPLE, PoseModel
    from openpose_tpu.utils.benchmark import chain_ms, fold

    model = zoo.load_pose_model(PoseModel.BODY_25)
    info = model.info
    pairs_np, map_idx_np = paf.pair_tables(info)
    pairs = jnp.asarray(pairs_np)
    map_idx = jnp.asarray(map_idx_np)
    num_parts = info.num_parts
    net_h, net_w = 368, 656
    batch = 8
    rng = np.random.RandomState(0)

    people = 8
    kp = np.zeros((batch, people, num_parts, 3), np.float32)
    for b in range(batch):
        for q in range(people):
            cx = rng.uniform(60, net_w - 60)
            cy = rng.uniform(80, net_h - 80)
            kp[b, q, :, 0] = cx + rng.uniform(-40, 40, num_parts)
            kp[b, q, :, 1] = cy + rng.uniform(-70, 70, num_parts)
            kp[b, q, :, 2] = 1.0
    synth = train.make_targets(
        jnp.asarray(kp), pairs, map_idx, (net_h, net_w), num_parts,
        info.heatmap_channels)
    synth = jax.block_until_ready(synth)

    K = POSE_MAX_PEOPLE
    peaks_np = np.zeros((batch, num_parts, K + 1, 3), np.float32)
    peaks_np[:, :, 0, 0] = K
    peaks_np[:, :, 1:, 0] = rng.uniform(0, net_w - 1, (batch, num_parts, K))
    peaks_np[:, :, 1:, 1] = rng.uniform(0, net_h - 1, (batch, num_parts, K))
    peaks_np[:, :, 1:, 2] = rng.uniform(0.1, 1.0, (batch, num_parts, K))
    peaks_sat = jnp.asarray(peaks_np)

    # sparse peaks (typical): 10 peaks per part
    peaks_sp = peaks_np.copy()
    peaks_sp[:, :, 0, 0] = 10
    peaks_sparse = jnp.asarray(peaks_sp)

    args_tail = (pairs, map_idx, 0.05, 0.95, 0.05)

    # ---- parity on TPU (small slice, default precision) ----
    p("parity check (saturated, default precision)")
    want = np.asarray(paf.paf_scores_multiscale(
        (synth,), (1.0,), (net_h, net_w), peaks_sat, *args_tail,
        fast_peaks=0, use_pallas=False))
    got = np.asarray(paf.paf_scores_multiscale(
        (synth,), (1.0,), (net_h, net_w), peaks_sat, *args_tail,
        fast_peaks=0, use_pallas=True))
    diff = np.abs(got - want)
    mismatch = np.mean(~np.isclose(got, want, rtol=1e-2, atol=2e-2))
    p(f"max|diff|={diff.max():.4g} mean|diff|={diff.mean():.4g} "
      f"frac mismatched(1e-2)={mismatch:.2e}")

    def mk_step(peaks_const, use_pallas):
        def step(c):
            scores = paf.paf_scores_multiscale(
                (synth + c * 1e-12,), (1.0,), (net_h, net_w), peaks_const,
                *args_tail, fast_peaks=0, use_pallas=use_pallas)
            return fold(c, scores)
        return step

    p("timing fused saturated (K=127)")
    t = chain_ms(mk_step(peaks_sat, True), n_lo=2, n_hi=10)
    p(f"fused saturated: {t:.2f} ms/batch ({t / batch:.3f} ms/frame)")
    p("timing fused sparse (10 peaks)")
    t = chain_ms(mk_step(peaks_sparse, True), n_lo=2, n_hi=10)
    p(f"fused sparse: {t:.2f} ms/batch ({t / batch:.3f} ms/frame)")
    p("timing old XLA saturated")
    t = chain_ms(mk_step(peaks_sat, False), n_lo=2, n_hi=6)
    p(f"xla saturated: {t:.2f} ms/batch ({t / batch:.3f} ms/frame)")


if __name__ == "__main__":
    main()
