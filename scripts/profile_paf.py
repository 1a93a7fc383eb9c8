#!/usr/bin/env python3
"""Profile the worst-case (K=127) PAF scoring path component by component.

Breaks the 14 ms/frame worst-case post chain (BENCH_r01) into:
  a) resize+nms alone
  b) full paf_scores_multiscale (pallas sampler)
  c) sample_bicubic_pallas alone at the same sample count
  d) geometry+finalize only (XLA side, sampling stubbed)
"""

import sys
import time

import numpy as np

_T0 = time.perf_counter()


def p(msg):
    print(f"[profile +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from openpose_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from openpose_tpu import train
    from openpose_tpu.models import zoo
    from openpose_tpu.ops import nms, paf, resize
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
    p(f"synthetic net output ready {synth.shape}")

    # Saturated peaks: K=127 everywhere
    K = POSE_MAX_PEOPLE
    peaks_np = np.zeros((batch, num_parts, K + 1, 3), np.float32)
    peaks_np[:, :, 0, 0] = K
    peaks_np[:, :, 1:, 0] = rng.uniform(0, net_w - 1, (batch, num_parts, K))
    peaks_np[:, :, 1:, 1] = rng.uniform(0, net_h - 1, (batch, num_parts, K))
    peaks_np[:, :, 1:, 2] = rng.uniform(0.1, 1.0, (batch, num_parts, K))
    peaks_const = jnp.asarray(peaks_np)

    def step_resize_nms(c):
        merged = resize.resize_bicubic(synth[..., :num_parts] + c * 1e-12,
                                       (net_h, net_w))
        pk = nms.nms(merged, 0.05, K)
        return fold(c, pk)

    def step_paf_full(c):
        scores = paf.paf_scores_multiscale(
            (synth + c * 1e-12,), (1.0,), (net_h, net_w), peaks_const,
            pairs, map_idx, 0.05, 0.95, 0.05, fast_peaks=0)
        return fold(c, scores)

    def step_paf_xla(c):
        scores = paf.paf_scores_multiscale(
            (synth + c * 1e-12,), (1.0,), (net_h, net_w), peaks_const,
            pairs, map_idx, 0.05, 0.95, 0.05, fast_peaks=0,
            use_pallas=False)
        return fold(c, scores)

    # sampler alone: same S = K*K*25 per (n, pair)
    S = K * K * 25
    my = jnp.asarray(rng.randint(0, net_h, (batch, len(pairs_np), S)),
                     jnp.int32)
    mx = jnp.asarray(rng.randint(0, net_w, (batch, len(pairs_np), S)),
                     jnp.int32)
    hs, ws = synth.shape[1], synth.shape[2]
    chans = jnp.asarray(np.asarray(synth).transpose(0, 3, 1, 2))
    low_xy = jnp.stack([chans[:, map_idx_np[:, 0]],
                        chans[:, map_idx_np[:, 1]]], axis=2)

    def step_sampler(c):
        from openpose_tpu.ops.paf_pallas import sample_bicubic_pallas
        vx, vy = jax.vmap(
            lambda lo, m, x: sample_bicubic_pallas(
                lo + c * 1e-12, m, x, net_h / hs, net_w / ws))(low_xy, my, mx)
        return fold(c, vx, vy)

    def step_geometry(c):
        geo = paf._line_geometry(peaks_const + c * 1e-12, pairs,
                                 (net_h, net_w))
        return c + geo["mx"][0, 0, 0, 0, 0].astype(jnp.float32) * 1e-12 \
            + geo["norm"][0, 0, 0, 0] * 1e-12

    p("timing pallas sampler alone")
    t = chain_ms(step_sampler, n_lo=2, n_hi=10)
    p(f"sampler(pallas): {t:.2f} ms/batch")
    p("timing full paf pallas")
    t = chain_ms(step_paf_full, n_lo=2, n_hi=10)
    p(f"paf full (pallas): {t:.2f} ms/batch")
    p("timing full paf XLA")
    t = chain_ms(step_paf_xla, n_lo=2, n_hi=6)
    p(f"paf full (XLA tap-matrix): {t:.2f} ms/batch")


if __name__ == "__main__":
    main()
