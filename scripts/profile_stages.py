#!/usr/bin/env python3
"""Per-stage timing of the device pipeline on the real chip."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import time
import numpy as np
import jax
import jax.numpy as jnp
from openpose_tpu.models import graph, zoo
from openpose_tpu.ops import nms, paf, resize
from openpose_tpu.params import PoseModel


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:34s} {dt:8.2f} ms")
    return out


def main():
    model = zoo.load_pose_model(PoseModel.BODY_25)
    pairs, map_idx = (jnp.asarray(t) for t in paf.pair_tables(model.info))
    num_parts = model.info.num_parts
    net_h, net_w = 368, 656
    import os
    batches = tuple(int(b) for b in
                    os.environ.get("PROFILE_BATCHES", "1,8").split(","))
    for batch in batches:
        print(f"--- batch={batch} ---")
        rng = np.random.RandomState(0)
        images = jnp.asarray(
            rng.uniform(0, 255, (batch, net_h, net_w, 3)).astype(np.float32))

        fwd = jax.jit(lambda p, x: graph.forward(
            p, model.spec, resize.normalize_vgg(x), jnp.bfloat16))
        out = timeit("forward (bf16)", fwd, model.params, images)

        rsz = jax.jit(lambda o: resize.resize_bicubic(
            o[..., :num_parts], (net_h, net_w)))
        merged = timeit("resize_bicubic x8 (parts only)", rsz, out)

        nmsf = jax.jit(lambda m: nms.nms(m, 0.05, 127))
        peaks = timeit("nms", nmsf, merged)
        counts = np.asarray(peaks)[:, :, 0, 0]
        print(f"  peak counts: max={counts.max():.0f} mean={counts.mean():.1f}")

        paff = jax.jit(lambda o, pk: paf.paf_scores_multiscale(
            (o,), (1.0,), (net_h, net_w), pk, pairs, map_idx, 0.05, 0.95, 0.05))
        timeit("paf scores (tiered)", paff, out, peaks)

        # Synthetic sparse peaks (typical frame: <= 8 people)
        pk_small = np.zeros(np.asarray(peaks).shape, np.float32)
        rng2 = np.random.RandomState(1)
        for b in range(pk_small.shape[0]):
            for part in range(pk_small.shape[1]):
                cnt = rng2.randint(3, 9)
                pk_small[b, part, 0, 0] = cnt
                pk_small[b, part, 1:cnt + 1, 0] = rng2.uniform(2, net_w - 2, cnt)
                pk_small[b, part, 1:cnt + 1, 1] = rng2.uniform(2, net_h - 2, cnt)
                pk_small[b, part, 1:cnt + 1, 2] = rng2.uniform(0.1, 1, cnt)
        timeit("paf scores (fast tier, 8ppl)", paff, out, jnp.asarray(pk_small))

        paf_slow = jax.jit(lambda o, pk: paf.paf_scores_multiscale(
            (o,), (1.0,), (net_h, net_w), pk, pairs, map_idx, 0.05, 0.95,
            0.05, fast_peaks=0))
        timeit("paf scores (full 127)", paf_slow, out, peaks)

        full = jax.jit(lambda p, x: _full(p, x))

        def _full(p, x):
            o = graph.forward(p, model.spec, resize.normalize_vgg(x),
                              jnp.bfloat16)
            m = resize.resize_bicubic(o[..., :num_parts], (net_h, net_w))
            pk = nms.nms(m, 0.05, 127)
            sc = paf.paf_scores_multiscale(
                (o,), (1.0,), (net_h, net_w), pk, pairs, map_idx,
                0.05, 0.95, 0.05)
            return pk, sc
        timeit("FULL pipeline", full, model.params, images)


if __name__ == "__main__":
    main()
