#!/usr/bin/env python3
"""Isolate where the chained post-pipeline loses time vs component sums."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from openpose_tpu import train
from openpose_tpu.models import zoo
from openpose_tpu.ops import nms, paf, resize
from openpose_tpu.params import POSE_MAX_PEOPLE, PoseModel
from openpose_tpu.utils.benchmark import chain_ms, fold


def main():
    model = zoo.load_pose_model(PoseModel.BODY_25)
    info = model.info
    pairs = jnp.asarray(paf.pair_tables(info)[0])
    map_idx = jnp.asarray(paf.pair_tables(info)[1])
    num_parts = info.num_parts
    net_h, net_w = 368, 656
    batch = 8

    rng = np.random.RandomState(0)
    people = 8
    kp = np.zeros((batch, people, num_parts, 3), np.float32)
    for b in range(batch):
        for p in range(people):
            cx, cy = rng.uniform(60, net_w - 60), rng.uniform(80, net_h - 80)
            kp[b, p, :, 0] = cx + rng.uniform(-40, 40, num_parts)
            kp[b, p, :, 1] = cy + rng.uniform(-70, 70, num_parts)
            kp[b, p, :, 2] = 1.0
    synth = jax.block_until_ready(train.make_targets(
        jnp.asarray(kp), pairs, map_idx, (net_h, net_w), num_parts,
        info.heatmap_channels))
    peaks0 = jax.block_until_ready(jax.jit(
        lambda s: nms.nms(resize.resize_bicubic(
            s[..., :num_parts], (net_h, net_w)), 0.05, POSE_MAX_PEOPLE)
    )(synth))

    def t(name, step, **kw):
        ms = chain_ms(step, **kw)
        print(f"{name:36s} {ms / batch:7.3f} ms/frame")

    def step_resize_nms(c):
        m = resize.resize_bicubic((synth + c * 1e-12)[..., :num_parts],
                                  (net_h, net_w))
        pk = nms.nms(m, 0.05, POSE_MAX_PEOPLE)
        return fold(c, pk)

    def step_paf_dynamic_peaks(c):
        # peaks perturbed -> cond predicate is runtime-dynamic
        pk = peaks0 + c * 1e-12
        sc = paf.paf_scores_multiscale(
            (synth + c * 1e-12,), (1.0,), (net_h, net_w), pk, pairs,
            map_idx, 0.05, 0.95, 0.05, fast_peaks=(16, 48))
        return fold(c, sc)

    def step_paf_fixed16_dynamic(c):
        pk = peaks0 + c * 1e-12
        sc = paf.paf_scores_multiscale(
            (synth + c * 1e-12,), (1.0,), (net_h, net_w), pk, pairs,
            map_idx, 0.05, 0.95, 0.05, fast_peaks=16)
        return fold(c, sc)

    def step_paf_notier_16cap(c):
        # no cond at all: slice peaks to 16 statically
        pk = (peaks0 + c * 1e-12)[:, :, :17]
        sc = paf.paf_scores_multiscale(
            (synth + c * 1e-12,), (1.0,), (net_h, net_w), pk, pairs,
            map_idx, 0.05, 0.95, 0.05, fast_peaks=0)
        return fold(c, sc)

    t("resize + nms chained", step_resize_nms)
    t("paf ladder, dynamic peaks", step_paf_dynamic_peaks)
    t("paf single tier 16, dynamic", step_paf_fixed16_dynamic)
    t("paf no-cond K=16, dynamic", step_paf_notier_16cap)


if __name__ == "__main__":
    main()
