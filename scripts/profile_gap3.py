#!/usr/bin/env python3
"""Third-round isolation: what about the nms->paf edge costs 2.6 ms?"""
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
        print(f"{name:40s} {ms / batch:7.3f} ms/frame")

    def full_barrier(c):
        src = synth + c * 1e-12
        m = resize.resize_bicubic(src[..., :num_parts], (net_h, net_w))
        pk = nms.nms(m, 0.05, POSE_MAX_PEOPLE)
        pk = jax.lax.optimization_barrier(pk)
        sc = paf.paf_scores_multiscale(
            (src,), (1.0,), (net_h, net_w), pk, pairs, map_idx,
            0.05, 0.95, 0.05, fast_peaks=(16, 48))
        return fold(c, pk, sc)

    def full_disconnected(c):
        # nms computed and used in the carry, but paf reads constant peaks
        src = synth + c * 1e-12
        m = resize.resize_bicubic(src[..., :num_parts], (net_h, net_w))
        pk = nms.nms(m, 0.05, POSE_MAX_PEOPLE)
        sc = paf.paf_scores_multiscale(
            (src,), (1.0,), (net_h, net_w), peaks0 + c * 1e-12, pairs,
            map_idx, 0.05, 0.95, 0.05, fast_peaks=(16, 48))
        return fold(c, pk, sc)

    def full_src_barrier(c):
        src = synth + c * 1e-12
        m = resize.resize_bicubic(src[..., :num_parts], (net_h, net_w))
        pk = nms.nms(m, 0.05, POSE_MAX_PEOPLE)
        src2, pk2 = jax.lax.optimization_barrier((src, pk))
        sc = paf.paf_scores_multiscale(
            (src2,), (1.0,), (net_h, net_w), pk2, pairs, map_idx,
            0.05, 0.95, 0.05, fast_peaks=(16, 48))
        return fold(c, pk, sc)

    t("FULL + barrier on pk", full_barrier)
    t("FULL + barrier on (src, pk)", full_src_barrier)
    t("FULL, paf reads constant peaks", full_disconnected)


if __name__ == "__main__":
    main()
