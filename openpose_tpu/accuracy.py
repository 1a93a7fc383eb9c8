"""Closed-loop synthetic COCO accuracy harness.

Measures AP of the REAL user path without trained weights: synthetic scenes
with known keypoints are rendered to net-output tensors ON DEVICE
(train.make_targets), injected into the sharded inference program in place of
the CNN (the reference's Datum::poseNetOutput hook, datum.hpp:212-217), and
the standard device->host tail runs unchanged — NMS + PAF scoring in the
sharded program, greedy assembly on the host pool, CocoJsonSaver, and the
pycocotools-exact evaluator.  This closes the loop the reference closes with
scripts/tests/pose_accuracy_coco_val.sh:14-30: any regression in peak
refinement, PAF scoring, assembly, COCO reordering, or evaluation moves the
reported AP.

The moment real weights exist, scripts/coco_val.py measures true COCO AP with
the same saver + evaluator; this harness pins everything downstream of the
CNN meanwhile, and the noise sweep characterizes robustness of the post chain
to imperfect heatmaps.
"""

from __future__ import annotations

import concurrent.futures
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openpose_tpu import scenes, train
from openpose_tpu.io import coco_eval, json_io
from openpose_tpu.models import zoo
from openpose_tpu.ops import paf
from openpose_tpu.params import PoseModel
from openpose_tpu.parallel.inference import ShardedPoseInference
from openpose_tpu.pose.extractor import PoseExtractor


def synthetic_coco_eval(n_images: int = 64,
                        net_hw: Tuple[int, int] = (368, 656),
                        people_range: Tuple[int, int] = (1, 4),
                        noise: float = 0.0,
                        kp_jitter: float = 0.0,
                        batch: int = 8,
                        seed: int = 0,
                        mesh=None,
                        model=None,
                        assembly_workers: int = 4) -> Dict[str, float]:
    """Run the closed loop; returns {AP, AP50, AP75, AR, n_images, noise}.

    noise: stddev of SPATIALLY CORRELATED noise added to every net-output
    channel on device (white noise rendered at 1/4 the map resolution and
    bicubic-upsampled — CNN prediction error is smooth, so white pixel
    noise would be an unrealistically adversarial model; heatmap peaks have
    amplitude 1.0).
    kp_jitter: stddev (input px) of Gaussian displacement applied to the
    RENDERED keypoints only — the ground truth keeps the true positions, so
    this sweeps AP against controlled localization error of the "CNN".
    """
    if model is None:
        model = zoo.load_pose_model(PoseModel.BODY_25)
    info = model.info
    net_h, net_w = net_hw
    pairs, map_idx = paf.pair_tables(info)
    pairs_j, map_idx_j = jnp.asarray(pairs), jnp.asarray(map_idx)

    inference = ShardedPoseInference(
        model, mesh=mesh, net_hw=net_hw, net_bypass=True,
        compute_dtype=jnp.float32)
    extractor = PoseExtractor(model, compute_dtype=jnp.float32)
    if batch % inference.data_parallelism:
        batch = inference.data_parallelism * max(
            1, batch // inference.data_parallelism)

    num_parts, num_ch = info.num_parts, info.heatmap_channels

    from openpose_tpu.ops import resize as resize_ops

    @jax.jit
    def render(kp_batch, noise_key, noise_scale, jitter_scale):
        k1, k2 = jax.random.split(noise_key)
        kp = kp_batch.at[..., :2].add(
            jitter_scale * jax.random.normal(k1, kp_batch[..., :2].shape))
        out = train.make_targets(kp, pairs_j, map_idx_j,
                                 (net_h, net_w), num_parts, num_ch)
        b, h8, w8, c = out.shape
        low = jax.random.normal(k2, (b, max(1, h8 // 4), max(1, w8 // 4), c))
        return out + noise_scale * resize_ops.resize_bicubic(low, (h8, w8))

    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    max_people = people_range[1]
    saver = json_io.CocoJsonSaver()
    gts: List[Dict] = []
    pool = concurrent.futures.ThreadPoolExecutor(assembly_workers)
    futures = []

    def assemble(idx, peaks_i, scores_i):
        kp, sc = extractor.assemble(peaks_i, scores_i, 1.0)
        return idx, kp, sc

    try:
        for start in range(0, n_images, batch):
            ids = [start + i for i in range(batch)]
            kp_batch = np.zeros((batch, max_people, info.num_parts, 3),
                                np.float32)
            for bi, image_id in enumerate(ids):
                if image_id >= n_images:
                    continue                 # padded tail: zero people
                people = scenes.random_people(
                    rng, rng.randint(people_range[0], people_range[1] + 1),
                    (net_h, net_w))
                kp_batch[bi, :people.shape[0]] = people
                gts.extend(scenes.coco_ground_truth(people, image_id))
            key, sub = jax.random.split(key)
            net_out = render(jnp.asarray(kp_batch), sub, float(noise),
                             float(kp_jitter))
            peaks, scores = inference.fetch(*inference(net_out))
            for bi, image_id in enumerate(ids):
                if image_id >= n_images:
                    continue
                futures.append(pool.submit(assemble, image_id,
                                           peaks[bi], scores[bi]))
        for fut in futures:
            image_id, kp, sc = fut.result()
            if kp.size:
                saver.record(kp, sc, image_id)
    finally:
        pool.shutdown(wait=True)

    detections = saver.entries[json_io.VARIANT_BODY]
    metrics = coco_eval.evaluate(detections, gts)
    metrics.update(n_images=n_images, noise=noise, kp_jitter=kp_jitter,
                   n_detections=len(detections), n_gt=len(gts))
    return metrics


def noise_sweep(levels=(0.0, 0.1, 0.2, 0.4), **kw) -> List[Dict[str, float]]:
    """AP at each (correlated) map-noise level."""
    model = kw.pop("model", None) or zoo.load_pose_model(PoseModel.BODY_25)
    return [synthetic_coco_eval(noise=lv, model=model, **kw)
            for lv in levels]


def jitter_sweep(levels=(0.0, 2.0, 4.0, 8.0), **kw) -> List[Dict[str, float]]:
    """AP at each keypoint-localization-error level (px)."""
    model = kw.pop("model", None) or zoo.load_pose_model(PoseModel.BODY_25)
    return [synthetic_coco_eval(kp_jitter=lv, model=model, **kw)
            for lv in levels]
