"""Tutorial 09: keypoints from externally supplied heatmaps (net bypass).

Mirrors the reference's examples/tutorial_api_cpp/09_keypoints_from_heatmaps
(Datum::poseNetOutput injection, include/openpose/core/datum.hpp:212-217):
run ONLY the post-processing (resize-merge -> NMS -> PAF scoring -> greedy
assembly) on a heatmap tensor you provide — e.g. produced by another model,
loaded from disk, or synthesized.

Usage: python examples/09_keypoints_from_heatmaps.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from openpose_tpu import train
from openpose_tpu.models import zoo
from openpose_tpu.ops import paf
from openpose_tpu.params import PoseModel
from openpose_tpu.pose.extractor import PoseExtractor


def main():
    model = zoo.load_pose_model(PoseModel.BODY_25)
    info = model.info
    h, w = 368, 656

    # Synthesize a 2-person net output (normally you would load one)
    rng = np.random.RandomState(0)
    kp = np.zeros((1, 2, info.num_parts, 3), np.float32)
    for p, cx in enumerate((180.0, 450.0)):
        kp[0, p, :, 0] = cx + rng.uniform(-35, 35, info.num_parts)
        kp[0, p, :, 1] = 180 + rng.uniform(-70, 70, info.num_parts)
        kp[0, p, :, 2] = 1.0
    pairs, map_idx = paf.pair_tables(info)
    net_output = np.asarray(train.make_targets(
        jnp.asarray(kp), jnp.asarray(pairs), jnp.asarray(map_idx),
        (h, w), info.num_parts, info.heatmap_channels))[0]

    extractor = PoseExtractor(model, compute_dtype=jnp.float32)
    image = np.zeros((h, w, 3), np.float32)       # only sets the geometry
    pred = extractor.forward(image, net_resolution=(w, h),
                             net_output=net_output)
    print(f"people found: {pred.keypoints.shape[0]}")
    means = sorted(
        float(pred.keypoints[p, pred.keypoints[p, :, 2] > 0, 0].mean())
        for p in range(pred.keypoints.shape[0]))
    for mean_x, cx in zip(means, (180.0, 450.0)):
        print(f"  detected person at mean x = {mean_x:.1f} "
              f"(injected at {cx:.0f})")


if __name__ == "__main__":
    main()
