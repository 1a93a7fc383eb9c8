"""Net-output injection (poseNetOutput bypass): post-processing recovers the
people encoded in a synthetic heatmap tensor — an end-to-end correctness
check of resize-merge -> NMS -> PAF scoring -> greedy assembly without CNN
weights."""

import numpy as np
import jax.numpy as jnp
import pytest

from openpose_tpu import train
from openpose_tpu.models import zoo
from openpose_tpu.ops import paf
from openpose_tpu.params import PoseModel
from openpose_tpu.pose.extractor import PoseExtractor


@pytest.mark.parametrize("centers", [(120.0,), (90.0, 230.0)])
def test_injected_people_recovered(centers):
    model = zoo.load_pose_model(PoseModel.BODY_25)
    info = model.info
    h, w = 176, 320
    rng = np.random.RandomState(1)
    people = len(centers)
    kp = np.zeros((1, people, info.num_parts, 3), np.float32)
    for p, cx in enumerate(centers):
        kp[0, p, :, 0] = cx + rng.uniform(-14, 14, info.num_parts)
        kp[0, p, :, 1] = 88 + rng.uniform(-30, 30, info.num_parts)
        kp[0, p, :, 2] = 1.0
    pairs, map_idx = paf.pair_tables(info)
    net_output = np.asarray(train.make_targets(
        jnp.asarray(kp), jnp.asarray(pairs), jnp.asarray(map_idx),
        (h, w), info.num_parts, info.heatmap_channels))[0]

    extractor = PoseExtractor(model, compute_dtype=jnp.float32)
    image = np.zeros((h, w, 3), np.float32)
    pred = extractor.forward(image, net_resolution=(w, h),
                             net_output=net_output)
    assert pred.keypoints.shape[0] >= people
    # Each injected person matched by a top-scored detection within a few px
    top = np.argsort(-pred.scores)[:people]
    got_means = sorted(
        float(np.mean(pred.keypoints[p, pred.keypoints[p, :, 2] > 0, 0]))
        for p in top)
    want_means = sorted(float(np.mean(kp[0, p, :, 0]))
                        for p in range(people))
    np.testing.assert_allclose(got_means, want_means, atol=8.0)
