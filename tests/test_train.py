"""Training objective + loop tests (tiny shapes, CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from openpose_tpu import train, train_loop
from openpose_tpu.models import graph
from openpose_tpu.ops import paf as paf_ops
from openpose_tpu.params import PoseModel, POSE_MODEL_INFO


class TestTargets:
    def test_part_maps_peak_at_keypoint(self):
        info = POSE_MODEL_INFO[PoseModel.MPI_15_4]
        pairs = jnp.asarray(paf_ops.pair_tables(info)[0])
        map_idx = jnp.asarray(paf_ops.pair_tables(info)[1])
        kp = np.zeros((1, 2, info.num_parts, 3), np.float32)
        kp[0, 0, 0] = (40.0, 24.0, 1.0)   # head at (40, 24)
        t = np.asarray(train.make_targets(
            jnp.asarray(kp), pairs, map_idx, (64, 64), info.num_parts,
            info.heatmap_channels))
        assert t.shape == (1, 8, 8, info.heatmap_channels)
        head = t[0, :, :, 0]
        iy, ix = np.unravel_index(head.argmax(), head.shape)
        # keypoint (40, 24) -> grid cell ((40+... stride 8, centers at 3.5+8k)
        assert (ix, iy) == (5, 3)
        # grid centers sit at 3.5 + 8k input px, so the nearest cell is
        # ~3.5 px away -> exp(-24.5 / (2*49)) ~= 0.78
        assert head.max() > 0.7
        # background complements the parts (1 - max part confidence)
        bkg = t[0, :, :, info.num_parts]
        assert bkg[iy, ix] == pytest.approx(1.0 - head.max(), abs=1e-5)

    def test_paf_along_limb(self):
        info = POSE_MODEL_INFO[PoseModel.MPI_15_4]
        pairs_np, map_idx_np = paf_ops.pair_tables(info)
        kp = np.zeros((1, 1, info.num_parts, 3), np.float32)
        # horizontal limb: head (0) at x=8, neck (1) at x=56, same y=32
        kp[0, 0, 0] = (8.0, 32.0, 1.0)
        kp[0, 0, 1] = (56.0, 32.0, 1.0)
        t = np.asarray(train.make_targets(
            jnp.asarray(kp), jnp.asarray(pairs_np), jnp.asarray(map_idx_np),
            (64, 64), info.num_parts, info.heatmap_channels))
        pair0 = 0  # MPI pair 0 = (0, 1)
        xc = map_idx_np[pair0, 0]
        paf_x = t[0, :, :, xc]
        # unit +x along the limb row (grid row 4 covers y=32)
        assert paf_x[4, 2] == pytest.approx(1.0)
        assert abs(paf_x[0, 2]) < 1e-6

    def test_train_step_reduces_loss(self):
        info = POSE_MODEL_INFO[PoseModel.MPI_15_4]
        spec = graph.load_spec(info.spec)
        optimizer = optax.adam(1e-3)
        state = train.init_train_state(spec, optimizer,
                                       jax.random.PRNGKey(0))
        pairs = jnp.asarray(paf_ops.pair_tables(info)[0])
        map_idx = jnp.asarray(paf_ops.pair_tables(info)[1])
        kp = np.zeros((2, 1, info.num_parts, 3), np.float32)
        kp[:, 0, :, 0] = 20.0
        kp[:, 0, :, 1] = 20.0
        kp[:, 0, :, 2] = 1.0
        targets = train.make_targets(
            jnp.asarray(kp), pairs, map_idx, (48, 48), info.num_parts,
            info.heatmap_channels)
        images = jnp.zeros((2, 48, 48, 3))
        step = jax.jit(train.make_train_step(spec, optimizer, jnp.float32))
        losses = []
        for _ in range(5):
            state, loss = step(state, images, targets)
            losses.append(float(loss))
        assert losses[-1] < losses[0]


class TestCocoConversion:
    def test_neck_midhip_synthesis(self):
        kp17 = np.zeros((1, 17, 3), np.float32)
        kp17[0, 5] = (10, 20, 2)   # lshoulder
        kp17[0, 6] = (30, 20, 2)   # rshoulder
        kp17[0, 11] = (12, 60, 2)  # lhip
        kp17[0, 12] = (28, 60, 2)  # rhip
        kp17[0, 0] = (20, 5, 2)    # nose
        out = train_loop.coco_to_model_keypoints(
            kp17, PoseModel.BODY_25, max_people=2)
        assert out.shape == (2, 25, 3)
        np.testing.assert_allclose(out[0, 1, :2], (20, 20))   # neck
        np.testing.assert_allclose(out[0, 8, :2], (20, 60))   # midhip
        np.testing.assert_allclose(out[0, 0, :2], (20, 5))    # nose
        assert out[1].sum() == 0


class TestFlopCount:
    def test_body25_flops_match_hand_count(self):
        from openpose_tpu.models import graph, zoo
        m = zoo.load_pose_model(PoseModel.BODY_25)
        fl = graph.count_flops(m.spec, (368, 656))
        total = sum(fl.values())
        # ~287 GFLOP/frame at the headline resolution (2*MACs)
        assert 280e9 < total < 295e9, total
        # conv4_2 (512ch 3x3 at stride-8 resolution... actually stride-4):
        # spot-check one layer against the closed form
        # conv1_1: 3->64, 3x3, 368x656 output
        assert fl["conv1_1"] == 2 * 9 * 3 * 64 * 368 * 656

    def test_flops_scale_with_resolution(self):
        from openpose_tpu.models import graph, zoo
        m = zoo.load_pose_model(PoseModel.BODY_25)
        a = sum(graph.count_flops(m.spec, (368, 656)).values())
        b = sum(graph.count_flops(m.spec, (184, 328)).values())
        assert 3.5 < a / b < 4.5


class TestSyntheticScenes:
    def test_render_scene_image(self):
        from openpose_tpu import scenes
        rng = np.random.RandomState(0)
        people = scenes.random_people(rng, 2, (96, 160))
        img = scenes.render_scene_image(people, (96, 160), rng=rng)
        assert img.shape == (96, 160, 3) and img.dtype == np.uint8
        assert img.max() > 100          # skeleton drawn

    def test_synthetic_iterator_shapes(self):
        from openpose_tpu import train_loop
        cfg = train_loop.TrainConfig(image_size=(96, 160), batch_size=2,
                                     max_people=4)
        it = train_loop.synthetic_scene_iterator(cfg, seed=0)
        imgs, kps = next(it)
        assert imgs.shape == (2, 96, 160, 3)
        assert kps.shape == (2, 4, 25, 3)
        assert kps[..., 2].max() == 1.0

    def test_bf16_train_step_differentiates(self):
        # the f32-default step must also work explicitly (regression for the
        # conv transpose dtype mismatch under preferred_element_type)
        info = POSE_MODEL_INFO[PoseModel.MPI_15_4]
        spec = graph.load_spec(info.spec)
        optimizer = optax.adam(1e-3)
        state = train.init_train_state(spec, optimizer, jax.random.PRNGKey(0))
        pairs = jnp.asarray(paf_ops.pair_tables(info)[0])
        map_idx = jnp.asarray(paf_ops.pair_tables(info)[1])
        kp = np.zeros((1, 1, info.num_parts, 3), np.float32)
        kp[0, 0, :, :] = (20.0, 20.0, 1.0)
        targets = train.make_targets(jnp.asarray(kp), pairs, map_idx,
                                     (48, 48), info.num_parts,
                                     info.heatmap_channels)
        step = jax.jit(train.make_train_step(spec, optimizer))
        state, loss = step(state, jnp.zeros((1, 48, 48, 3)), targets)
        assert np.isfinite(float(loss))
