"""Sharded whole-body cascade + multi-scale sharded inference tests.

Mirrors TestShardedInference (tests/test_models.py): per-sample parity of the
sharded program vs the unsharded reference path, plus the collective-free
HLO guarantee for every device program in the cascade.
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openpose_tpu.face.detector import detect_faces
from openpose_tpu.face.extractor import FaceExtractor
from openpose_tpu.hand.detector import detect_hands
from openpose_tpu.hand.extractor import HandExtractor
from openpose_tpu.models import zoo
from openpose_tpu.params import PoseModel
from openpose_tpu.parallel import mesh as mesh_lib
from openpose_tpu.parallel.inference import (
    ShardedPoseInference, ShardedTopDown)
from openpose_tpu.pose.extractor import PoseExtractor
from openpose_tpu.runtime.whole_body import ShardedWholeBody


def _mesh(n):
    devices = jax.devices()
    if len(devices) < n:
        pytest.skip(f"needs {n} devices")
    return mesh_lib.make_mesh(devices[:n], model=1)


class TestMultiScaleSharded:
    def test_matches_pose_extractor(self):
        """frame_hw + scale_number=2 sharded program == the single-frame
        PoseExtractor multi-scale path (same device ops, batched)."""
        mesh = _mesh(4)
        model = zoo.load_pose_model(PoseModel.MPI_15_4)
        rng = np.random.RandomState(0)
        frames = rng.randint(0, 255, (4, 96, 128, 3)).astype(np.uint8)

        from openpose_tpu.params import default_connect_params
        cp = default_connect_params(PoseModel.MPI_15_4, False)
        inf = ShardedPoseInference(
            model, mesh, net_hw=(64, 80), max_peaks=16,
            compute_dtype=jnp.float32, scale_number=2, scale_gap=0.25,
            frame_hw=(96, 128), nms_threshold=cp.nms_threshold,
            inter_threshold=cp.inter_threshold,
            inter_min_above_threshold=cp.inter_min_above_threshold)
        peaks, scores = inf(frames)
        peaks = np.asarray(peaks)

        ex = PoseExtractor(model, max_peaks=16, compute_dtype=jnp.float32)
        for i in range(4):
            pred = ex.forward(frames[i], net_resolution=(80, 64),
                              scale_number=2, scale_gap=0.25)
            np.testing.assert_allclose(peaks[i], pred.peaks, atol=1e-3)
            assert abs(inf.scale_net_to_output
                       - pred.scale_net_to_output) < 1e-9

    def test_multiscale_collective_free(self):
        mesh = _mesh(4)
        model = zoo.load_pose_model(PoseModel.MPI_15_4)
        inf = ShardedPoseInference(
            model, mesh, net_hw=(64, 80), max_peaks=16,
            compute_dtype=jnp.float32, scale_number=2, frame_hw=(96, 128))
        images = jax.device_put(jnp.zeros((4, 96, 128, 3), jnp.uint8),
                                mesh_lib.batch_sharding(mesh))
        hlo = inf._fn.lower(inf.params, images).compile().as_text()
        for op in ("all-reduce", "all-gather", "reduce-scatter",
                   "collective-permute", "all-to-all"):
            assert not re.search(rf"= \S+ {op}", hlo), f"found {op}"


class TestShardedTopDown:
    def test_matches_topdown_extractor(self):
        """Batched crops across a frame-batch == the per-frame
        TopDownExtractor path (face model, f32)."""
        mesh = _mesh(4)
        face_model = zoo.load_face_model()
        rng = np.random.RandomState(1)
        frames = rng.randint(0, 255, (4, 96, 128, 3)).astype(np.uint8)
        rects = [(10.0 + i, 12.0, 40.0, 40.0) for i in range(4)]

        td = ShardedTopDown(face_model, mesh, net_size=64, people_cap=2,
                            compute_dtype=jnp.float32)
        from openpose_tpu.ops import warp
        transforms = np.tile(np.asarray(td.INACTIVE, np.float32), (4, 2, 1))
        for i, r in enumerate(rects):
            transforms[i, 0] = warp.rect_to_transform(r, 64, mirror=(i % 2))
        peaks = np.asarray(td(frames, transforms))
        assert peaks.shape == (4, 2, 71, 3)

        from openpose_tpu.runtime.topdown import TopDownExtractor
        single = TopDownExtractor(face_model, net_size=64,
                                  compute_dtype=jnp.float32)
        for i, r in enumerate(rects):
            want = single.extract(frames[i].astype(np.float32), [r],
                                  [bool(i % 2)], 70)
            got = peaks[i, 0, :70]
            got_xy = warp.map_back(got[:, :2], transforms[i, 0])
            np.testing.assert_allclose(got_xy, want[0, :, :2], atol=1e-2)
            np.testing.assert_allclose(got[:, 2], want[0, :, 2], atol=1e-3)

    def test_crop_tier_ladder_exact(self):
        """A batch whose active slots fit a small tier runs the tier
        program and reproduces the full-cap program's output exactly
        (active slots identical, dropped INACTIVE slots exact zeros)."""
        mesh = _mesh(4)
        face_model = zoo.load_face_model()
        rng = np.random.RandomState(4)
        frames = rng.randint(0, 255, (4, 96, 128, 3)).astype(np.uint8)
        from openpose_tpu.ops import warp

        tiered = ShardedTopDown(face_model, mesh, net_size=64, people_cap=4,
                                compute_dtype=jnp.float32, crop_tiers=(1, 2))
        full = ShardedTopDown(face_model, mesh, net_size=64, people_cap=4,
                              compute_dtype=jnp.float32, crop_tiers=())
        transforms = np.tile(np.asarray(tiered.INACTIVE, np.float32),
                             (4, 4, 1))
        for i in range(4):
            transforms[i, 0] = warp.rect_to_transform(
                (8.0 + i, 10.0, 40.0, 40.0), 64, mirror=False)
        assert tiered.tier_for(transforms) == 1
        got = np.asarray(tiered(frames, transforms))
        want = np.asarray(full(frames, transforms))
        assert got.shape == want.shape == (4, 4, 71, 3)
        np.testing.assert_allclose(got[:, 0], want[:, 0], atol=1e-4)
        assert not got[:, 1:].any()      # dropped slots are exact zeros

        # two active slots -> tier 2; cap-filling actives -> full program
        transforms[2, 1] = warp.rect_to_transform(
            (30.0, 20.0, 30.0, 30.0), 64, mirror=True)
        assert tiered.tier_for(transforms) == 2
        transforms[1, 3] = transforms[2, 1]
        assert tiered.tier_for(transforms) == 4

    def test_topdown_collective_free(self):
        mesh = _mesh(4)
        face_model = zoo.load_face_model()
        td = ShardedTopDown(face_model, mesh, net_size=64, people_cap=2,
                            compute_dtype=jnp.float32)
        fn = td._fn((96, 128))
        batch_sh = mesh_lib.batch_sharding(mesh)
        frames = jax.device_put(jnp.zeros((4, 96, 128, 3), jnp.uint8),
                                batch_sh)
        transforms = jax.device_put(jnp.zeros((4, 2, 4), jnp.float32),
                                    batch_sh)
        hlo = fn.lower(td.params, frames, transforms).compile().as_text()
        for op in ("all-reduce", "all-gather", "reduce-scatter",
                   "collective-permute", "all-to-all"):
            assert not re.search(rf"= \S+ {op}", hlo), f"found {op}"


class TestShardedWholeBody:
    def _injected_frames(self, model, rng, n=4, hw=(96, 128)):
        """Frames are noise (random weights anyway); what matters is that
        assembly yields people so the face/hand stages activate."""
        return rng.randint(0, 255, (n,) + hw + (3,)).astype(np.uint8)

    @staticmethod
    def _person(cx, cy):
        """MPI_15 keypoints of one upright synthetic person around (cx, cy)
        with valid face (head+neck) and hand (wrist/elbow/shoulder) geometry
        (part ids: 0 Head, 1 Neck, 2-4 R arm, 5-7 L arm)."""
        kp = np.zeros((15, 3), np.float32)
        kp[0] = (cx, cy - 18, 0.9)            # head
        kp[1] = (cx, cy - 6, 0.9)             # neck
        kp[2] = (cx + 8, cy - 6, 0.9)         # RShoulder
        kp[3] = (cx + 14, cy + 4, 0.9)        # RElbow
        kp[4] = (cx + 18, cy + 14, 0.9)       # RWrist
        kp[5] = (cx - 8, cy - 6, 0.9)         # LShoulder
        kp[6] = (cx - 14, cy + 4, 0.9)        # LElbow
        kp[7] = (cx - 18, cy + 14, 0.9)       # LWrist
        return kp

    def test_cascade_matches_single_extractors(self):
        """Drive the face/hand stages with fabricated people (the body
        detector geometry is deterministic) and compare every crop against
        the per-frame FaceExtractor/HandExtractor path."""
        from openpose_tpu.runtime.whole_body import WholeBodyResult
        mesh = _mesh(4)
        pose_model = zoo.load_pose_model(PoseModel.MPI_15_4)
        face_model = zoo.load_face_model()
        hand_model = zoo.load_hand_model()
        rng = np.random.RandomState(2)
        frames = self._injected_frames(pose_model, rng)

        wb = ShardedWholeBody(
            pose_model, face_model, hand_model, mesh=mesh,
            frame_hw=(96, 128), net_hw=(64, 80), people_cap=2,
            max_peaks=16, face_net_size=64, hand_net_size=64,
            compute_dtype=jnp.float32)
        pose_enum = PoseModel(pose_model.info.name)
        results = []
        for i in range(4):
            people = np.stack([self._person(40 + 6 * i, 40),
                               self._person(90 - 4 * i, 50)])
            results.append(WholeBodyResult(people, np.array([0.8, 0.7])))
            assert detect_faces(people, pose_enum)[0][2] > 1
            assert detect_hands(people, pose_enum)[0][0][2] > 1

        wb._run_topdown(
            frames, results, wb.face,
            lambda kp: [(r, False) for r in detect_faces(kp, pose_enum)],
            70, "face")

        def hand_rects(kp):
            flat = []
            for left, right in detect_hands(kp, pose_enum):
                flat.append((left, True))
                flat.append((right, False))
            return flat
        wb._run_topdown(frames, results, wb.hand, hand_rects, 21, "hand")

        face_ex = FaceExtractor(face_model, net_size=64,
                                compute_dtype=jnp.float32)
        hand_ex = HandExtractor(hand_model, net_size=64,
                                compute_dtype=jnp.float32)
        for i, res in enumerate(results):
            img = frames[i].astype(np.float32)
            want_face = face_ex.forward(
                img, detect_faces(res.pose_keypoints, pose_enum))
            assert np.any(want_face[..., 2] != 0)
            np.testing.assert_allclose(res.face_keypoints, want_face,
                                       atol=2e-2)
            wl, wr = hand_ex.forward(
                img, detect_hands(res.pose_keypoints, pose_enum))
            assert np.any(wl[..., 2] != 0) and np.any(wr[..., 2] != 0)
            np.testing.assert_allclose(res.hand_left_keypoints, wl,
                                       atol=2e-2)
            np.testing.assert_allclose(res.hand_right_keypoints, wr,
                                       atol=2e-2)

    def test_cascade_end_to_end_smoke(self):
        """Full __call__ on noise frames: shapes consistent, no crash."""
        mesh = _mesh(4)
        pose_model = zoo.load_pose_model(PoseModel.MPI_15_4)
        face_model = zoo.load_face_model()
        hand_model = zoo.load_hand_model()
        frames = self._injected_frames(pose_model, np.random.RandomState(2))
        wb = ShardedWholeBody(
            pose_model, face_model, hand_model, mesh=mesh,
            frame_hw=(96, 128), net_hw=(64, 80), people_cap=2,
            max_peaks=16, face_net_size=64, hand_net_size=64,
            compute_dtype=jnp.float32, nms_threshold=0.05)
        results = wb(frames)
        assert len(results) == 4
        for res in results:
            n = res.pose_keypoints.shape[0]
            assert n <= 2
            if n:
                assert res.face_keypoints.shape == (n, 70, 3)
                assert res.hand_left_keypoints.shape == (n, 21, 3)
                assert res.hand_right_keypoints.shape == (n, 21, 3)

    def test_people_cap_keeps_top_scores(self):
        mesh = _mesh(2)
        pose_model = zoo.load_pose_model(PoseModel.MPI_15_4)
        wb = ShardedWholeBody(
            pose_model, mesh=mesh, frame_hw=(96, 128), net_hw=(64, 80),
            people_cap=1, max_peaks=16, compute_dtype=jnp.float32,
            nms_threshold=0.05)
        frames = self._injected_frames(pose_model, np.random.RandomState(3),
                                       n=2)
        results = wb(frames)
        for res in results:
            assert res.pose_keypoints.shape[0] <= 1
