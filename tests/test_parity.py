"""Strongest accuracy-parity proxies available without trained weights:

1. Spec parity: parse the reference's deploy prototxts (mounted read-only at
   /root/reference, or $OPENPOSE_REFERENCE_MODELS) with models/caffe_proto.py
   and assert the bundled JSON specs reproduce every layer — name, type,
   topology, and conv geometry.  This pins the executed graph to the
   reference's 261-layer BODY_25 (and the other five) exactly.

2. Golden full-pipeline test: compose the per-op NumPy oracles
   (tests/oracle.py — transliterations of the reference CPU/CUDA kernels)
   into an end-to-end chain (cubic resize -> NMS -> PAF line integrals ->
   greedy assembly) and assert the device pipeline (f32) reproduces the final
   keypoints to <= 1e-3 px.  Per-op tests cannot catch interface-seam bugs
   (scale factors, offsets, channel offsets); this does.
"""

import json
import os
import pathlib

import numpy as np
import jax.numpy as jnp
import pytest

from openpose_tpu.models import zoo
from openpose_tpu.models.caffe_proto import parse_prototxt
from openpose_tpu.ops import assembly, paf
from openpose_tpu.params import PoseModel, default_connect_params
from openpose_tpu.pose.extractor import PoseExtractor

from tests import oracle

_REF_MODELS = pathlib.Path(
    os.environ.get("OPENPOSE_REFERENCE_MODELS", "/root/reference/models"))
_SPEC_DIR = pathlib.Path(__file__).resolve().parents[1] \
    / "openpose_tpu/models/specs"

# spec name -> (reference prototxt, expected layer count)
_SPEC_SOURCES = {
    "body_25": "pose/body_25/pose_deploy.prototxt",
    "coco_18": "pose/coco/pose_deploy_linevec.prototxt",
    "mpi_15": "pose/mpi/pose_deploy_linevec.prototxt",
    "mpi_15_4": "pose/mpi/pose_deploy_linevec_faster_4_stages.prototxt",
    "face_70": "face/pose_deploy.prototxt",
    "hand_21": "hand/pose_deploy.prototxt",
}


@pytest.mark.skipif(not _REF_MODELS.exists(),
                    reason="reference models directory not mounted")
class TestSpecParity:
    @pytest.mark.parametrize("spec_name", sorted(_SPEC_SOURCES))
    def test_bundled_spec_matches_reference_prototxt(self, spec_name):
        ref = parse_prototxt(
            (_REF_MODELS / _SPEC_SOURCES[spec_name]).read_text())
        bundled = json.loads((_SPEC_DIR / f"{spec_name}.json").read_text())
        blayers = bundled["layers"]
        assert len(blayers) == len(ref.layers), \
            f"{spec_name}: {len(blayers)} bundled vs {len(ref.layers)} " \
            "reference layers"
        assert bundled["input_channels"] == ref.input_channels
        for got, want in zip(blayers, ref.layers):
            assert got["name"] == want.name
            assert got["type"] == want.type
            assert got["bottoms"] == want.bottoms
            assert got["tops"] == want.tops
            if want.type == "Convolution":
                assert got["num_output"] == want.num_output, want.name
                assert got["kernel"] == want.kernel, want.name
                assert got["stride"] == want.stride, want.name
                assert got["pad"] == want.pad, want.name

    def test_body_25_has_261_layers(self):
        ref = parse_prototxt(
            (_REF_MODELS / _SPEC_SOURCES["body_25"]).read_text())
        assert len(ref.layers) == 261


class TestGoldenPipeline:
    """Device pipeline vs composed NumPy-oracle chain, end to end."""

    def _make_case(self):
        model = zoo.load_pose_model(PoseModel.MPI_15_4)
        info = model.info
        h = w = 128         # image == net resolution -> scale 1, offset 0.5
        rng = np.random.RandomState(3)
        people = 2
        kp = np.zeros((1, people, info.num_parts, 3), np.float32)
        for p in range(people):
            kp[0, p, :, 0] = 32 + 64 * p + rng.uniform(-22, 22, info.num_parts)
            kp[0, p, :, 1] = 64 + rng.uniform(-28, 28, info.num_parts)
            kp[0, p, :, 2] = 1.0
        from openpose_tpu import train
        pairs, map_idx = paf.pair_tables(info)
        # stride-8 low-res net output (16x16), keypoints in input pixels
        net_output = np.asarray(train.make_targets(
            jnp.asarray(kp), jnp.asarray(pairs), jnp.asarray(map_idx),
            (h, w), info.num_parts, info.heatmap_channels),
            np.float32)[0]
        # smooth low-amplitude perturbation so peaks sit off-grid and no two
        # candidate scores tie exactly
        net_output = net_output + \
            rng.uniform(-1e-3, 1e-3, net_output.shape).astype(np.float32)
        return model, info, (h, w), net_output, pairs, map_idx

    def test_device_matches_oracle_chain(self):
        model, info, (h, w), net_output, pairs, map_idx = self._make_case()
        cp = default_connect_params(PoseModel.MPI_15_4, False)
        max_peaks = 16

        # ---- device pipeline ----
        extractor = PoseExtractor(model, max_peaks=max_peaks,
                                  compute_dtype=jnp.float32)
        image = np.zeros((h, w, 3), np.float32)
        pred = extractor.forward(image, net_resolution=(w, h),
                                 net_output=net_output)

        # ---- oracle chain (pure NumPy, loop transliterations) ----
        # 1. cubic upsample of every channel to net resolution
        full = np.stack([oracle.cubic_resize_oracle(net_output[..., c], h, w)
                         for c in range(net_output.shape[-1])], axis=-1)
        # 2. NMS peaks per part channel (+0.5 half-pixel offset: scale 1)
        peaks = np.stack([oracle.nms_oracle(full[..., p], cp.nms_threshold,
                                            max_peaks)
                          for p in range(info.num_parts)])
        # 3. PAF line-integral score for every candidate pair
        n_pairs = pairs.shape[0]
        scores = np.full((n_pairs, max_peaks, max_peaks), -1.0, np.float32)
        for pi in range(n_pairs):
            pa, pb = int(pairs[pi, 0]), int(pairs[pi, 1])
            mx = full[..., int(map_idx[pi, 0])]
            my = full[..., int(map_idx[pi, 1])]
            na = int(peaks[pa, 0, 0])
            nb = int(peaks[pb, 0, 0])
            for i in range(na):
                for j in range(nb):
                    scores[pi, i, j] = oracle.paf_score_oracle(
                        peaks[pa, i + 1, 0], peaks[pa, i + 1, 1],
                        peaks[pb, j + 1, 0], peaks[pb, j + 1, 1],
                        mx, my, cp.inter_threshold,
                        cp.inter_min_above_threshold, cp.nms_threshold)
        # 4. the production greedy assembly on the oracle tensors
        kp_oracle, sc_oracle = assembly.connect_body_parts(
            scores, peaks, pairs, info.num_parts, cp.min_subset_cnt,
            cp.min_subset_score, 1.0, False)

        # ---- end-to-end comparison ----
        assert pred.keypoints.shape == kp_oracle.shape, \
            (pred.keypoints.shape, kp_oracle.shape)
        assert kp_oracle.shape[0] >= 2          # both people recovered
        np.testing.assert_allclose(pred.keypoints, kp_oracle, atol=1e-3)
        np.testing.assert_allclose(pred.scores, sc_oracle, atol=1e-4)

    def test_half_pixel_regression_guard(self):
        """A deliberate 0.5 px peak shift must fail the 1e-3 comparison —
        proves the golden test has the sensitivity test_injection lacks."""
        model, info, (h, w), net_output, pairs, map_idx = self._make_case()
        extractor = PoseExtractor(model, max_peaks=16,
                                  compute_dtype=jnp.float32)
        image = np.zeros((h, w, 3), np.float32)
        pred = extractor.forward(image, net_resolution=(w, h),
                                 net_output=net_output)
        shifted = pred.keypoints.copy()
        shifted[..., 0] += np.where(shifted[..., 2] > 0, 0.5, 0.0)
        with pytest.raises(AssertionError):
            np.testing.assert_allclose(shifted, pred.keypoints, atol=1e-3)
