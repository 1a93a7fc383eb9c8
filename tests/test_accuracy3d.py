"""3D accuracy: synthetic rig -> production triangulation/BA must recover
geometry within tight bounds (reference gates: poseTriangulation.cpp:98-120)."""

import numpy as np
import pytest

from openpose_tpu import accuracy3d


class TestRig:
    def test_projection_roundtrip(self):
        kk, ext = accuracy3d.make_rig(4)
        rng = np.random.RandomState(0)
        gt = accuracy3d.make_people_3d(rng, 2)
        obs = accuracy3d.project(gt, kk, ext)
        assert obs.shape == (2, 25, 4, 2)
        # all people visible in all views of the default rig
        assert (obs[..., 0] > 0).all() and (obs[..., 0] < 1280).all()
        assert (obs[..., 1] > 0).all() and (obs[..., 1] < 720).all()


class TestTriangulationAccuracy:
    def test_exact_at_zero_noise(self):
        r = accuracy3d.triangulation_eval(n_people=4, pixel_noise=0.0)
        assert r["rmse_mm"] < 0.5, r
        assert r["valid_fraction"] == 1.0

    def test_noise_scaling(self):
        r1 = accuracy3d.triangulation_eval(n_people=4, pixel_noise=1.0)
        r4 = accuracy3d.triangulation_eval(n_people=4, pixel_noise=4.0)
        # 1 px pixel noise on a 3 m rig: a few mm RMSE, well under the
        # reference reprojection gate; error grows with noise
        assert r1["rmse_mm"] < 10.0, r1
        assert r1["reprojection_px"] < r1["reference_gate_px"]
        assert r4["rmse_mm"] > r1["rmse_mm"]


class TestBundleAccuracy:
    def test_ba_recovers_cameras_and_points(self):
        r = accuracy3d.bundle_eval(n_people=6, pixel_noise=1.0, seed=1)
        assert r["cam_rot_err_deg_out"] < 0.2 * r["cam_rot_err_deg_in"], r
        assert r["rmse_mm_after_ba"] < 0.7 * r["rmse_mm_before_ba"], r
