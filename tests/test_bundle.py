"""Bundle adjustment + pose-graph smoothing tests."""

import numpy as np
import pytest

import jax

from openpose_tpu.threed import bundle_adjustment as ba
from openpose_tpu.tracking import pose_graph


def _scene(n_points=16, n_cams=4, noise=0.0, cam_err=0.0, seed=0):
    rng = np.random.RandomState(seed)
    k = np.tile(np.array([[700.0, 0, 320], [0, 700.0, 240], [0, 0, 1]]),
                (n_cams, 1, 1))
    ext_true = []
    for i in range(n_cams):
        angle = (i - (n_cams - 1) / 2) * 0.3
        c = np.array([3 * np.sin(angle), 0.0, -3 * np.cos(angle)])
        z = -c / np.linalg.norm(c)
        x = np.cross([0, 1, 0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        r = np.stack([x, y, z])
        ext_true.append(np.hstack([r, (-r @ c)[:, None]]))
    ext_true = np.stack(ext_true)
    pts = rng.uniform(-0.4, 0.4, (n_points, 3))
    homog = np.concatenate([pts, np.ones((n_points, 1))], axis=1)
    cams = np.einsum("vij,vjk->vik", k, ext_true)
    proj = np.einsum("vij,nj->nvi", cams, homog)
    obs = proj[..., :2] / proj[..., 2:3]
    obs += rng.normal(0, noise, obs.shape)
    # perturbed initial extrinsics (except cam 0, the gauge)
    ext0 = ext_true.copy()
    for i in range(1, n_cams):
        ext0[i, :, 3] += rng.normal(0, cam_err, 3)
    return pts, obs, k, ext_true, ext0


class TestBundleAdjustment:
    def test_refines_perturbed_cameras(self):
        pts, obs, k, ext_true, ext0 = _scene(cam_err=0.05)
        pts0 = pts + np.random.RandomState(1).normal(0, 0.05, pts.shape)
        mask = np.ones(obs.shape[:2], np.float32)
        pts_ref, ext_ref = ba.bundle_adjust(
            pts0, obs, mask, k, ext0, iterations=12)
        # reprojection error after refinement
        homog = np.concatenate([pts_ref, np.ones((len(pts_ref), 1))], 1)
        cams = np.einsum("vij,vjk->vik", k, ext_ref)
        proj = np.einsum("vij,nj->nvi", cams, homog)
        err = np.linalg.norm(proj[..., :2] / proj[..., 2:3] - obs, axis=-1)
        assert err.mean() < 0.1, err.mean()

    def test_sharded_matches_single(self):
        devices = jax.devices()
        if len(devices) < 2:
            pytest.skip("needs multiple devices")
        from openpose_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.make_mesh(devices[:4], model=1)
        pts, obs, k, ext_true, ext0 = _scene(n_points=16, cam_err=0.03)
        pts0 = pts + 0.02
        mask = np.ones(obs.shape[:2], np.float32)
        p1, e1 = ba.bundle_adjust(pts0, obs, mask, k, ext0, iterations=5)
        p2, e2 = ba.bundle_adjust(pts0, obs, mask, k, ext0, iterations=5,
                                  mesh=mesh)
        np.testing.assert_allclose(p1, p2, atol=1e-3)
        np.testing.assert_allclose(e1, e2, atol=1e-3)


class TestPoseGraph:
    def test_inpaints_missing_frames(self):
        t = 12
        kp = np.zeros((t, 1, 2, 3), np.float32)
        for i in range(t):
            kp[i, 0, :, 0] = 10.0 + 2.0 * i   # constant velocity in x
            kp[i, 0, :, 1] = 5.0
            kp[i, 0, :, 2] = 1.0
        # knock out observations in the middle
        kp[5, 0, :, 2] = 0.0
        kp[5, 0, :, 0] = 999.0  # garbage that must be ignored
        out = pose_graph.smooth_window(kp)
        np.testing.assert_allclose(out[5, 0, :, 0], 10.0 + 2.0 * 5, atol=0.3)
        np.testing.assert_allclose(out[:, 0, :, 1], 5.0, atol=0.2)

    def test_denoises(self):
        rng = np.random.RandomState(0)
        t = 30
        kp = np.zeros((t, 1, 1, 3), np.float32)
        truth = 50 + 3 * np.arange(t)
        kp[:, 0, 0, 0] = truth + rng.normal(0, 2.0, t)
        kp[:, 0, 0, 2] = 1.0
        out = pose_graph.smooth_window(kp, smoothness=8.0)
        raw_err = np.abs(kp[:, 0, 0, 0] - truth).mean()
        smooth_err = np.abs(out[:, 0, 0, 0] - truth).mean()
        assert smooth_err < raw_err
