"""Optical flow + person ID tests on synthetic translations."""

import numpy as np

from openpose_tpu.tracking import lk
from openpose_tpu.tracking.person_id import PersonIdExtractor
from openpose_tpu.tracking.tracker import PersonTracker


def _textured(h, w, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.uniform(0, 255, (h // 8 + 4, w // 8 + 4)).astype(np.float32)
    img = np.kron(base, np.ones((8, 8), np.float32))[:h, :w]
    # smooth for differentiability
    k = np.ones((5, 5), np.float32) / 25.0
    from scipy.signal import convolve2d
    return convolve2d(img, k, mode="same", boundary="symm").astype(np.float32)


class TestPyramidalLK:
    def test_translation_recovered(self):
        img = _textured(96, 128)
        dx, dy = 3.0, -2.0
        ys, xs = np.mgrid[0:96, 0:128].astype(np.float32)
        # shift via bilinear resampling: next(x) = prev(x - d)
        from scipy.ndimage import map_coordinates
        nxt = map_coordinates(img, [ys - dy, xs - dx], order=1,
                              mode="nearest").astype(np.float32)
        pts = np.array([[40.0, 40.0], [80.0, 50.0], [64.0, 30.0]], np.float32)
        new_pts, valid = lk.pyramidal_lk(img, nxt, pts)
        new_pts = np.asarray(new_pts)
        assert np.asarray(valid).all()
        np.testing.assert_allclose(new_pts - pts,
                                   np.tile([[dx, dy]], (3, 1)), atol=0.35)

    def test_out_of_frame_invalid(self):
        img = _textured(64, 64)
        pts = np.array([[2.0, 2.0]], np.float32)  # patch leaves the frame
        _, valid = lk.pyramidal_lk(img, img, pts)
        assert not bool(np.asarray(valid)[0])


class TestPersonId:
    def _pose(self, centers):
        kp = np.zeros((len(centers), 5, 3), np.float32)
        for i, (cx, cy) in enumerate(centers):
            for p in range(5):
                kp[i, p] = (cx + 5 * p, cy, 0.9)
        return kp

    def test_stable_ids_across_frames(self):
        img1 = np.dstack([_textured(128, 160)] * 3)
        ex = PersonIdExtractor()
        ids1 = ex.extract_ids(self._pose([(30, 60), (100, 60)]), img1)
        assert sorted(ids1.tolist()) == [0, 1]
        # same frame content, people moved slightly; order swapped
        ids2 = ex.extract_ids(self._pose([(101, 61), (31, 61)]), img1)
        assert ids2.tolist() == [ids1[1], ids1[0]]

    def test_new_person_gets_new_id(self):
        img = np.dstack([_textured(128, 160)] * 3)
        ex = PersonIdExtractor()
        ex.extract_ids(self._pose([(30, 60)]), img)
        ids = ex.extract_ids(self._pose([(30, 60), (120, 90)]), img)
        assert ids[0] == 0 and ids[1] == 1


class TestPersonTracker:
    def test_track_moves_keypoints(self):
        prev = np.dstack([_textured(96, 128)] * 3)
        from scipy.ndimage import shift as ndshift
        nxt = np.dstack([ndshift(prev[..., 0], (0, 4), order=1,
                                 mode="nearest")] * 3)
        kp = np.zeros((1, 3, 3), np.float32)
        kp[0, :, 0] = (40, 60, 80)
        kp[0, :, 1] = 48
        kp[0, :, 2] = 0.9
        tr = PersonTracker()
        tr.observe(kp, prev)
        out = tr.track(nxt)
        np.testing.assert_allclose(out[0, :, 0] - kp[0, :, 0], 4.0, atol=0.5)
        np.testing.assert_allclose(out[0, :, 1], 48.0, atol=0.5)


class TestKeyframeSmoother:
    """Streaming pose-graph smoother (--smooth_keyframes user path)."""

    @staticmethod
    def _linear_tracks(t_total, n_people, parts=25, noise=0.0, seed=0):
        rng = np.random.RandomState(seed)
        true = np.zeros((t_total, n_people, parts, 3), np.float32)
        for t in range(t_total):
            for p in range(n_people):
                true[t, p, :, 0] = 100 + 250 * p + 5 * t + np.arange(parts)
                true[t, p, :, 1] = 80 + 3 * t + 2 * np.arange(parts)
                true[t, p, :, 2] = 1.0
        noisy = true.copy()
        noisy[..., :2] += rng.normal(0, noise, noisy[..., :2].shape)
        return true, noisy

    def test_ordered_complete_emission(self):
        from openpose_tpu.tracking.pose_graph import KeyframeSmoother
        sm = KeyframeSmoother(window=7)
        _, noisy = self._linear_tracks(10, 1, noise=2.0)
        got = []
        for t in range(10):
            got += sm.push(t, noisy[t], np.array([0.9]))
        got += sm.flush()
        assert [g[0] for g in got] == list(range(10))

    def test_denoises_trajectories(self):
        from openpose_tpu.tracking.pose_graph import KeyframeSmoother
        true, noisy = self._linear_tracks(14, 2, noise=3.0, seed=1)
        sm = KeyframeSmoother(window=9)
        got = []
        for t in range(14):
            got += sm.push(t, noisy[t], np.array([0.9, 0.9]))
        got += sm.flush()
        err_raw, err_sm = [], []
        for t, kp, _sc in got:
            order = np.argsort(kp[:, 0, 0])
            err_sm.append(np.abs(kp[order][..., :2]
                                 - true[t][..., :2]).mean())
            err_raw.append(np.abs(noisy[t][..., :2]
                                  - true[t][..., :2]).mean())
        assert np.mean(err_sm) < 0.75 * np.mean(err_raw)

    def test_inpaints_missing_detection(self):
        from openpose_tpu.tracking.pose_graph import KeyframeSmoother
        true, noisy = self._linear_tracks(12, 2, noise=1.0, seed=2)
        sm = KeyframeSmoother(window=7)
        got = []
        for t in range(12):
            det = noisy[t][:1] if t == 6 else noisy[t]   # person 2 drops out
            got += sm.push(t, det, np.full(det.shape[0], 0.9))
        got += sm.flush()
        f6 = next(g for g in got if g[0] == 6)
        assert f6[1].shape[0] == 2        # inpainted back
        p2 = f6[1][np.argsort(f6[1][:, 0, 0])][1]
        assert np.abs(p2[:, :2] - true[6, 1, :, :2]).mean() < 4.0
        # the inpainted person's emitted score is 0 (no real detection)
        assert f6[2][np.argsort(f6[1][:, 0, 0])][1] == 0.0
