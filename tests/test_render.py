"""Render tests: skeleton overlay, heatmap/PAF modes, 3D viewer."""

import numpy as np

from openpose_tpu.params import PoseModel, POSE_MODEL_INFO
from openpose_tpu.render import gui3d, heatmaps, render


def _person_kp():
    kp = np.zeros((1, 25, 3), np.float32)
    pts = {0: (50, 20), 1: (50, 35), 2: (38, 35), 3: (33, 55), 4: (30, 70),
           5: (62, 35), 6: (67, 55), 7: (70, 70), 8: (50, 65)}
    for part, (x, y) in pts.items():
        kp[0, part] = (x, y, 0.9)
    return kp


class TestSkeletonRender:
    def test_draws_on_frame(self):
        frame = np.zeros((100, 100, 3), np.uint8)
        out = render.render_pose(frame, _person_kp(), PoseModel.BODY_25)
        assert out.sum() > 0
        # neck color (BODY_25 part 1 = (255,0,0) RGB -> blue channel in BGR)
        assert out[..., 0].sum() > 0

    def test_empty_keypoints_noop(self):
        frame = np.zeros((50, 50, 3), np.uint8)
        out = render.render_pose(frame, np.zeros((0, 25, 3), np.float32),
                                 PoseModel.BODY_25)
        assert out.sum() == 0

    def test_blend_off_blacks_background(self):
        frame = np.full((64, 64, 3), 200, np.uint8)
        out = render.render_pose(frame, _person_kp(), PoseModel.BODY_25,
                                 blend_original=False)
        # corners (no skeleton) must be black
        assert out[0, 0].sum() == 0

    def test_face_hand_render(self):
        frame = np.zeros((120, 120, 3), np.uint8)
        face = np.zeros((1, 70, 3), np.float32)
        face[0, :, 0] = np.linspace(30, 90, 70)
        face[0, :, 1] = 60 + 10 * np.sin(np.linspace(0, 6, 70))
        face[0, :, 2] = 0.9
        render.render_face(frame, face)
        hands = np.zeros((1, 21, 3), np.float32)
        hands[0, :, 0] = np.linspace(10, 50, 21)
        hands[0, :, 1] = 90 + 5 * np.cos(np.linspace(0, 4, 21))
        hands[0, :, 2] = 0.9
        render.render_hands(frame, hands, hands)
        assert frame.sum() > 0


class TestHeatmapRender:
    def _heat(self):
        info = POSE_MODEL_INFO[PoseModel.BODY_25]
        hm = np.zeros((12, 16, info.heatmap_channels), np.float32)
        hm[4:8, 6:10, 0] = 0.8
        off = info.paf_channel_offset
        hm[..., off + info.map_idx[0]] = 0.5   # PAF x of pair 0
        return hm

    def test_overlay_heatmap(self):
        frame = np.zeros((48, 64, 3), np.uint8)
        out = heatmaps.overlay_heatmap(frame, self._heat(), part=0)
        assert out.shape == frame.shape and out.sum() > 0

    def test_overlay_paf(self):
        frame = np.zeros((48, 64, 3), np.uint8)
        out = heatmaps.overlay_paf(frame, self._heat(), PoseModel.BODY_25,
                                   pair_index=0)
        assert out.sum() > 0
        out_all = heatmaps.overlay_paf(frame, self._heat(),
                                       PoseModel.BODY_25, pair_index=-1)
        assert out_all.sum() > 0

    def test_info_overlay(self):
        frame = np.zeros((80, 200, 3), np.uint8)
        heatmaps.add_info_overlay(frame, fps=12.3, frame_id=7, n_people=2)
        assert frame.sum() > 0


class TestGui3D:
    def test_renders_headless(self, tmp_path):
        kp3d = np.zeros((1, 25, 4), np.float32)
        kp3d[0, :, 0] = np.linspace(-0.2, 0.2, 25)
        kp3d[0, :, 1] = np.linspace(0, 1.0, 25)
        kp3d[0, :, 2] = 2.0
        kp3d[0, :, 3] = 0.9
        out_path = str(tmp_path / "skel.png")
        img = gui3d.render_skeleton_3d(kp3d, PoseModel.BODY_25,
                                       out_path=out_path)
        assert img.ndim == 3 and img.shape[2] == 3
        assert (tmp_path / "skel.png").exists()


class TestAlphaBlending:
    def test_alpha_pose_blends_with_background(self):
        kp = np.zeros((1, 25, 3), np.float32)
        kp[0, :, 0] = np.linspace(20, 100, 25)
        kp[0, :, 1] = np.linspace(20, 100, 25)
        kp[0, :, 2] = 0.9
        base = np.full((128, 128, 3), 255, np.uint8)
        opaque = render.render_pose(base.copy(), kp, PoseModel.BODY_25)
        blended = render.render_pose(base.copy(), kp, PoseModel.BODY_25,
                                     alpha=0.5)
        drawn = (opaque != 255).any(axis=-1)
        assert drawn.any()
        # untouched pixels identical; drawn pixels between color and white
        assert (blended[~drawn] == 255).all()
        assert (blended[drawn].astype(int) >= opaque[drawn].astype(int)).all()
        assert (blended[drawn].astype(int) > opaque[drawn].astype(int)).any()

    def test_disable_blending_black_background(self):
        kp = np.zeros((1, 25, 3), np.float32)
        kp[0, :, 0] = np.linspace(20, 100, 25)
        kp[0, :, 1] = np.linspace(20, 100, 25)
        kp[0, :, 2] = 0.9
        base = np.full((128, 128, 3), 200, np.uint8)
        out = render.render_pose(base, kp, PoseModel.BODY_25,
                                 blend_original=False)
        background = (out == 200).all(axis=-1)
        assert not background.any()     # original pixels gone
        assert out.sum() > 0            # skeleton drawn on black
        assert (out == 0).all(axis=-1).mean() > 0.9  # mostly black canvas


class TestGui3DViewer:
    def test_update_and_frame_headless(self):
        from openpose_tpu.render.gui3d import Gui3D
        from openpose_tpu.params import PoseModel
        g = Gui3D(PoseModel.BODY_25, live=False)
        kp = np.zeros((1, 25, 4), np.float32)
        kp[0, :, 0] = np.linspace(-0.2, 0.2, 25)
        kp[0, :, 1] = np.linspace(-0.8, 0.8, 25)
        kp[0, :, 2] = 2.0
        kp[0, :, 3] = 0.9
        g.update(kp)
        img = g.frame()
        assert img.ndim == 3 and img.shape[2] == 3
        assert img.std() > 0          # something drawn
        # rotation state preserved across updates
        g.ax.view_init(elev=44.0, azim=13.0)
        g.update(kp)
        assert g.ax.elev == 44.0 and round(float(g.ax.azim)) == 13
        g.update(None)                # no 3D data: clears without error
        g.close()
