"""Native video pump + batched sharded inference (runtime.video_runner)."""

import numpy as np
import pytest

from openpose_tpu.io import native_loader


pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason="native library not built")


def _make_video(path, frames=10, wh=(64, 48)):
    import cv2
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, wh)
    rng = np.random.RandomState(0)
    for _ in range(frames):
        w.write(rng.randint(0, 255, (wh[1], wh[0], 3), np.uint8))
    w.release()


class TestNativeVideoPump:
    def test_ordered_frames_and_stride(self, tmp_path):
        path = str(tmp_path / "v.avi")
        _make_video(path, frames=9)
        pump = native_loader.NativeVideoPump(path, net_w=32, net_h=32,
                                             frame_step=2)
        assert pump.fps == 10.0
        assert pump.frame_size == (64, 48)
        seqs = [seq for seq, _f, _n, _s in pump]
        assert seqs == [0, 1, 2, 3, 4]
        pump.close()

    def test_net_input_matches_decoded_frame(self, tmp_path):
        # the pump emits raw uint8 (normalization x/256-0.5 happens
        # on-device, ops.resize.normalize_vgg)
        import cv2
        path = str(tmp_path / "v.avi")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10,
                            (32, 32))
        w.write(np.full((32, 32, 3), 128, np.uint8))
        w.release()
        pump = native_loader.NativeVideoPump(path, net_w=32, net_h=32)
        _, frame, net, scale = pump.next()
        pump.close()
        assert net.dtype == np.uint8
        # MJPG is lossy; compare against the decoded frame, not the input
        np.testing.assert_allclose(net[:32, :32].astype(np.float32),
                                   frame.astype(np.float32), atol=5)


class TestVideoRunner:
    def test_run_video(self, tmp_path):
        import jax
        from openpose_tpu.models import zoo
        from openpose_tpu.parallel.inference import ShardedPoseInference
        from openpose_tpu.parallel import mesh as mesh_lib
        from openpose_tpu.pose.extractor import PoseExtractor
        from openpose_tpu.runtime.video_runner import VideoRunner

        path = str(tmp_path / "v.avi")
        _make_video(path, frames=10)
        model = zoo.load_pose_model()
        mesh = mesh_lib.make_mesh(jax.devices()[:4])
        inference = ShardedPoseInference(model, mesh, net_hw=(48, 48),
                                         compute_dtype=jax.numpy.float32)
        extractor = PoseExtractor(model)
        runner = VideoRunner(inference, extractor, batch_size=4)
        results = runner.run_video(path, frame_step=1)
        assert len(results) == 10
        assert [r.index for r in results] == list(range(10))
        assert all(r.source_wh == (64, 48) for r in results)
