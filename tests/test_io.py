"""IO tests: producers, savers, JSON formats, COCO eval, async pipeline."""

import json

import numpy as np
import pytest

from openpose_tpu.io import coco_eval, json_io, savers
from openpose_tpu.io.producers import (ImageDirectoryReader, ProducerConfig,
                                       VideoReader, create_producer)
from openpose_tpu.runtime.pipeline import AsyncPipeline


@pytest.fixture
def image_dir(tmp_path):
    import cv2
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(5):
        img = np.full((40, 60, 3), i * 40, np.uint8)
        cv2.imwrite(str(d / f"frame_{i:03d}.png"), img)
    return str(d)


class TestProducers:
    def test_image_directory_windowing(self, image_dir):
        p = ImageDirectoryReader(image_dir, ProducerConfig(
            frame_first=1, frame_step=2, frame_last=4))
        frames = list(p.frames())
        assert len(frames) == 2  # raw 1, 3
        assert frames[0][0].name == "frame_001"
        assert frames[1][0].name == "frame_003"
        assert frames[0][0].frame_id == 0

    def test_multi_view_split(self, image_dir):
        p = ImageDirectoryReader(image_dir, ProducerConfig(num_views=2))
        views = next(iter(p.frames()))
        assert len(views) == 2
        assert views[0].sub_id == 0 and views[1].sub_id == 1
        assert views[0].image.shape == (40, 30, 3)

    def test_factory(self, image_dir):
        p = create_producer(image_dir=image_dir)
        assert isinstance(p, ImageDirectoryReader)
        with pytest.raises(ValueError):
            create_producer()

    def test_video_roundtrip(self, tmp_path, image_dir):
        import cv2
        path = str(tmp_path / "test.avi")
        vs = savers.VideoSaver(path, fps=10)
        for i in range(4):
            vs.write(np.full((32, 48, 3), i * 50, np.uint8))
        vs.close()
        reader = VideoReader(path)
        frames = list(reader.frames())
        assert len(frames) == 4
        assert frames[0][0].image.shape == (32, 48, 3)


class TestSavers:
    def test_keypoint_saver_json(self, tmp_path):
        ks = savers.KeypointSaver(str(tmp_path))
        arr = np.arange(12, dtype=np.float32).reshape(1, 4, 3)
        path = ks.save([arr], "frame0")
        data = json.loads(open(path).read())
        assert data["pose_0"]["sizes"] == [1, 4, 3]
        assert data["pose_0"]["data"][:3] == [0.0, 1.0, 2.0]

    def test_heatmap_float_roundtrip(self, tmp_path):
        hs = savers.HeatMapSaver(str(tmp_path))
        hm = np.random.RandomState(0).randn(6, 8, 3).astype(np.float32)
        path = hs.save(hm, "f0")
        back = savers.load_float_heatmaps(path)
        np.testing.assert_allclose(back, hm)


class TestCocoJson:
    def test_record_order_and_fill(self):
        saver = json_io.CocoJsonSaver()
        kp = np.zeros((1, 25, 3), np.float32)
        kp[0, 0] = (10, 20, 0.9)    # nose
        kp[0, 16] = (30, 40, 0.8)   # leye -> coco index 1
        saver.record(kp, np.array([0.7]), image_id=42)
        e = saver.entries[json_io.VARIANT_BODY][0]
        assert e["image_id"] == 42
        assert e["keypoints"][0:3] == [10.0, 20.0, 1]
        assert e["keypoints"][3:6] == [30.0, 40.0, 1]
        assert e["keypoints"][6:9] == [-1.0, -1.0, 0]
        assert e["score"] == pytest.approx(0.7)

    def test_image_id_from_name(self):
        assert json_io.image_id_from_name(
            "COCO_val2014_000000000192") == 192

    def test_variants_bitmask_streams(self, tmp_path):
        # variants<1 -> all five streams (cocoJsonSaver.cpp:46-70)
        saver = json_io.CocoJsonSaver(variants=0)
        kp = np.zeros((1, 25, 3), np.float32)
        kp[0, 0] = (10, 20, 0.9)
        kp[0, 19] = (5, 6, 0.5)       # LBigToe -> first foot keypoint
        kp[0, 4] = (100, 100, 0.9)    # RWrist
        kp[0, 7] = (200, 200, 0.9)    # LWrist
        face = np.random.RandomState(0).rand(1, 70, 3).astype(np.float32)
        hl = np.random.RandomState(1).rand(1, 21, 3).astype(np.float32)
        hr = np.random.RandomState(2).rand(1, 21, 3).astype(np.float32)
        saver.record(kp, np.array([0.7]), 7, face_keypoints=face,
                     hand_left_keypoints=hl, hand_right_keypoints=hr)
        # per-variant keypoint counts (17 body, 6 foot, 68 face, 21/42 hand)
        assert len(saver.entries[json_io.VARIANT_BODY][0]["keypoints"]) == 51
        foot = saver.entries[json_io.VARIANT_FOOT][0]["keypoints"]
        assert len(foot) == 18 and foot[0:3] == [5.0, 6.0, 1]
        assert len(saver.entries[json_io.VARIANT_FACE][0]["keypoints"]) == 204
        h21 = saver.entries[json_io.VARIANT_HAND21][0]["keypoints"]
        assert len(h21) == 63
        # hand21 point 0 is the body RWrist, not the hand-net wrist
        assert h21[0:2] == [100.0, 100.0]
        h42 = saver.entries[json_io.VARIANT_HAND42][0]["keypoints"]
        assert len(h42) == 126 and h42[0:2] == [200.0, 200.0]
        saver.save(str(tmp_path / "out.json"))
        assert sorted(p.name for p in tmp_path.iterdir()) == [
            "out.json", "out_face.json", "out_foot.json",
            "out_hand21.json", "out_hand42.json"]

    def test_variants_face_only_without_face_data(self, tmp_path):
        saver = json_io.CocoJsonSaver(variants=json_io.VARIANT_FACE)
        kp = np.zeros((1, 25, 3), np.float32)
        kp[0, 0] = (10, 20, 0.9)
        saver.record(kp, np.array([0.7]), 7)     # no face -> no entry
        assert saver.entries[json_io.VARIANT_FACE] == []
        saver.save(str(tmp_path / "o.json"))
        assert (tmp_path / "o_face.json").exists()

    def test_variants_reject_unknown_bits(self):
        with pytest.raises(ValueError):
            json_io.CocoJsonSaver(variants=32)

    def test_foot_variant_always_suffixed(self, tmp_path):
        # --write_coco_json_variants 2 writes <stem>_foot.<ext>, matching the
        # reference (cocoJsonSaver.cpp ctor appends "_foot" unconditionally);
        # only the legacy internal foot=True mode writes at the bare path.
        kp = np.zeros((1, 25, 3), np.float32)
        kp[0, 19] = (5, 6, 0.5)
        saver = json_io.CocoJsonSaver(variants=json_io.VARIANT_FOOT)
        saver.record(kp, np.array([0.7]), 3)
        saver.save(str(tmp_path / "v.json"))
        assert (tmp_path / "v_foot.json").exists()
        assert not (tmp_path / "v.json").exists()
        legacy = json_io.CocoJsonSaver(foot=True)
        legacy.record(kp, np.array([0.7]), 3)
        legacy.save(str(tmp_path / "l.json"))
        assert (tmp_path / "l.json").exists()
        assert not (tmp_path / "l_foot.json").exists()

    def test_face_hand_streams_use_frame_number(self):
        # Reference: imageId = frameNumber except Body/Foot/Car, which parse
        # the filename (cocoJsonSaver.cpp getLastNumberWithErrorMessage).
        saver = json_io.CocoJsonSaver(variants=0)
        kp = np.zeros((1, 25, 3), np.float32)
        kp[0, 0] = (10, 20, 0.9)
        kp[0, 19] = (5, 6, 0.5)
        kp[0, 4] = (100, 100, 0.9)
        kp[0, 7] = (200, 200, 0.9)
        face = np.random.RandomState(0).rand(1, 70, 3).astype(np.float32)
        hl = np.random.RandomState(1).rand(1, 21, 3).astype(np.float32)
        hr = np.random.RandomState(2).rand(1, 21, 3).astype(np.float32)
        saver.record(kp, np.array([0.7]), image_id=192, face_keypoints=face,
                     hand_left_keypoints=hl, hand_right_keypoints=hr,
                     frame_number=7)
        assert saver.entries[json_io.VARIANT_BODY][0]["image_id"] == 192
        assert saver.entries[json_io.VARIANT_FOOT][0]["image_id"] == 192
        assert saver.entries[json_io.VARIANT_FACE][0]["image_id"] == 7
        assert saver.entries[json_io.VARIANT_HAND21][0]["image_id"] == 7
        assert saver.entries[json_io.VARIANT_HAND42][0]["image_id"] == 7

    def test_foot_variant_on_footless_model_raises(self):
        saver = json_io.CocoJsonSaver(variants=json_io.VARIANT_FOOT)
        kp = np.zeros((1, 18, 3), np.float32)   # COCO_18: no foot keypoints
        kp[0, 0] = (10, 20, 0.9)
        with pytest.raises(ValueError, match="foot"):
            saver.record(kp, np.array([0.7]), 3)


class TestCocoEval:
    def _gt(self, image_id, xy, area=10000.0):
        kp = []
        for x, y in xy:
            kp += [x, y, 2]
        return {"image_id": image_id, "keypoints": kp, "area": area,
                "num_keypoints": len(xy)}

    def _det(self, image_id, xy, score):
        kp = []
        for x, y in xy:
            kp += [x, y, 1]
        return {"image_id": image_id, "keypoints": kp, "score": score}

    def test_perfect_detection_ap1(self):
        xy = [(50 + 10 * i, 60 + 5 * i) for i in range(17)]
        res = coco_eval.evaluate([self._det(1, xy, 0.9)], [self._gt(1, xy)])
        assert res["AP"] == pytest.approx(1.0)
        assert res["AR"] == pytest.approx(1.0)

    def test_miss_halves_recall(self):
        xy = [(50 + 10 * i, 60 + 5 * i) for i in range(17)]
        far = [(500 + x, 400 + y) for x, y in xy]
        res = coco_eval.evaluate(
            [self._det(1, xy, 0.9)],
            [self._gt(1, xy), self._gt(1, far)])
        assert res["AR"] == pytest.approx(0.5)
        assert 0.4 < res["AP"] <= 0.51

    def test_false_positive_lowers_ap(self):
        xy = [(50 + 10 * i, 60 + 5 * i) for i in range(17)]
        junk = [(x + 300, y) for x, y in xy]
        res = coco_eval.evaluate(
            [self._det(1, xy, 0.5), self._det(1, junk, 0.9)],
            [self._gt(1, xy)])
        assert res["AP"] < 1.0


class TestAsyncPipeline:
    def test_order_preserved_and_overlap(self):
        import time
        out = []
        def process(x):
            time.sleep(0.002)
            return x * 2
        pipe = AsyncPipeline(range(50), process, out.append,
                             in_flight=4)
        stats = pipe.run()
        assert out == [x * 2 for x in range(50)]
        assert stats.frames == 50

    def test_error_propagates(self):
        def bad_producer():
            yield 1
            raise RuntimeError("boom")
        pipe = AsyncPipeline(bad_producer(), lambda x: x, lambda x: None)
        with pytest.raises(RuntimeError, match="boom"):
            pipe.run()

    def test_consumer_error_no_deadlock(self):
        """A dying writer must not deadlock the main loop on a full out
        queue: the writer drains (discarding) until the sentinel and the
        error is re-raised promptly."""
        def bad_consumer(x):
            raise ValueError("sink failed")
        pipe = AsyncPipeline(range(500), lambda x: x, bad_consumer,
                             queue_size=2, in_flight=1)
        with pytest.raises(ValueError, match="sink failed"):
            pipe.run()

    def test_producer_unblocked_on_error(self):
        """A reader blocked on a full in-queue is drained on the error
        path, not abandoned mid-put."""
        produced = []

        def producer():
            for i in range(100):
                produced.append(i)
                yield i

        calls = []

        def process(x):
            calls.append(x)
            if len(calls) == 3:
                raise RuntimeError("device died")
            return x

        pipe = AsyncPipeline(producer(), process, lambda x: None,
                             queue_size=2, in_flight=1)
        with pytest.raises(RuntimeError, match="device died"):
            pipe.run()


class TestProducerParityFlags:
    def test_frames_repeat_loops_with_monotonic_ids(self, image_dir):
        p = ImageDirectoryReader(image_dir, ProducerConfig(
            frames_repeat=True))
        got = []
        for views in p.frames():
            got.append(views[0].frame_id)
            if len(got) >= 12:
                break
        assert got == list(range(12))  # 5 images looped 2.4x, ids monotonic

    def test_flir_camera_unsupported(self):
        with pytest.raises(NotImplementedError, match="Spinnaker"):
            create_producer(flir_camera=True)


class TestModelFolder:
    def test_resolution_order(self, tmp_path):
        from openpose_tpu.models import zoo
        from openpose_tpu.params import PoseModel
        rel = zoo.CAFFEMODEL_PATHS[PoseModel.BODY_25]
        (tmp_path / rel).parent.mkdir(parents=True)
        (tmp_path / rel).write_bytes(b"")
        # explicit path wins over model_folder
        assert zoo.resolve_caffemodel("/x.caffemodel", str(tmp_path), rel) \
            == "/x.caffemodel"
        got = zoo.resolve_caffemodel(None, str(tmp_path), rel)
        assert got == str(tmp_path / rel)
        # missing folder entry -> random-init (None)
        assert zoo.resolve_caffemodel(None, str(tmp_path / "no"), rel) is None


class TestWebcamBuffering:
    def test_side_thread_yields_fresh_frames(self, monkeypatch):
        import itertools
        import openpose_tpu.io.producers as prod

        counter = itertools.count()

        class FakeCapture:
            def __init__(self, index):
                self.opened = True
            def isOpened(self):
                return True
            def set(self, *a):
                pass
            def read(self):
                import time
                time.sleep(0.005)        # ~200 fps fake camera pacing
                i = next(counter)
                if i >= 200:
                    return False, None
                return True, np.full((4, 4, 3), i % 256, np.uint8)
            def release(self):
                pass

        monkeypatch.setattr(prod.cv2, "VideoCapture", FakeCapture)
        cam = prod.WebcamReader(0)
        got = []
        for views in cam.frames():
            got.append(int(views[0].image[0, 0, 0]))
            if len(got) >= 5:
                break
        cam.close()
        assert len(got) == 5
        # freshest-frame semantics: values strictly increase (no stale
        # frames), but may skip ahead while the consumer is busy
        assert all(b > a for a, b in zip(got, got[1:])), got


class TestProducerSeek:
    """Bidirectional seek (reference gui.cpp spVideoSeek): request_seek jumps
    the read position at the next frame fetch."""

    def test_image_dir_seek_back_and_forth(self, image_dir):
        p = ImageDirectoryReader(image_dir)
        it = p.frames()
        assert next(it)[0].name == "frame_000"
        assert p.request_seek(2)            # skip 001, 002
        assert next(it)[0].name == "frame_003"
        assert p.request_seek(-3)           # back to 001
        assert next(it)[0].name == "frame_001"

    def test_image_dir_seek_clamps(self, image_dir):
        p = ImageDirectoryReader(image_dir)
        it = p.frames()
        next(it)
        p.request_seek(-100)
        assert next(it)[0].name == "frame_000"
        p.request_seek(100)
        assert next(it)[0].name == "frame_004"

    def test_video_seek(self, tmp_path, image_dir):
        import cv2
        vid = str(tmp_path / "v.avi")
        w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"), 10,
                            (60, 40))
        for i in range(8):
            w.write(np.full((40, 60, 3), i * 30, np.uint8))
        w.release()
        p = VideoReader(vid)
        assert p.seekable
        it = p.frames()
        f0 = next(it)[0]
        assert p.request_seek(3)
        f4 = next(it)[0]
        # frame 0 then frame 4 (pixel value 4*30=120 vs 0)
        assert int(f4.image.mean()) > int(f0.image.mean()) + 60
        assert p.request_seek(-4)
        f1 = next(it)[0]
        assert int(f1.image.mean()) < int(f4.image.mean())

    def test_stream_not_seekable(self, monkeypatch):
        from openpose_tpu.io.producers import IpCameraReader
        assert IpCameraReader.seekable is False
