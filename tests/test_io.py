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


class TestCocoEvalGolden:
    """Anchor coco_eval to pycocotools semantics: hand-derived fixture
    values (expected metrics computed by hand from the published COCO
    protocol, derivations in comments) + randomized agreement with the
    line-faithful transcription oracle in tests/coco_oracle.py."""

    @staticmethod
    def _gt(image_id, xy, area=10000.0, **kw):
        kp = []
        for x, y in xy:
            kp += [x, y, 2]
        d = {"image_id": image_id, "keypoints": kp, "area": area,
             "num_keypoints": len(xy)}
        d.update(kw)
        return d

    @staticmethod
    def _det(image_id, xy, score):
        kp = []
        for x, y in xy:
            kp += [x, y, 1]
        return {"image_id": image_id, "keypoints": kp, "score": score}

    XY = [(50.0 + 10 * i, 60.0 + 5 * i) for i in range(17)]
    FAR = [(x + 500, y + 400) for x, y in XY]

    def test_single_tp_one_missed_gt(self):
        # 1 TP det, 2 gts: rc=[0.5], pr=[1].  101-pt interpolation:
        # searchsorted-left gives p=1 for the 51 recall points <= 0.5 and 0
        # beyond -> AP = 51/101 per threshold.  AR = 0.5.
        res = coco_eval.evaluate([self._det(1, self.XY, 0.9)],
                                 [self._gt(1, self.XY), self._gt(1, self.FAR)])
        assert res["AP"] == pytest.approx(51 / 101, abs=1e-9)
        assert res["AR"] == pytest.approx(0.5)

    def test_fp_above_tp(self):
        # Single gt; dets sorted: FP(0.9) then TP(0.5): rc=[0,1], pr=[0,0.5];
        # envelope [0.5,0.5]; searchsorted-left puts every recall point at
        # precision 0.5 -> AP = 0.5 exactly.
        junk = [(x + 300.0, y) for x, y in self.XY]
        res = coco_eval.evaluate(
            [self._det(1, self.XY, 0.5), self._det(1, junk, 0.9)],
            [self._gt(1, self.XY)])
        assert res["AP"] == pytest.approx(0.5, abs=1e-9)
        assert res["AR"] == pytest.approx(1.0)

    def test_double_detection_is_fp(self):
        # imgA: TP(0.9) + double-det FP(0.8) on the same gt; imgB: TP(0.7).
        # Global: tp=[1,0,1], fp=[0,1,0] -> rc=[.5,.5,1], pr=[1,.5,2/3];
        # envelope [1,2/3,2/3] -> AP = (51*1 + 50*2/3)/101.
        near = [(x + 1.0, y) for x, y in self.XY]
        res = coco_eval.evaluate(
            [self._det(1, self.XY, 0.9), self._det(1, near, 0.8),
             self._det(2, self.XY, 0.7)],
            [self._gt(1, self.XY), self._gt(2, self.XY)])
        assert res["AP"] == pytest.approx((51 + 50 * 2 / 3) / 101, abs=1e-9)
        assert res["AR"] == pytest.approx(1.0)

    def test_crowd_region_ignores_detection(self):
        # A det inside a crowd gt's expanded bbox is IGNORED (not FP):
        # pycocotools matches crowds via the box-fallback OKS and marks the
        # det ignored.  AP must stay 1.0.  (The pre-fix evaluator skipped
        # crowds entirely -> counted this det as FP -> AP 0.252.)
        crowd_kp = [0.0, 0.0, 0] * 17
        crowd = {"image_id": 1, "keypoints": crowd_kp, "area": 40000.0,
                 "iscrowd": 1, "num_keypoints": 0,
                 "bbox": [300.0, 300.0, 100.0, 100.0]}
        inside = [(320.0 + i, 320.0 + i) for i in range(17)]
        res = coco_eval.evaluate(
            [self._det(1, self.XY, 0.5), self._det(1, inside, 0.9)],
            [self._gt(1, self.XY), crowd])
        assert res["AP"] == pytest.approx(1.0)
        assert res["AR"] == pytest.approx(1.0)

    def test_zero_keypoint_gt_is_ignore_region(self):
        # num_keypoints=0 non-crowd gt: not counted in recall denominator,
        # and a det matching it (box fallback) is ignored, not FP.
        empty = {"image_id": 1, "keypoints": [0.0, 0.0, 0] * 17,
                 "area": 2500.0, "num_keypoints": 0,
                 "bbox": [600.0, 600.0, 50.0, 50.0]}
        on_empty = [(610.0 + i, 610.0) for i in range(17)]
        res = coco_eval.evaluate(
            [self._det(1, self.XY, 0.5), self._det(1, on_empty, 0.9)],
            [self._gt(1, self.XY), empty])
        assert res["AP"] == pytest.approx(1.0)
        assert res["AR"] == pytest.approx(1.0)

    def test_exact_tie_takes_last_gt(self):
        # pycocotools' matcher updates on `not less than` the running best,
        # so among EXACTLY tied gts the LAST one wins.  Construct an exact
        # tie via disjoint visibility: gt1 visible only on kps 0-7, gt2 only
        # on kps 9-16, det1 sits exactly on both -> OKS = 1.0 to each.
        # det1 therefore claims gt2 (the later one); det2 (exactly on gt2,
        # lower score) finds gt2 taken and gt1 at OKS 0 -> FP everywhere.
        # Per threshold: rc=[0.5,0.5], pr=[1,0.5] -> envelope gives q=1 for
        # the 51 recall points <= 0.5 -> AP = 51/101 exactly, AR = 0.5.
        a = [(50.0 + 5 * i, 60.0) for i in range(17)]       # gt1 positions
        b = [(400.0 + 5 * i, 300.0) for i in range(17)]     # gt2 positions
        gt1_kp, gt2_kp = [], []
        det1_xy = []
        for i in range(17):
            gt1_kp += [a[i][0], a[i][1], 2 if i <= 7 else 0]
            gt2_kp += [b[i][0], b[i][1], 2 if i >= 9 else 0]
            det1_xy.append(a[i] if i <= 7 else b[i])
        gts = [{"image_id": 1, "keypoints": gt1_kp, "area": 10000.0,
                "num_keypoints": 8},
               {"image_id": 1, "keypoints": gt2_kp, "area": 10000.0,
                "num_keypoints": 8}]
        res = coco_eval.evaluate(
            [self._det(1, det1_xy, 0.9), self._det(1, b, 0.8)], gts)
        assert res["AP"] == pytest.approx(51 / 101, abs=1e-9)
        assert res["AR"] == pytest.approx(0.5)

    def test_randomized_agreement_with_pycocotools_oracle(self):
        from tests import coco_oracle
        rng = np.random.RandomState(0)
        for trial in range(30):
            n_img = rng.randint(1, 5)
            gts, dets = [], []
            for img in range(1, n_img + 1):
                for _ in range(rng.randint(0, 4)):
                    cx, cy = rng.uniform(50, 400, 2)
                    xy = [(cx + rng.uniform(-40, 40),
                           cy + rng.uniform(-40, 40)) for _ in range(17)]
                    kp = []
                    vis_n = 0
                    for x, y in xy:
                        v = int(rng.rand() > 0.2) * 2
                        vis_n += v > 0
                        kp += [x, y, v]
                    gt = {"image_id": img, "keypoints": kp,
                          "area": float(rng.uniform(500, 40000)),
                          "num_keypoints": vis_n}
                    if rng.rand() < 0.2:       # crowd/ignore region
                        gt["iscrowd"] = 1
                        gt["num_keypoints"] = 0
                        gt["keypoints"] = [0.0, 0.0, 0] * 17
                        gt["bbox"] = [cx, cy, rng.uniform(20, 120),
                                      rng.uniform(20, 120)]
                    gts.append(gt)
                    # detections near this gt (sometimes several, jittered)
                    for _ in range(rng.randint(0, 3)):
                        j = rng.uniform(0, 25)
                        dxy = [(x + rng.uniform(-j, j),
                                y + rng.uniform(-j, j)) for x, y in xy]
                        dets.append(self._det(img, dxy,
                                              float(rng.uniform(0.1, 1.0))))
                for _ in range(rng.randint(0, 2)):   # pure junk dets
                    dets.append(self._det(
                        img, [tuple(rng.uniform(0, 600, 2))
                              for _ in range(17)],
                        float(rng.uniform(0.1, 1.0))))
            got = coco_eval.evaluate(dets, gts)
            want = coco_oracle.coco_ap_oracle(dets, gts)
            for key in ("AP", "AP50", "AP75", "AR"):
                assert got[key] == pytest.approx(want[key], abs=1e-9), \
                    f"trial {trial} {key}: {got[key]} vs {want[key]}"


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
