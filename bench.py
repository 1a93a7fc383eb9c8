#!/usr/bin/env python3
"""Benchmark: BODY_25 frames/s/chip at 368x656 (the reference headline config).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}

Baseline: ~22 FPS BODY_25 @368x656 on a GTX 1080 Ti incl. display
(BASELINE.md, arXiv:1812.08008).

Timing methodology: the remote-execution tunnel makes naive per-call timing
meaningless (dispatch is async, block_until_ready can return before remote
compute finishes, and a host readback costs a ~0.5 s RPC round trip), so
every measured graph chains N data-dependent iterations inside one jit and
reports the t(N_hi)-t(N_lo) delta — see openpose_tpu/utils/benchmark.py.

Workload realism: no caffemodel is bundled, and random-weight heatmaps are
NMS noise (saturated 127-peak counts) that a trained model never produces.
The headline therefore times (a) the real CNN forward on images and (b) the
post-processing pipeline (8x resize-merge -> NMS -> PAF scoring) on synthetic
8-person net outputs rendered by train.make_targets, and sums them — the
injection point mirrors the reference's Datum::poseNetOutput hook
(include/openpose/core/datum.hpp:212-217).  A worst-case variant with
saturated peak counts is reported to stderr alongside.  Host greedy assembly
(~1 ms on a few hundred connections) overlaps device compute in the async
pipeline and is excluded, matching how the reference reports GPU FPS.
"""

import json
import sys
import time

import numpy as np

_T0 = time.perf_counter()


def _progress(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from openpose_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from openpose_tpu import train
    from openpose_tpu.models import graph, zoo
    from openpose_tpu.ops import nms, paf, resize
    from openpose_tpu.params import POSE_MAX_PEOPLE, PoseModel
    from openpose_tpu.utils.benchmark import chain_ms

    _progress('imports done; loading BODY_25')
    model = zoo.load_pose_model(PoseModel.BODY_25)
    info = model.info
    pairs_np, map_idx_np = paf.pair_tables(info)
    pairs = jnp.asarray(pairs_np)
    map_idx = jnp.asarray(map_idx_np)
    num_parts = info.num_parts
    net_h, net_w = 368, 656
    batch = 8

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.uniform(0, 255, (batch, net_h, net_w, 3)).astype(np.float32))

    # Synthetic 8-person net output (realistic sparsity for post-processing)
    people = 8
    kp = np.zeros((batch, people, num_parts, 3), np.float32)
    for b in range(batch):
        for p in range(people):
            cx = rng.uniform(60, net_w - 60)
            cy = rng.uniform(80, net_h - 80)
            kp[b, p, :, 0] = cx + rng.uniform(-40, 40, num_parts)
            kp[b, p, :, 1] = cy + rng.uniform(-70, 70, num_parts)
            kp[b, p, :, 2] = 1.0
    synth = train.make_targets(
        jnp.asarray(kp), pairs, map_idx, (net_h, net_w), num_parts,
        info.heatmap_channels)
    synth = jax.block_until_ready(synth)
    _progress('synthetic targets ready')

    def step_net(c):
        img = images + c * 1e-12
        out = graph.forward(model.params, model.spec,
                            resize.normalize_vgg(img), jnp.bfloat16)
        return c + out[0, 0, 0, 0] * 1e-12

    def _post(src, fast_peaks):
        merged = resize.resize_bicubic(src[..., :num_parts], (net_h, net_w))
        nms_tiers = (16, 48) if fast_peaks else ()
        peaks = nms.nms(merged, 0.05, POSE_MAX_PEOPLE,
                        fast_peaks=nms_tiers)
        scores = paf.paf_scores_multiscale(
            (src,), (1.0,), (net_h, net_w), peaks, pairs, map_idx,
            0.05, 0.95, 0.05, fast_peaks=fast_peaks)
        return peaks, scores

    def step_post(c):
        peaks, scores = _post(synth + c * 1e-12, fast_peaks=(16, 48))
        return c + peaks[0, 0, 0, 0] * 1e-12 + scores[0, 0, 0, 0] * 1e-12

    def step_post_worst(c):
        peaks, scores = _post(synth + c * 1e-12, fast_peaks=0)
        return c + peaks[0, 0, 0, 0] * 1e-12 + scores[0, 0, 0, 0] * 1e-12

    _progress('timing net forward chain')
    net_ms = chain_ms(step_net)
    _progress(f'net {net_ms:.1f} ms/iter; timing post chain')
    post_ms = chain_ms(step_post)
    _progress(f'post {post_ms:.1f} ms/iter; timing worst-case post chain')
    worst_ms = chain_ms(step_post_worst, n_lo=2, n_hi=8)

    frame_ms = (net_ms + post_ms) / batch
    worst_frame_ms = (net_ms + worst_ms) / batch
    fps = 1000.0 / frame_ms
    print(f"batch={batch}: net {net_ms / batch:.2f} ms/frame, "
          f"post {post_ms / batch:.2f} ms/frame -> {fps:.1f} frames/s",
          file=sys.stderr)

    # MFU accounting (north star: CNN at speed-of-light per chip)
    gflops_frame = sum(graph.count_flops(model.spec,
                                         (net_h, net_w)).values()) / 1e9
    achieved_tflops = gflops_frame / (net_ms / batch)
    kind = jax.devices()[0].device_kind
    peak = _bf16_peak_tflops(kind)
    mfu = achieved_tflops / peak if peak else 0.0
    print(f"CNN: {gflops_frame:.0f} GFLOP/frame @ {net_ms / batch:.2f} "
          f"ms/frame = {achieved_tflops:.0f} TFLOP/s on {kind} "
          f"(peak {peak:.0f} bf16) -> MFU {mfu:.1%}", file=sys.stderr)
    print(f"worst-case (127 peaks/part): post {worst_ms / batch:.2f} "
          f"ms/frame -> {1000.0 / worst_frame_ms:.1f} frames/s",
          file=sys.stderr)

    e2e_fps = _bench_end_to_end()
    host_tail_fps = _bench_host_tail()
    ap = _bench_synthetic_ap(model)

    baseline = 22.0
    print(json.dumps({
        "metric": "BODY_25 368x656 device pipeline frames/s/chip (batch 8)",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / baseline, 3),
        "worst_case_fps": round(1000.0 / worst_frame_ms, 2),
        "e2e_disk_to_keypoints_fps": e2e_fps,
        "host_tail_fps": host_tail_fps,
        "synthetic_ap": ap.get("AP"),
        "synthetic_ap50": ap.get("AP50"),
        "synthetic_ar": ap.get("AR"),
        "cnn_gflops_per_frame": round(gflops_frame, 1),
        "cnn_tflops": round(achieved_tflops, 1),
        "cnn_mfu": round(mfu, 3),
        "device_kind": kind,
    }))


def _bf16_peak_tflops(device_kind: str) -> float:
    """Published per-chip bf16 peaks (TFLOP/s) by device_kind substring."""
    kind = device_kind.lower()
    for key, peak in (("v5 lite", 197.0), ("v5e", 197.0), ("v5p", 459.0),
                      ("v6 lite", 918.0), ("v6e", 918.0), ("v4", 275.0),
                      ("v3", 123.0), ("v2", 45.0)):
        if key in kind:
            return peak
    return 0.0


def _bench_host_tail() -> float:
    """Host-tail capacity: disk -> keypoints JSON with the DEVICE STAGE
    STUBBED (pre-computed device outputs substituted for every frame).

    Proves the C++ decode pump + thread-pool greedy assembly + people-JSON
    saver sustain at least the device rate on this host — the "host
    overlaps device" claim of the async pipeline as a measurement, not an
    assertion.  Reference analogue: the point of configureThreadManager's
    worker graph (include/openpose/wrapper/wrapperAuxiliary.hpp:991-1217).
    """
    import concurrent.futures
    import pathlib
    import tempfile
    video = pathlib.Path("/root/reference/examples/media/video.avi")
    try:
        from openpose_tpu.io.native_loader import NativeVideoPump, available
        if not available() or not video.exists():
            _progress("host tail: native pump or media missing; skipped")
            return 0.0
        import jax.numpy as jnp
        import numpy as np
        from openpose_tpu import train, scenes
        from openpose_tpu.models import zoo
        from openpose_tpu.ops import nms, paf, resize
        from openpose_tpu.params import POSE_MAX_PEOPLE, PoseModel
        from openpose_tpu.io import json_io
        from openpose_tpu.pose.extractor import PoseExtractor

        _progress("host tail: preparing canned device outputs")
        model = zoo.load_pose_model(PoseModel.BODY_25)
        info = model.info
        pairs, map_idx = paf.pair_tables(info)
        rng = np.random.RandomState(0)
        people = scenes.random_people(rng, 4, (368, 656))
        tgt = train.make_targets(
            jnp.asarray(people[None]), jnp.asarray(pairs),
            jnp.asarray(map_idx), (368, 656), info.num_parts,
            info.heatmap_channels)
        merged = resize.resize_bicubic(tgt[..., :info.num_parts], (368, 656))
        peaks = np.asarray(nms.nms(merged, 0.05, POSE_MAX_PEOPLE))[0]
        scores = np.asarray(paf.paf_scores_multiscale(
            (tgt,), (1.0,), (368, 656), nms.nms(merged, 0.05,
                                                POSE_MAX_PEOPLE),
            jnp.asarray(pairs), jnp.asarray(map_idx), 0.05, 0.95, 0.05))[0]
        extractor = PoseExtractor(model)

        out_dir = tempfile.mkdtemp(prefix="host_tail_")
        best = 0.0
        for _ in range(2):
            pump = NativeVideoPump(str(video), 656, 368, threads=4,
                                   capacity=64)
            pool = concurrent.futures.ThreadPoolExecutor(4)
            futures = []

            def tail_one(idx):
                kp, sc = extractor.assemble(peaks, scores, 1.0)
                json_io.save_people_json(
                    f"{out_dir}/{idx:012d}_keypoints.json",
                    pose_keypoints=kp)
                return idx

            t0 = time.perf_counter()
            n = 0
            for _idx, _frame, _net, _scale in pump:
                futures.append(pool.submit(tail_one, n))
                n += 1
            for f in futures:
                f.result()
            dt = time.perf_counter() - t0
            pool.shutdown(wait=True)
            pump.close()
            best = max(best, n / dt)
        print(f"host tail (decode + assembly + JSON, device stubbed): "
              f"{best:.1f} frames/s", file=sys.stderr)
        return round(best, 2)
    except Exception as exc:          # never sink the headline number
        _progress(f"host tail bench failed: {exc!r}")
        return 0.0


def _bench_synthetic_ap(model) -> dict:
    """Closed-loop synthetic COCO AP through the real user path (sharded
    program with net-output injection -> assembly -> CocoJsonSaver ->
    pycocotools-exact evaluator); openpose_tpu/accuracy.py, mirroring the
    reference protocol scripts/tests/pose_accuracy_coco_val.sh:14-30."""
    try:
        from openpose_tpu.accuracy import synthetic_coco_eval
        _progress("synthetic AP: running closed loop (32 images)")
        m = synthetic_coco_eval(n_images=32, net_hw=(368, 656), batch=8,
                                seed=0, model=model)
        print(f"synthetic AP={m['AP']:.4f} AP50={m['AP50']:.4f} "
              f"AR={m['AR']:.4f} ({m['n_detections']} dets / "
              f"{m['n_gt']} gt)", file=sys.stderr)
        return {k: round(float(v), 4) for k, v in m.items()
                if k in ("AP", "AP50", "AP75", "AR")}
    except Exception as exc:          # never sink the headline number
        _progress(f"synthetic AP failed: {exc!r}")
        return {}


def _bench_end_to_end() -> float:
    """Disk -> keypoints frames/s through the full user path: native MJPEG
    decode pool -> uint8 batches -> sharded device program -> adaptive fetch
    -> host greedy assembly (runtime/video_runner.py, the CLI --video path).

    Configuration notes: random weights make every NMS budget saturate, so
    this run uses the people-capped production config (max_peaks=16, i.e.
    --number_people_max) and an NMS threshold recalibrated so random-weight
    activations produce trained-weight-like peak statistics (~8-16/part).
    On this harness the device is reached through a remote tunnel at
    ~40 MB/s; at 724 KB/frame the upload alone caps e2e at ~55 f/s, so this
    number is a TUNNEL-bandwidth measurement, not a TPU-host one — the
    device pipeline number above is the co-located-host throughput."""
    import pathlib
    video = pathlib.Path("/root/reference/examples/media/video.avi")
    try:
        from openpose_tpu.io.native_loader import available
        if not available() or not video.exists():
            _progress("e2e: native pump or media missing; skipped")
            return 0.0
        from openpose_tpu.models import zoo
        from openpose_tpu.params import PoseModel
        from openpose_tpu.parallel.inference import ShardedPoseInference
        from openpose_tpu.pose.extractor import PoseExtractor
        from openpose_tpu.runtime.video_runner import VideoRunner

        _progress("e2e: building people-capped pipeline")
        model = zoo.load_pose_model(PoseModel.BODY_25)
        inf = ShardedPoseInference(model, net_hw=(368, 656), max_peaks=16,
                                   nms_threshold=2.0)
        runner = VideoRunner(inf, PoseExtractor(model), batch_size=32,
                             max_in_flight=6)
        runner.run_video(str(video), max_frames=64)      # compile + warm
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            res = runner.run_video(str(video))
            best = max(best, len(res) / (time.perf_counter() - t0))
        print(f"e2e disk->keypoints (batch 32, people-capped): "
              f"{best:.1f} frames/s", file=sys.stderr)
        return round(best, 2)
    except Exception as exc:          # never sink the headline number
        _progress(f"e2e bench failed: {exc!r}")
        return 0.0


if __name__ == "__main__":
    main()
