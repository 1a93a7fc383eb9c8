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
    from openpose_tpu.utils.benchmark import chain_ms, fold

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
        return fold(c, out)

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
        return fold(c, peaks, scores)

    def step_post_worst(c):
        peaks, scores = _post(synth + c * 1e-12, fast_peaks=0)
        return fold(c, peaks, scores)

    # Realistic crowd: 32 people/frame through the PRODUCTION tier config —
    # the people-count-invariance evidence on content the reference's
    # "runtime invariant to #people" claim describes (README.md:63-68);
    # the worst-case row above saturates the full 127-slot BUDGET instead.
    from openpose_tpu import scenes as _scenes
    kp32 = np.zeros((batch, 32, num_parts, 3), np.float32)
    for b in range(batch):
        kp32[b] = _scenes.random_people(
            np.random.RandomState(100 + b), 32, (net_h, net_w),
            min_spacing=30.0)[:, :num_parts]
    crowd = jax.block_until_ready(train.make_targets(
        jnp.asarray(kp32), pairs, map_idx, (net_h, net_w), num_parts,
        info.heatmap_channels))

    def step_post_crowd(c):
        peaks, scores = _post(crowd + c * 1e-12, fast_peaks=(16, 48))
        return fold(c, peaks, scores)

    _progress('timing net forward chain')
    net_ms = chain_ms(step_net)
    _progress(f'net {net_ms:.1f} ms/iter; timing post chain')
    post_ms = chain_ms(step_post)
    _progress(f'post {post_ms:.1f} ms/iter; timing crowd post chain')
    crowd_ms = chain_ms(step_post_crowd, n_lo=2, n_hi=12)
    _progress(f'crowd {crowd_ms:.1f} ms/iter; timing worst-case post chain')
    worst_ms = chain_ms(step_post_worst, n_lo=2, n_hi=8)

    frame_ms = (net_ms + post_ms) / batch
    crowd_frame_ms = (net_ms + crowd_ms) / batch
    worst_frame_ms = (net_ms + worst_ms) / batch
    fps = 1000.0 / frame_ms
    print(f"batch={batch}: net {net_ms / batch:.2f} ms/frame, "
          f"post {post_ms / batch:.2f} ms/frame -> {fps:.1f} frames/s",
          file=sys.stderr)
    print(f"crowd (32 people/frame, production tiers): post "
          f"{crowd_ms / batch:.2f} ms/frame -> "
          f"{1000.0 / crowd_frame_ms:.1f} frames/s", file=sys.stderr)

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
    if not _roofline_ok("cnn_headline", gflops_frame, net_ms / batch):
        # One retry with a longer chain (amortizes any residual fixed cost
        # mis-cancellation); if STILL impossible the headline publishes as
        # 0.0 — visibly invalid beats silently inflated.
        _progress("re-measuring net chain (n_hi=44) after roofline fail")
        net_ms = chain_ms(step_net, n_lo=2, n_hi=44)
        achieved_tflops = gflops_frame / (net_ms / batch)
        mfu = achieved_tflops / peak if peak else 0.0
        frame_ms = (net_ms + post_ms) / batch
        crowd_frame_ms = (net_ms + crowd_ms) / batch
        worst_frame_ms = (net_ms + worst_ms) / batch
        fps = 1000.0 / frame_ms
        if not _roofline_ok("cnn_headline_retry", gflops_frame,
                            net_ms / batch):
            fps = 0.0
    print(f"worst-case (127 peaks/part): post {worst_ms / batch:.2f} "
          f"ms/frame -> {1000.0 / worst_frame_ms:.1f} frames/s",
          file=sys.stderr)

    batch1 = _bench_batch1(model, images, synth, _post)
    wb = _bench_whole_body(net_ms, post_ms, gflops_frame, batch, peak)
    ms4 = _bench_multiscale(model)
    e2e_fps = _bench_end_to_end()
    tail = _bench_host_tail()
    host_tail_fps = tail.get("host_tail_fps", 0.0)
    ap = _bench_synthetic_ap(model)
    td_acc = _bench_topdown_accuracy()

    # Co-located e2e estimate: in the deep-pipelined runner the host tail
    # (decode + assembly + JSON) overlaps device compute, so a host NOT
    # behind a ~40 MB/s tunnel sustains min(device, host_tail) — the
    # overlap model for the measured-tunnel e2e number below.  On THIS
    # harness host_tail is 2-core-decode-bound (see tail_only_fps for the
    # post-device tail capacity, which exceeds the device rate).
    colocated = round(min(fps, host_tail_fps), 2) if host_tail_fps else 0.0

    baseline = 22.0
    print(json.dumps({
        "metric": "BODY_25 368x656 device pipeline frames/s/chip (batch 8)",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / baseline, 3),
        "worst_case_fps": round(1000.0 / worst_frame_ms, 2),
        "crowd32_fps": round(1000.0 / crowd_frame_ms, 2),
        "e2e_disk_to_keypoints_fps": e2e_fps,
        "e2e_colocated_est_fps": colocated,
        **tail,
        "synthetic_ap": ap.get("AP"),
        "synthetic_ap50": ap.get("AP50"),
        "synthetic_ar": ap.get("AR"),
        "face_rmse_px": td_acc.get("face_rmse_px"),
        "hand_rmse_px": td_acc.get("hand_rmse_px"),
        "cnn_gflops_per_frame": round(gflops_frame, 1),
        "cnn_tflops": round(achieved_tflops, 1),
        "cnn_mfu": round(mfu, 3),
        "device_kind": kind,
        **batch1,
        **wb,
        **ms4,
    }))


def _bench_batch1(model, images, synth, post_fn) -> dict:
    """Real-time (batch-1) latency: the reference's headline is 22 FPS
    including display on one frame at a time (README.md:63-68), so
    throughput-at-batch-8 alone does not prove real-time parity.

    Reports the batch-1 device pipeline time (chained, tunnel-proof), the
    single-thread host assembly tail, and their sum as the co-located
    frame latency; plus the MEASURED per-call wall time through the remote
    tunnel (RPC-dominated here; a co-located host pays only the estimate).
    """
    try:
        import jax
        import numpy as np
        from openpose_tpu.models import graph
        from openpose_tpu.ops import resize
        from openpose_tpu.utils.benchmark import chain_ms, fold
        import jax.numpy as jnp

        _progress("batch-1: timing net + post chains")
        img1 = images[:1]
        synth1 = synth[:1]

        def step_net1(c):
            out = graph.forward(model.params, model.spec,
                                resize.normalize_vgg(img1 + c * 1e-12),
                                jnp.bfloat16)
            return fold(c, out)

        def step_post1(c):
            peaks, scores = post_fn(synth1 + c * 1e-12, fast_peaks=(16, 48))
            return fold(c, peaks, scores)

        net1_ms = chain_ms(step_net1)
        post1_ms = chain_ms(step_post1)

        # single-thread host tail (greedy assembly) on typical content
        import time as _t
        from openpose_tpu.ops import nms as nms_ops, paf as paf_ops
        from openpose_tpu.params import POSE_MAX_PEOPLE
        from openpose_tpu.pose.extractor import PoseExtractor
        pairs_np, map_idx_np = paf_ops.pair_tables(model.info)
        merged = resize.resize_bicubic(
            synth1[..., :model.info.num_parts], (368, 656))
        pk = nms_ops.nms(merged, 0.05, POSE_MAX_PEOPLE)
        sc = paf_ops.paf_scores_multiscale(
            (synth1,), (1.0,), (368, 656), pk, jnp.asarray(pairs_np),
            jnp.asarray(map_idx_np), 0.05, 0.95, 0.05)
        pk_np, sc_np = np.asarray(pk)[0], np.asarray(sc)[0]
        extractor = PoseExtractor(model)
        extractor.assemble(pk_np, sc_np, 1.0)          # warm
        t0 = _t.perf_counter()
        reps = 50
        for _ in range(reps):
            extractor.assemble(pk_np, sc_np, 1.0)
        asm_ms = (_t.perf_counter() - t0) / reps * 1e3

        device_ms = net1_ms + post1_ms
        latency = device_ms + asm_ms
        print(f"batch-1: net {net1_ms:.2f} + post {post1_ms:.2f} + "
              f"assembly {asm_ms:.2f} ms -> latency {latency:.2f} ms "
              f"({1000.0 / device_ms:.1f} fps device)", file=sys.stderr)
        return {
            "batch1_fps": round(1000.0 / device_ms, 2),
            "batch1_latency_ms": round(latency, 2),
            "batch1_net_ms": round(net1_ms, 3),
            "batch1_post_ms": round(post1_ms, 3),
            "batch1_assembly_ms": round(asm_ms, 3),
        }
    except Exception as exc:          # never sink the headline number
        _progress(f"batch-1 bench failed: {exc!r}")
        return {}


def _bench_whole_body(net_ms: float, post_ms: float,
                      body_gflops: float, batch: int,
                      peak_tflops: float) -> dict:
    """Whole-body cascade throughput: BODY_25 + face + 2x hands, batch 8,
    4 people/frame, every crop slot ACTIVE (worst case for the top-down
    stages).  The reference loops crops per person per GPU
    (faceExtractorCaffe.cpp:230-310, wrapperAuxiliary.hpp:324-337) — its
    known O(#people) weakness; here one batched program per stage covers
    all batch*people crops.  Stages share one chip, so cascade time is the
    sum of the three device programs (host geometry overlaps in the async
    pipeline and is reported separately)."""
    try:
        import jax
        import numpy as np
        import jax.numpy as jnp
        from openpose_tpu.models import graph, zoo
        from openpose_tpu.ops import warp
        from openpose_tpu.parallel.inference import ShardedTopDown
        from openpose_tpu.utils.benchmark import chain_ms, fold

        _progress("whole-body: building face/hand stages")
        people = 4
        face_model = zoo.load_face_model()
        hand_model = zoo.load_hand_model()
        face_td = ShardedTopDown(face_model, net_size=368,
                                 people_cap=people)
        hand_td = ShardedTopDown(hand_model, mesh=face_td.mesh,
                                 net_size=368, people_cap=2 * people)

        rng = np.random.RandomState(1)
        frames = jnp.asarray(rng.uniform(
            0, 255, (batch, 368, 656, 3)).astype(np.float32))

        def rand_transforms(cap, mirror_alt):
            tr = np.zeros((batch, cap, 4), np.float32)
            for b in range(batch):
                for s in range(cap):
                    side = rng.uniform(60, 140)
                    x = rng.uniform(0, 656 - side)
                    y = rng.uniform(0, 368 - side)
                    tr[b, s] = warp.rect_to_transform(
                        (x, y, side, side), 368,
                        mirror_alt and s % 2 == 0)
            return jnp.asarray(tr)

        face_tr = rand_transforms(people, False)
        hand_tr = rand_transforms(2 * people, True)
        fface = face_td._fn((368, 656))
        fhand = hand_td._fn((368, 656))

        def step_face(c):
            pk = fface(face_td.params, frames + c * 1e-12, face_tr)
            return fold(c, pk)

        def step_hand(c):
            pk = fhand(hand_td.params, frames + c * 1e-12, hand_tr)
            return fold(c, pk)

        _progress("whole-body: timing face chain")
        face_ms = chain_ms(step_face, n_lo=2, n_hi=8)
        _progress(f"whole-body: face {face_ms:.1f} ms/iter; timing hand")
        hand_ms = chain_ms(step_hand, n_lo=2, n_hi=8)
        _progress(f"whole-body: hand {hand_ms:.1f} ms/iter")

        # Typical content: 2 people/frame -> the crop-tier ladder drops to
        # the tier-2 face / tier-4 hand programs (inference.ShardedTopDown.
        # crop_tiers); the all-active numbers above are the worst case.
        typical_people = 2
        face_typ = np.tile(np.asarray(ShardedTopDown.INACTIVE, np.float32),
                           (batch, people, 1))
        face_typ[:, :typical_people] = np.asarray(face_tr)[:, :typical_people]
        hand_typ = np.tile(np.asarray(ShardedTopDown.INACTIVE, np.float32),
                           (batch, 2 * people, 1))
        hand_typ[:, :2 * typical_people] = \
            np.asarray(hand_tr)[:, :2 * typical_people]
        ft = face_td.tier_for(face_typ)
        ht = hand_td.tier_for(hand_typ)
        fface_t = face_td._tier_fn((368, 656), ft)
        fhand_t = hand_td._tier_fn((368, 656), ht)
        face_typ_dev = jnp.asarray(np.ascontiguousarray(face_typ[:, :ft]))
        hand_typ_dev = jnp.asarray(np.ascontiguousarray(hand_typ[:, :ht]))

        def step_face_typ(c):
            pk = fface_t(face_td.params, frames + c * 1e-12, face_typ_dev)
            return fold(c, pk)

        def step_hand_typ(c):
            pk = fhand_t(hand_td.params, frames + c * 1e-12, hand_typ_dev)
            return fold(c, pk)

        _progress(f"whole-body: timing typical tiers (face {ft}, hand {ht})")
        face_t_ms = chain_ms(step_face_typ, n_lo=2, n_hi=8)
        hand_t_ms = chain_ms(step_hand_typ, n_lo=2, n_hi=8)

        # host geometry between programs (overlaps device in the pipeline)
        import time as _t
        from openpose_tpu.face.detector import detect_faces
        from openpose_tpu.hand.detector import detect_hands
        from openpose_tpu.params import PoseModel
        from openpose_tpu import scenes
        kp = scenes.random_people(rng, people, (368, 656))
        t0 = _t.perf_counter()
        reps = 200
        for _ in range(reps):
            for r in detect_faces(kp, PoseModel.BODY_25):
                warp.rect_to_transform(r, 368, False)
            for left, right in detect_hands(kp, PoseModel.BODY_25):
                warp.rect_to_transform(left, 368, True)
                warp.rect_to_transform(right, 368, False)
        geom_ms = (_t.perf_counter() - t0) / reps * 1e3

        face_gflops = sum(graph.count_flops(
            face_model.spec, (368, 368)).values()) / 1e9
        hand_gflops = sum(graph.count_flops(
            hand_model.spec, (368, 368)).values()) / 1e9
        total_gflops = (body_gflops + people * face_gflops
                        + 2 * people * hand_gflops)
        frame_ms = (net_ms + post_ms + face_ms + hand_ms) / batch
        fps = 1000.0 / frame_ms
        tflops = total_gflops / frame_ms
        mfu = tflops / peak_tflops if peak_tflops else 0.0
        typ_frame_ms = (net_ms + post_ms + face_t_ms + hand_t_ms) / batch
        typ_fps = 1000.0 / typ_frame_ms
        typ_gflops = (body_gflops + ft * face_gflops + ht * hand_gflops)
        print(f"whole-body (4 people, all crops active): body "
              f"{(net_ms + post_ms) / batch:.2f} + face "
              f"{face_ms / batch:.2f} + hands {hand_ms / batch:.2f} "
              f"ms/frame -> {fps:.1f} frames/s, "
              f"{total_gflops:.0f} GFLOP/frame, MFU {mfu:.1%} "
              f"(host geometry {geom_ms:.2f} ms/frame, overlapped)",
              file=sys.stderr)
        print(f"whole-body typical ({typical_people} people, tier {ft} "
              f"face / {ht} hand): face {face_t_ms / batch:.2f} + hands "
              f"{hand_t_ms / batch:.2f} ms/frame -> {typ_fps:.1f} frames/s",
              file=sys.stderr)
        if not _roofline_ok("whole_body", total_gflops, frame_ms) \
                or not _roofline_ok("whole_body_typical", typ_gflops,
                                    typ_frame_ms):
            return {}
        return {
            "whole_body_fps": round(fps, 2),
            "whole_body_face_ms": round(face_ms / batch, 3),
            "whole_body_hand_ms": round(hand_ms / batch, 3),
            "whole_body_gflops_per_frame": round(total_gflops, 1),
            "whole_body_mfu": round(mfu, 3),
            "whole_body_host_geom_ms": round(geom_ms, 3),
            "whole_body_typical_fps": round(typ_fps, 2),
            "whole_body_typical_face_ms": round(face_t_ms / batch, 3),
            "whole_body_typical_hand_ms": round(hand_t_ms / batch, 3),
        }
    except Exception as exc:          # never sink the headline number
        _progress(f"whole-body bench failed: {exc!r}")
        return {}


def _bench_multiscale(model) -> dict:
    """Max-accuracy config throughput: 4 scales, scale-0 net 1312x736 —
    the reference's highest-accuracy recipe
    (doc/01_demo.md "Maximum Accuracy Configuration":
    --net_resolution 1312x736 --scale_number 4 --scale_gap 0.25), measured
    through the same sharded program the CLI multi-scale path uses.

    Round-4 note: the previously published multiscale4_fps = 137.75 was an
    invalid measurement — it implied 292 TFLOP/s on a 197-TFLOP/s-peak chip.
    The chain carry folded only one scalar per output, and the TPU compiler
    dead-code-eliminated part of the chained body (the exact pitfall
    docs/performance.md records from round 3).  This version folds a FULL
    reduction of both outputs into the carry (utils/benchmark.fold), chains
    more iterations (n_hi=8), and the row passes through the roofline guard
    below before publication."""
    try:
        import jax
        import numpy as np
        import jax.numpy as jnp
        from openpose_tpu.models import graph
        from openpose_tpu.parallel.inference import ShardedPoseInference
        from openpose_tpu.utils.benchmark import chain_ms, fold

        _progress("multi-scale: building 4-scale 1312x736 program")
        batch = 4
        inf = ShardedPoseInference(model, net_hw=(736, 1312),
                                   scale_number=4, scale_gap=0.25,
                                   max_peaks=16, nms_threshold=0.05)
        rng = np.random.RandomState(2)
        frames = jnp.asarray(rng.uniform(
            0, 255, (batch, 736, 1312, 3)).astype(np.float32))
        fn = inf._fn

        def step(c):
            peaks, scores = fn(inf.params, frames + c * 1e-12)
            return fold(c, peaks, scores)

        ms = chain_ms(step, n_lo=2, n_hi=8)
        gflops = sum(
            sum(graph.count_flops(model.spec, (h, w)).values())
            for w, h in inf.plan.net_input_sizes) / 1e9
        fps = 1000.0 * batch / ms
        print(f"max-accuracy (4 scales, 1312x736 scale-0): "
              f"{ms / batch:.1f} ms/frame -> {fps:.2f} frames/s "
              f"({gflops:.0f} GFLOP/frame)", file=sys.stderr)
        if not _roofline_ok("multiscale4", gflops, ms / batch):
            return {}
        return {"multiscale4_fps": round(fps, 3),
                "multiscale4_gflops_per_frame": round(gflops, 1)}
    except Exception as exc:          # never sink the headline number
        _progress(f"multi-scale bench failed: {exc!r}")
        return {}


def _roofline_ok(label: str, gflops_per_frame: float,
                 ms_per_frame: float) -> bool:
    """Refuse to publish a physically-impossible number: if the implied
    compute rate exceeds the chip's bf16 peak, the measured program cannot
    be executing the claimed work (round 4 shipped exactly one such row:
    multiscale4 at 292 implied TFLOP/s on a 197-peak chip).  Returns False
    — and the caller withholds the row — rather than emitting garbage."""
    import jax
    peak = _bf16_peak_tflops(jax.devices()[0].device_kind)
    if not peak or not ms_per_frame:
        return True        # unknown chip (e.g. CPU smoke run): no basis
    # GFLOP/frame divided by ms/frame IS TFLOP/s (1e9 FLOP / 1e-3 s)
    implied = gflops_per_frame / ms_per_frame
    if implied > peak * 1.02:
        print(f"ROOFLINE GUARD: {label} implies {implied:.0f} TFLOP/s "
              f"> chip peak {peak:.0f} — measurement invalid, row "
              "WITHHELD", file=sys.stderr)
        return False
    print(f"roofline: {label} implies {implied:.0f} TFLOP/s "
          f"({implied / peak:.0%} of {peak:.0f} peak) [ok]", file=sys.stderr)
    return True


def _bench_topdown_accuracy() -> dict:
    """Closed-loop face/hand localization through the real top-down decode
    program (accuracy.synthetic_topdown_eval): frame-px RMSE at the
    production 368 crop size."""
    try:
        from openpose_tpu.accuracy import synthetic_topdown_eval
        _progress("topdown accuracy: face closed loop")
        face = synthetic_topdown_eval("face", n_frames=8, batch=8, seed=0)
        _progress("topdown accuracy: hand closed loop")
        hand = synthetic_topdown_eval("hand", n_frames=8, batch=8, seed=1)
        print(f"face RMSE {face['rmse_px']:.2f} px (PCK05 {face['pck05']:.3f}"
              f", n={face['n_instances']}); hand RMSE {hand['rmse_px']:.2f}"
              f" px (PCK05 {hand['pck05']:.3f}, n={hand['n_instances']})",
              file=sys.stderr)
        return {"face_rmse_px": round(face["rmse_px"], 3),
                "hand_rmse_px": round(hand["rmse_px"], 3)}
    except Exception as exc:          # never sink the headline number
        _progress(f"topdown accuracy failed: {exc!r}")
        return {}


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

        # Tail-only capacity (assembly + JSON pooled over 2 threads, no
        # decode): proves the POST-DEVICE host work sustains well above the
        # device rate — the residual host-tail gap below is pure video
        # decode CPU (~5 ms CPU/frame for 1280x720 H.264; this harness has
        # 2 cores, so decode alone caps disk->keypoints at ~390 f/s ideal).
        def tail_one_idx(idx):
            kp, sc = extractor.assemble(peaks, scores, 1.0)
            json_io.save_people_json(
                f"{out_dir}/t{idx:012d}_keypoints.json", pose_keypoints=kp)
        pool = concurrent.futures.ThreadPoolExecutor(2)
        list(pool.map(tail_one_idx, range(32)))          # warm
        t0 = time.perf_counter()
        list(pool.map(tail_one_idx, range(400)))
        tail_only = 400 / (time.perf_counter() - t0)
        pool.shutdown(wait=True)
        print(f"host tail-only (assembly + JSON, 2 threads): "
              f"{tail_only:.1f} frames/s", file=sys.stderr)

        best = 0.0
        for threads in (2, 3, 2):
            pump = NativeVideoPump(str(video), 656, 368, threads=threads,
                                   capacity=64)
            pool = concurrent.futures.ThreadPoolExecutor(threads)
            futures = []

            def tail_one(idx):
                kp, sc = extractor.assemble(peaks, scores, 1.0)
                json_io.save_people_json(
                    f"{out_dir}/{idx:012d}_keypoints.json",
                    pose_keypoints=kp)
                return idx

            t0 = time.perf_counter()
            n = 0
            while True:        # batched pop: one GIL-releasing call / 8
                item = pump.next_batch(8)
                if item is None:
                    break
                k, _, _ = item
                for _ in range(k):
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
        return {"host_tail_fps": round(best, 2),
                "tail_only_fps": round(tail_only, 2)}
    except Exception as exc:          # never sink the headline number
        _progress(f"host tail bench failed: {exc!r}")
        return {}


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

        # tunnel-bandwidth probe: contextualizes run-to-run e2e variance
        # (the device upload path is the e2e bottleneck on this harness)
        import jax
        import numpy as np
        buf = np.zeros((32, 368, 656, 3), np.uint8)     # one e2e batch
        jax.block_until_ready(jax.device_put(buf))      # warm
        bw = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(jax.device_put(buf))
            bw.append(buf.nbytes / (time.perf_counter() - t0) / 1e6)
        print(f"e2e: tunnel upload bandwidth ~{max(bw):.0f} MB/s "
              f"(reps: {', '.join(f'{b:.0f}' for b in bw)})",
              file=sys.stderr)

        _progress("e2e: building people-capped pipeline")
        model = zoo.load_pose_model(PoseModel.BODY_25)
        inf = ShardedPoseInference(model, net_hw=(368, 656), max_peaks=16,
                                   nms_threshold=2.0)
        runner = VideoRunner(inf, PoseExtractor(model), batch_size=32,
                             max_in_flight=6)
        runner.run_video(str(video), max_frames=64)      # compile + warm
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = runner.run_video(str(video))
            rates.append(len(res) / (time.perf_counter() - t0))
        best = max(rates)
        print(f"e2e disk->keypoints (batch 32, people-capped): "
              f"{best:.1f} frames/s (reps: "
              f"{', '.join(f'{r:.1f}' for r in rates)}; the spread bounds "
              f"tunnel weather)", file=sys.stderr)
        return round(best, 2)
    except Exception as exc:          # never sink the headline number
        _progress(f"e2e bench failed: {exc!r}")
        return 0.0


if __name__ == "__main__":
    main()
