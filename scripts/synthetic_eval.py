#!/usr/bin/env python
"""Closed-loop synthetic COCO AP through the real user path.

Renders synthetic multi-person scenes to net-output tensors on device,
injects them into the sharded inference program (the reference's
Datum::poseNetOutput hook inside the data-parallel program), runs the
standard post chain (NMS -> PAF scoring -> greedy assembly -> CocoJsonSaver)
and scores with the built-in pycocotools-exact evaluator.  Mirrors the
protocol of the reference's scripts/tests/pose_accuracy_coco_val.sh:14-30
with synthetic ground truth standing in for val2017 (no weights are
fetchable in this environment; the moment they are, scripts/coco_val.py
measures true COCO AP with the same saver + evaluator).

Usage:
  python scripts/synthetic_eval.py                    # one clean-scene AP
  python scripts/synthetic_eval.py --sweep            # noise + jitter sweeps
  python scripts/synthetic_eval.py --images 128 --out results.json
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--net_resolution", default="656x368",
                    help="WxH (reference flag convention)")
    ap.add_argument("--people", default="1-4", help="people per image range")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--noise", type=float, default=0.0,
                    help="correlated map-noise stddev")
    ap.add_argument("--kp_jitter", type=float, default=0.0,
                    help="rendered-keypoint jitter stddev (px)")
    ap.add_argument("--sweep", action="store_true",
                    help="run the full noise + jitter sweeps")
    ap.add_argument("--topdown", choices=("face", "hand"), default="",
                    help="instead of body AP, run the closed-loop face/"
                         "hand localization eval (accuracy."
                         "synthetic_topdown_eval)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    ap.add_argument("--out", default="", help="write results JSON here")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from openpose_tpu import accuracy

    w, h = (int(v) for v in args.net_resolution.split("x"))
    lo, _, hi = args.people.partition("-")
    people = (int(lo), int(hi or lo))
    kw = dict(n_images=args.images, net_hw=(h, w), people_range=people,
              batch=args.batch, seed=args.seed)

    if args.topdown:
        results = accuracy.synthetic_topdown_eval(
            args.topdown, n_frames=args.images, frame_hw=(h, w),
            people_range=people, batch=args.batch, seed=args.seed)
        print(json.dumps(results))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
        return 0

    if args.sweep:
        results = {"noise_sweep": accuracy.noise_sweep(**kw),
                   "jitter_sweep": accuracy.jitter_sweep(**kw)}
        for name, rows in results.items():
            print(f"# {name}")
            for m in rows:
                level = m["noise"] if name == "noise_sweep" else m["kp_jitter"]
                print(f"  level={level:<5} AP={m['AP']:.4f} "
                      f"AP50={m['AP50']:.4f} AP75={m['AP75']:.4f} "
                      f"AR={m['AR']:.4f}")
    else:
        results = accuracy.synthetic_coco_eval(
            noise=args.noise, kp_jitter=args.kp_jitter, **kw)
        print(json.dumps(results))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
