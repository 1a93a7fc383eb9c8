#!/usr/bin/env python
"""Train-to-AP demo: BODY_25 from scratch on synthetic scenes -> pipeline AP.

Turns "loss decreases" into "training produces a net the full pipeline can
decode": trains with the sharded step (train_loop.train) on rendered
skeleton scenes, then measures COCO AP through the real user path on
held-out scenes (accuracy.train_to_ap).  Writes TRAIN2AP.json.
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--image_size", default="184x328", help="HxW")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--eval_images", type=int, default=16)
    ap.add_argument("--schedule", default="constant",
                    choices=("constant", "cosine"))
    ap.add_argument("--sigma", type=float, default=7.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="TRAIN2AP.json")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from openpose_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from openpose_tpu.accuracy import train_to_ap

    h, w = (int(v) for v in args.image_size.split("x"))
    m = train_to_ap(steps=args.steps, image_size=(h, w), batch=args.batch,
                    learning_rate=args.lr, n_eval=args.eval_images,
                    lr_schedule=args.schedule, target_sigma=args.sigma)
    print(json.dumps(m))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(m, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
