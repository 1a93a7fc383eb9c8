#!/usr/bin/env python3
"""COCO val AP harness (pose_accuracy_coco_val.sh equivalent, self-contained).

Usage: python scripts/coco_val.py --images val2017/ \
           --annotations person_keypoints_val2017.json \
           [--caffemodel body25.npz] [--scale_number 4]
"""
import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", required=True)
    p.add_argument("--annotations", required=True)
    p.add_argument("--caffemodel", default=None)
    p.add_argument("--net_resolution", default="-1x368")
    p.add_argument("--scale_number", type=int, default=1)
    p.add_argument("--scale_gap", type=float, default=0.25)
    p.add_argument("--max_images", type=int, default=-1)
    p.add_argument("--out", default="coco_detections.json")
    p.add_argument("--variants", type=int, default=1,
                   help="CocoJsonSaver bitmask (2 adds the foot stream for "
                        "the foot-AP half of pose_accuracy_coco_val.sh)")
    args = p.parse_args()

    import cv2
    from openpose_tpu.io import coco_eval, json_io
    from openpose_tpu.wrapper import PoseConfig, Wrapper

    with open(args.annotations) as f:
        coco = json.load(f)
    images = coco["images"]
    if args.max_images > 0:
        images = images[:args.max_images]

    w, h = args.net_resolution.lower().split("x")
    wrapper = Wrapper(pose=PoseConfig(
        net_resolution=(int(w), int(h)), scale_number=args.scale_number,
        scale_gap=args.scale_gap, maximize_positives=True,
        caffemodel=args.caffemodel))
    saver = json_io.CocoJsonSaver(args.variants)
    for i, img_info in enumerate(images):
        img = cv2.imread(str(pathlib.Path(args.images)
                             / img_info["file_name"]))
        if img is None:
            continue
        d = wrapper.process(img)
        if d.pose_keypoints is not None and d.pose_keypoints.size:
            saver.record(d.pose_keypoints, d.pose_scores, img_info["id"])
        if i % 50 == 0:
            print(f"{i}/{len(images)}")
    saver.save(args.out)
    metrics = coco_eval.evaluate_files(args.out, args.annotations)
    print(json.dumps(metrics, indent=1))


if __name__ == "__main__":
    main()
