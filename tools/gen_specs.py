#!/usr/bin/env python3
"""Generate JSON topology specs from OpenPose deploy prototxts.

Run against an OpenPose `models/` directory (e.g. the reference checkout or a
user install).  The generated JSONs under openpose_tpu/models/specs/ are what
the framework ships with, so it runs standalone without any Caffe files.

Usage: python tools/gen_specs.py /path/to/openpose/models
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openpose_tpu.models.caffe_proto import parse_prototxt

SPECS = {
    "body_25": "pose/body_25/pose_deploy.prototxt",
    "coco_18": "pose/coco/pose_deploy_linevec.prototxt",
    "mpi_15": "pose/mpi/pose_deploy_linevec.prototxt",
    "mpi_15_4": "pose/mpi/pose_deploy_linevec_faster_4_stages.prototxt",
    "face_70": "face/pose_deploy.prototxt",
    "hand_21": "hand/pose_deploy.prototxt",
}


def main() -> None:
    models_dir = pathlib.Path(sys.argv[1])
    out_dir = pathlib.Path(__file__).resolve().parents[1] / "openpose_tpu/models/specs"
    out_dir.mkdir(parents=True, exist_ok=True)
    for spec_name, rel in SPECS.items():
        path = models_dir / rel
        spec = parse_prototxt(path.read_text())
        out = out_dir / f"{spec_name}.json"
        out.write_text(json.dumps(spec.to_json(), indent=1))
        n_conv = sum(1 for l in spec.layers if l.type == "Convolution")
        print(f"{spec_name}: {len(spec.layers)} layers ({n_conv} conv) -> {out}")


if __name__ == "__main__":
    main()
