#!/usr/bin/env python
"""3D accuracy benchmark: synthetic rig -> triangulation + BA -> RMSE.

Writes BENCH3D.json at the repo root (and prints the table).  See
openpose_tpu/accuracy3d.py for methodology; reference gates:
src/openpose/3d/poseTriangulation.cpp:98-120 (reprojection threshold
25*sqrt(area/1310720) px).
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--people", type=int, default=8)
    ap.add_argument("--cams", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="BENCH3D.json")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from openpose_tpu import accuracy3d

    sweep = accuracy3d.noise_sweep(n_people=args.people, n_cams=args.cams,
                                   seed=args.seed)
    print(f"# triangulation (DLT + GN Huber), {args.cams}-camera rig")
    for r in sweep:
        print(f"  noise={r['pixel_noise']:<4} px  RMSE={r['rmse_mm']:7.2f} mm"
              f"  reproj={r['reprojection_px']:5.2f} px"
              f"  (gate {r['reference_gate_px']:.1f} px)"
              f"  valid={r['valid_fraction']:.2f}")
    ba = accuracy3d.bundle_eval(n_people=args.people, n_cams=args.cams,
                                seed=args.seed)
    print("# bundle adjustment (perturbed cameras)")
    print(f"  in:  rot {ba['cam_rot_err_deg_in']} deg, "
          f"t {ba['cam_t_err_mm_in']:.0f} mm, pixel noise "
          f"{ba['pixel_noise']} px")
    print(f"  out: rot {ba['cam_rot_err_deg_out']:.3f} deg, "
          f"t {ba['cam_t_err_mm_out']:.1f} mm; point RMSE "
          f"{ba['rmse_mm_before_ba']:.1f} -> {ba['rmse_mm_after_ba']:.1f} mm")
    result = {"triangulation_sweep": sweep, "bundle_adjustment": ba}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
