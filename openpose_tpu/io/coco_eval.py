"""Self-contained COCO keypoint evaluation (OKS-based AP/AR).

The reference defers AP computation to offline Matlab tooling
(scripts/tests/pose_accuracy_coco_val.sh + the openpose_train repo); here the
standard COCO keypoint metric is built in: OKS with the official per-keypoint
sigmas, AP averaged over OKS thresholds 0.50:0.05:0.95, greedy matching by
descending detection score — the same algorithm as pycocotools.cocoeval
(re-implemented; pycocotools is not available in this environment).
"""

from __future__ import annotations

import json
from typing import Dict, List, Sequence, Tuple

import numpy as np

# Official COCO keypoint sigmas (person category, 17 keypoints)
COCO_SIGMAS = np.array([
    .026, .025, .025, .035, .035, .079, .079, .072, .072, .062, .062,
    .107, .107, .087, .087, .089, .089]) * 2.0  # note: k = 2*sigma in OKS

OKS_THRESHOLDS = np.arange(0.5, 1.0, 0.05)


def oks(det_kp: np.ndarray, gt_kp: np.ndarray, gt_area: float) -> float:
    """det_kp [17,3] (x,y,score-or-flag), gt_kp [17,3] (x,y,visibility)."""
    vis = gt_kp[:, 2] > 0
    if not vis.any():
        return 0.0
    d2 = ((det_kp[:, 0] - gt_kp[:, 0]) ** 2
          + (det_kp[:, 1] - gt_kp[:, 1]) ** 2)
    var = (COCO_SIGMAS ** 2) * 2.0 * max(gt_area, 1e-9)
    e = d2 / var
    return float(np.exp(-e)[vis].mean())


def evaluate(detections: List[Dict], ground_truth: List[Dict],
             max_dets: int = 20) -> Dict[str, float]:
    """detections: [{image_id, keypoints (51 floats), score}]
    ground_truth: [{image_id, keypoints (51 floats, flag=visibility),
                    area, (optional) iscrowd}]
    Returns {AP, AP50, AP75, AR}.
    """
    gts_by_image: Dict[int, List[Dict]] = {}
    for gt in ground_truth:
        gts_by_image.setdefault(int(gt["image_id"]), []).append(gt)
    dets_by_image: Dict[int, List[Dict]] = {}
    for det in detections:
        dets_by_image.setdefault(int(det["image_id"]), []).append(det)

    n_thr = len(OKS_THRESHOLDS)
    all_matches: List[Tuple[float, np.ndarray]] = []  # (score, tp[n_thr])
    total_gt = 0

    image_ids = set(gts_by_image) | set(dets_by_image)
    for image_id in image_ids:
        gts = gts_by_image.get(image_id, [])
        dets = sorted(dets_by_image.get(image_id, []),
                      key=lambda d: -d["score"])[:max_dets]
        total_gt += sum(0 if g.get("iscrowd") else 1 for g in gts)
        if not dets:
            continue
        gt_kps = [np.asarray(g["keypoints"], np.float32).reshape(-1, 3)
                  for g in gts]
        ious = np.zeros((len(dets), len(gts)))
        for di, det in enumerate(dets):
            dk = np.asarray(det["keypoints"], np.float32).reshape(-1, 3)
            for gi, gk in enumerate(gt_kps):
                ious[di, gi] = oks(dk, gk, float(gts[gi].get("area", 1.0)))
        tp = np.zeros((len(dets), n_thr))
        for ti, thr in enumerate(OKS_THRESHOLDS):
            taken = np.zeros(len(gts), bool)
            for di in range(len(dets)):
                best, best_gi = thr, -1
                for gi in range(len(gts)):
                    if taken[gi] or gts[gi].get("iscrowd"):
                        continue
                    if ious[di, gi] >= best:
                        best, best_gi = ious[di, gi], gi
                if best_gi >= 0:
                    taken[best_gi] = True
                    tp[di, ti] = 1.0
        for di, det in enumerate(dets):
            all_matches.append((float(det["score"]), tp[di]))

    if not all_matches or total_gt == 0:
        return {"AP": 0.0, "AP50": 0.0, "AP75": 0.0, "AR": 0.0}

    all_matches.sort(key=lambda m: -m[0])
    tps = np.stack([m[1] for m in all_matches])       # [D, n_thr]
    cum_tp = np.cumsum(tps, axis=0)
    recall = cum_tp / total_gt
    precision = cum_tp / np.arange(1, len(all_matches) + 1)[:, None]
    # 101-point interpolated AP per threshold (COCO protocol)
    aps = np.zeros(n_thr)
    for ti in range(n_thr):
        p = precision[:, ti].copy()
        for i in range(len(p) - 2, -1, -1):
            p[i] = max(p[i], p[i + 1])
        rc = recall[:, ti]
        ap = 0.0
        for r in np.linspace(0, 1, 101):
            idx = np.searchsorted(rc, r, side="left")
            ap += p[idx] if idx < len(p) else 0.0
        aps[ti] = ap / 101.0
    ar = recall[-1].mean()
    return {"AP": float(aps.mean()), "AP50": float(aps[0]),
            "AP75": float(aps[5]), "AR": float(ar)}


def evaluate_files(detections_json: str, annotations_json: str
                   ) -> Dict[str, float]:
    """detections: openpose_tpu --write_coco_json output;
    annotations: COCO person_keypoints_val*.json."""
    with open(detections_json) as f:
        dets = json.load(f)
    with open(annotations_json) as f:
        coco = json.load(f)
    gts = [a for a in coco["annotations"]
           if a.get("num_keypoints", 1) > 0]
    return evaluate(dets, gts)
