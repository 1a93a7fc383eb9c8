"""Scalar oracle for COCO keypoint AP: a deliberate, line-faithful
transcription of the published pycocotools.cocoeval algorithm (COCOeval with
iouType='keypoints', areaRng 'all', maxDets [20]) — pycocotools itself is not
installable in this environment, so this transcription is the ground truth
the production evaluator (openpose_tpu/io/coco_eval.py) is validated against.
Test-only code, mirroring structure over elegance on purpose (compare
tests/oracle.py for the kernel oracles).

Source algorithm: cocodataset/cocoapi PythonAPI/pycocotools/cocoeval.py
(computeOks, evaluateImg, accumulate).
"""

import numpy as np

SIGMAS = np.array([
    .026, .025, .025, .035, .035, .079, .079, .072, .072, .062, .062,
    .107, .107, .087, .087, .089, .089])
IOU_THRS = np.arange(0.5, 1.0, 0.05)
REC_THRS = np.linspace(0.0, 1.0, 101)


def _compute_oks(dts, gts):
    """ious[d, g] — dts already sorted by -score and truncated to maxDets."""
    if len(gts) == 0 or len(dts) == 0:
        return np.zeros((0, 0))
    ious = np.zeros((len(dts), len(gts)))
    variances = (SIGMAS * 2) ** 2
    k = len(SIGMAS)
    for j, gt in enumerate(gts):
        g = np.array(gt["keypoints"], dtype=np.float64)
        xg, yg, vg = g[0::3], g[1::3], g[2::3]
        k1 = np.count_nonzero(vg > 0)
        bb = gt["bbox"]
        x0, x1 = bb[0] - bb[2], bb[0] + bb[2] * 2
        y0, y1 = bb[1] - bb[3], bb[1] + bb[3] * 2
        for i, dt in enumerate(dts):
            d = np.array(dt["keypoints"], dtype=np.float64)
            xd, yd = d[0::3], d[1::3]
            if k1 > 0:
                dx = xd - xg
                dy = yd - yg
            else:
                z = np.zeros(k)
                dx = np.max((z, x0 - xd), axis=0) + np.max((z, xd - x1),
                                                           axis=0)
                dy = np.max((z, y0 - yd), axis=0) + np.max((z, yd - y1),
                                                           axis=0)
            e = (dx ** 2 + dy ** 2) / variances \
                / (gt["area"] + np.spacing(1)) / 2
            if k1 > 0:
                e = e[vg > 0]
            ious[i, j] = np.sum(np.exp(-e)) / e.shape[0]
    return ious


def _evaluate_img(gts, dts, max_det):
    """One image -> dict like pycocotools evaluateImg (areaRng = all)."""
    if len(gts) == 0 and len(dts) == 0:
        return None
    for g in gts:
        g["_ignore"] = 1 if g.get("ignore") else 0
    gtind = np.argsort([g["_ignore"] for g in gts], kind="mergesort")
    gts = [gts[i] for i in gtind]
    dtind = np.argsort([-d["score"] for d in dts], kind="mergesort")
    dts = [dts[i] for i in dtind[0:max_det]]
    iscrowd = [int(g.get("iscrowd", 0)) for g in gts]
    ious = _compute_oks(dts, gts)

    T, G, D = len(IOU_THRS), len(gts), len(dts)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gt_ig = np.array([g["_ignore"] for g in gts])
    dt_ig = np.zeros((T, D))
    if ious.size:
        for tind, t in enumerate(IOU_THRS):
            for dind, d in enumerate(dts):
                iou = min([t, 1 - 1e-10])
                m = -1
                for gind, g in enumerate(gts):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                        break
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dt_ig[tind, dind] = gt_ig[m]
                dtm[tind, dind] = m + 1          # gt id stand-in (nonzero)
                gtm[tind, m] = dind + 1
    return {"dtScores": [d["score"] for d in dts],
            "dtMatches": dtm, "dtIgnore": dt_ig, "gtIgnore": gt_ig}


def coco_ap_oracle(detections, ground_truth, max_dets=20):
    """pycocotools-equivalent {AP, AP50, AP75, AR} for person keypoints.

    ground_truth dicts: image_id, keypoints (3K), area; optional iscrowd,
    bbox, num_keypoints, ignore.  Gt 'ignore' is derived as in
    COCOeval._prepare: ignore flag or num_keypoints == 0 (iscrowd implies
    num_keypoints == 0 in real COCO data; treated as ignore here too).
    """
    gts_img, dts_img = {}, {}
    for gt in ground_truth:
        g = dict(gt)
        kp = np.array(g["keypoints"], dtype=np.float64).reshape(-1, 3)
        nk = g.get("num_keypoints", int(np.count_nonzero(kp[:, 2] > 0)))
        g["ignore"] = int(bool(g.get("ignore", 0)) or nk == 0
                          or g.get("iscrowd", 0) == 1)
        if "bbox" not in g:
            vis = kp[:, 2] > 0
            if vis.any():
                x0, y0 = kp[vis, 0].min(), kp[vis, 1].min()
                g["bbox"] = [x0, y0, kp[vis, 0].max() - x0,
                             kp[vis, 1].max() - y0]
            else:
                g["bbox"] = [0.0, 0.0, 0.0, 0.0]
        gts_img.setdefault(int(g["image_id"]), []).append(g)
    for dt in detections:
        dts_img.setdefault(int(dt["image_id"]), []).append(dict(dt))

    img_ids = sorted(set(gts_img) | set(dts_img))
    evals = [_evaluate_img(gts_img.get(i, []), dts_img.get(i, []), max_dets)
             for i in img_ids]
    evals = [e for e in evals if e is not None]
    if not evals:
        return {"AP": 0.0, "AP50": 0.0, "AP75": 0.0, "AR": 0.0}

    # accumulate()
    T, R = len(IOU_THRS), len(REC_THRS)
    dt_scores = np.concatenate([e["dtScores"] for e in evals])
    inds = np.argsort(-dt_scores, kind="mergesort")
    dtm = np.concatenate([e["dtMatches"] for e in evals], axis=1)[:, inds]
    dt_ig = np.concatenate([e["dtIgnore"] for e in evals], axis=1)[:, inds]
    gt_ig = np.concatenate([e["gtIgnore"] for e in evals])
    npig = np.count_nonzero(gt_ig == 0)
    if npig == 0:
        return {"AP": 0.0, "AP50": 0.0, "AP75": 0.0, "AR": 0.0}
    tps = np.logical_and(dtm, np.logical_not(dt_ig))
    fps = np.logical_and(np.logical_not(dtm), np.logical_not(dt_ig))
    tp_sum = np.cumsum(tps, axis=1).astype(dtype=np.float64)
    fp_sum = np.cumsum(fps, axis=1).astype(dtype=np.float64)
    precision = -np.ones((T, R))
    recall = -np.ones(T)
    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
        nd = len(tp)
        rc = tp / npig
        pr = tp / (fp + tp + np.spacing(1))
        q = np.zeros(R)
        recall[t] = rc[-1] if nd else 0
        pr = pr.tolist()
        for i in range(nd - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        inds_r = np.searchsorted(rc, REC_THRS, side="left")
        for ri, pi in enumerate(inds_r):
            if pi < nd:
                q[ri] = pr[pi]
        precision[t] = q
    return {"AP": float(np.mean(precision)),
            "AP50": float(np.mean(precision[0])),
            "AP75": float(np.mean(precision[5])),
            "AR": float(np.mean(recall))}
