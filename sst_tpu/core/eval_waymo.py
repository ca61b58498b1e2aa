"""Self-contained Waymo Open Dataset detection metrics: L1/L2 mAP + mAPH.

Counterpart of the reference's external metric binary invocation
(mmdet3d/datasets/waymo_dataset.py:411-470 parses the
compute_detection_metrics_main table); this module computes the same table
shape — {Class}/L{1,2} mAP and mAPH keys plus Overall rows — in vectorized
numpy so a real number exists even without the Waymo C++ toolkit. The
official binary stays preferred when available (core/waymo_bin.py hook).

Protocol (per the Waymo OD metric definitions):
- difficulty: a gt is LEVEL_2 if labeler-marked difficulty==2 OR it has
  <= 5 lidar points; gts with 0 points are ignored entirely.
- the L1 metric scores only L1 gts (L2 gts are "ignore": predictions
  matched to them are dropped, not false positives); the L2 metric scores
  all non-empty gts.
- mAPH weights each true positive by (1 - |Δheading|/pi), Δheading wrapped
  into [-pi, pi]; the weight enters both the precision and recall
  numerators.
- AP integrates the monotone precision envelope over all recall points.

Deviation from the official implementation: matching is greedy in score
order (KITTI-style) rather than per-score-cutoff Hungarian; at realistic
NMS'd prediction densities the difference is well under the run-to-run
noise of training.
"""

from __future__ import annotations

import numpy as np

from sst_tpu.core.evaluation import rotated_iou_matrix

# repo class names (KITTI-format infos) → Waymo metric table names
_WAYMO_NAME = {"Car": "Vehicle", "Vehicle": "Vehicle",
               "Pedestrian": "Pedestrian", "Cyclist": "Cyclist",
               "Sign": "Sign"}

DEFAULT_IOU = {"Vehicle": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5,
               "Sign": 0.5}

RANGE_BREAKDOWNS = ((0.0, 30.0), (30.0, 50.0), (50.0, np.inf))


def _heading_weight(dyaw):
    d = np.abs(np.mod(np.abs(dyaw), 2 * np.pi))
    d = np.minimum(d, 2 * np.pi - d)
    return np.maximum(1.0 - d / np.pi, 0.0)


def _match_frame(pred_boxes, pred_scores, gt_boxes, gt_ignore, iou_thr):
    """Greedy score-ordered matching.

    Returns (scores, is_tp, hweight, pred_ignored) for this frame's
    predictions, and the number of counted (non-ignored) gts.
    """
    order = np.argsort(-pred_scores, kind="stable")
    pb, ps = pred_boxes[order], pred_scores[order]
    n, m = len(pb), len(gt_boxes)
    is_tp = np.zeros(n, bool)
    ignored = np.zeros(n, bool)
    hw = np.zeros(n, np.float32)
    if m:
        iou = rotated_iou_matrix(pb, gt_boxes, mode="3d")
        taken = np.zeros(m, bool)
        for i in range(n):
            row = np.where(taken, -1.0, iou[i])
            j = int(np.argmax(row))
            if row[j] < iou_thr:
                continue
            taken[j] = True
            if gt_ignore[j]:
                ignored[i] = True
            else:
                is_tp[i] = True
                hw[i] = _heading_weight(pb[i, 6] - gt_boxes[j, 6])
    keep = ~ignored
    return ps[keep], is_tp[keep], hw[keep], int((~gt_ignore).sum())


def _ap_from_matches(scores, tps, weights, total_gt):
    """(AP, APH) from pooled matches via the monotone precision envelope."""
    if total_gt == 0 or len(scores) == 0:
        return 0.0, 0.0
    order = np.argsort(-scores, kind="stable")
    tp = tps[order].astype(np.float64)
    w = weights[order].astype(np.float64)
    cum_tp = np.cumsum(tp)
    cum_w = np.cumsum(w)
    npred = np.arange(1, len(tp) + 1)
    recall = cum_tp / total_gt
    prec = cum_tp / npred
    recall_h = cum_w / total_gt
    prec_h = cum_w / npred

    def integrate(r, p):
        # monotone non-increasing precision envelope, then sum p * dr
        p_env = np.maximum.accumulate(p[::-1])[::-1]
        dr = np.diff(np.concatenate([[0.0], r]))
        return float(np.sum(p_env * dr))

    return integrate(recall, prec), integrate(recall_h, prec_h)


def _gt_flags(gt, level):
    """(use_mask, ignore_mask) over a frame's gts for an eval level."""
    m = len(gt["boxes"])
    num_pts = np.asarray(gt.get("num_points", np.full(m, 99)))
    labeled = np.asarray(gt.get("difficulty", np.zeros(m, np.int32)))
    empty = num_pts <= 0
    is_l2 = (labeled >= 2) | (num_pts <= 5)
    if level == 1:
        ignore = empty | is_l2
    else:
        ignore = empty
    return ignore


def waymo_eval(predictions, ground_truths, classes=("Car", "Pedestrian",
                                                    "Cyclist"),
               iou_thresholds=None, range_breakdowns=False):
    """predictions[i]: {'boxes': [N,7+], 'scores': [N], 'labels': [N]}
    ground_truths[i]: {'boxes': [M,7+], 'labels': [M],
                       'num_points': [M] (optional), 'difficulty': [M]
                       (optional labeler-marked, 2 = LEVEL_2)}

    Returns the reference's ap_dict key schema:
    '{WaymoName}/L{1,2} mAP[H]' + 'Overall/L{1,2} mAP[H]', and when
    range_breakdowns also '{WaymoName}/L2 mAP[H] [{lo}, {hi})'.
    """
    iou_thresholds = dict(DEFAULT_IOU, **(iou_thresholds or {}))
    out = {}
    for ci, cname in enumerate(classes):
        wname = _WAYMO_NAME.get(cname, cname)
        thr = iou_thresholds.get(wname, 0.5)
        for level in (1, 2):
            sc, tp, w, gt_count = [], [], [], 0
            for pred, gt in zip(predictions, ground_truths):
                pm = np.asarray(pred["labels"]) == ci
                gm = np.asarray(gt["labels"]) == ci
                gt_c = {k: np.asarray(v)[gm] for k, v in gt.items()
                        if k in ("boxes", "num_points", "difficulty")}
                gt_c.setdefault("boxes", np.zeros((0, 7)))
                ignore = _gt_flags(gt_c, level)
                s, t, hwt, cnt = _match_frame(
                    np.asarray(pred["boxes"])[pm],
                    np.asarray(pred["scores"])[pm],
                    gt_c["boxes"][:, :7], ignore, thr)
                sc.append(s)
                tp.append(t)
                w.append(hwt)
                gt_count += cnt
            ap, aph = _ap_from_matches(
                np.concatenate(sc) if sc else np.zeros(0),
                np.concatenate(tp) if tp else np.zeros(0, bool),
                np.concatenate(w) if w else np.zeros(0),
                gt_count)
            out[f"{wname}/L{level} mAP"] = round(100 * ap, 4)
            out[f"{wname}/L{level} mAPH"] = round(100 * aph, 4)

        if range_breakdowns:
            for lo, hi in RANGE_BREAKDOWNS:
                preds_r, gts_r = [], []
                for pred, gt in zip(predictions, ground_truths):
                    pr = np.linalg.norm(
                        np.asarray(pred["boxes"])[:, :2], axis=1) \
                        if len(pred["boxes"]) else np.zeros(0)
                    gr = np.linalg.norm(
                        np.asarray(gt["boxes"])[:, :2], axis=1) \
                        if len(gt["boxes"]) else np.zeros(0)
                    pmask = (pr >= lo) & (pr < hi)
                    gmask = (gr >= lo) & (gr < hi)
                    preds_r.append({
                        "boxes": np.asarray(pred["boxes"])[pmask],
                        "scores": np.asarray(pred["scores"])[pmask],
                        "labels": np.asarray(pred["labels"])[pmask]})
                    g = {"boxes": np.asarray(gt["boxes"])[gmask],
                         "labels": np.asarray(gt["labels"])[gmask]}
                    for k in ("num_points", "difficulty"):
                        if k in gt:
                            g[k] = np.asarray(gt[k])[gmask]
                    gts_r.append(g)
                sub = waymo_eval(preds_r, gts_r, classes=[cname],
                                 iou_thresholds=iou_thresholds)
                hi_s = "inf" if np.isinf(hi) else f"{int(hi)}"
                for level in (1, 2):
                    for met in ("mAP", "mAPH"):
                        out[f"{wname}/L{level} {met} [{int(lo)}, {hi_s})"] = \
                            sub[f"{wname}/L{level} {met}"]

    overall = [c for c in classes if _WAYMO_NAME.get(c, c) != "Sign"]
    for level in (1, 2):
        for met in ("mAP", "mAPH"):
            vals = [out[f"{_WAYMO_NAME.get(c, c)}/L{level} {met}"]
                    for c in overall]
            out[f"Overall/L{level} {met}"] = round(float(np.mean(vals)), 4) \
                if vals else 0.0
    return out
