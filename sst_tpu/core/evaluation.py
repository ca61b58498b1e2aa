"""Detection evaluation: 3D / BEV average precision (numpy, vectorized).

Stand-in for the reference's eval stack (core/evaluation/kitti_utils/eval.py
numba KITTI protocol + the external Waymo C++ metric binary, SURVEY §2.15):
computes per-class AP at IoU thresholds with 40 recall positions — the
KITTI-protocol R40 metric — entirely in numpy so it runs anywhere. The
official Waymo/Argo metric adapters plug into the same interface when their
toolkits are available (they are not in this image).
"""

from __future__ import annotations

import numpy as np


def _np_rotate(xy, yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    return np.stack([xy[..., 0] * c + xy[..., 1] * s,
                     -xy[..., 0] * s + xy[..., 1] * c], -1)


def _bev_corners(boxes):
    norm = np.array([[-0.5, -0.5], [-0.5, 0.5], [0.5, 0.5], [0.5, -0.5]], np.float32)
    dims = boxes[:, None, 3:5] * norm[None]
    return _np_rotate(dims, boxes[:, None, 6:7][..., 0]) + boxes[:, None, :2]


def _poly_area(p):
    x, y = p[..., 0], p[..., 1]
    return 0.5 * np.abs(
        np.sum(x * np.roll(y, -1, axis=-1) - np.roll(x, -1, axis=-1) * y, axis=-1)
    )


def _clip_poly(poly, a, b):
    """Sutherland–Hodgman step (python, small N — eval only)."""
    out = []
    n = len(poly)
    for i in range(n):
        cur, nxt = poly[i], poly[(i + 1) % n]
        d = b - a
        side_c = d[0] * (cur[1] - a[1]) - d[1] * (cur[0] - a[0]) <= 0
        side_n = d[0] * (nxt[1] - a[1]) - d[1] * (nxt[0] - a[0]) <= 0
        if side_c:
            out.append(cur)
        if side_c != side_n:
            denom = d[0] * (nxt[1] - cur[1]) - d[1] * (nxt[0] - cur[0])
            if abs(denom) > 1e-12:
                t = (d[0] * (a[1] - cur[1]) - d[1] * (a[0] - cur[0])) / denom
                out.append(cur + t * (nxt - cur))
    return out


def rotated_iou_matrix(boxes_a, boxes_b, mode: str = "3d"):
    """[N, M] rotated IoU (exact polygon clipping, python loops — eval-scale)."""
    n, m = len(boxes_a), len(boxes_b)
    out = np.zeros((n, m), np.float32)
    if n == 0 or m == 0:
        return out
    ca, cb = _bev_corners(boxes_a), _bev_corners(boxes_b)
    area_a = boxes_a[:, 3] * boxes_a[:, 4]
    area_b = boxes_b[:, 3] * boxes_b[:, 4]
    for i in range(n):
        for j in range(m):
            # cheap reject
            if np.linalg.norm(boxes_a[i, :2] - boxes_b[j, :2]) > (
                np.hypot(boxes_a[i, 3], boxes_a[i, 4])
                + np.hypot(boxes_b[j, 3], boxes_b[j, 4])
            ) / 2:
                continue
            poly = list(ca[i])
            for e in range(4):
                poly = _clip_poly(poly, cb[j, e], cb[j, (e + 1) % 4])
                if not poly:
                    break
            if not poly:
                continue
            inter = _poly_area(np.asarray(poly)[None])[0]
            if mode == "bev":
                out[i, j] = inter / max(area_a[i] + area_b[j] - inter, 1e-6)
            else:
                za1, za2 = boxes_a[i, 2], boxes_a[i, 2] + boxes_a[i, 5]
                zb1, zb2 = boxes_b[j, 2], boxes_b[j, 2] + boxes_b[j, 5]
                ih = max(0.0, min(za2, zb2) - max(za1, zb1))
                iv = inter * ih
                va = area_a[i] * boxes_a[i, 5]
                vb = area_b[j] * boxes_b[j, 5]
                out[i, j] = iv / max(va + vb - iv, 1e-6)
    return out


def eval_ap(
    predictions: list[dict],
    ground_truths: list[dict],
    classes: list[str],
    iou_thresholds: dict | None = None,
    mode: str = "3d",
    num_recall_points: int = 40,
):
    """AP (R40) per class.

    predictions[i]: {'boxes': [N,7], 'scores': [N], 'labels': [N]}
    ground_truths[i]: {'boxes': [M,7], 'labels': [M]}
    """
    iou_thresholds = iou_thresholds or {
        "Car": 0.7, "Vehicle": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5
    }
    results = {}
    for ci, cname in enumerate(classes):
        thr = iou_thresholds.get(cname, 0.5)
        all_scores, all_tp = [], []
        total_gt = 0
        for pred, gt in zip(predictions, ground_truths):
            pm = pred["labels"] == ci
            gm = gt["labels"] == ci
            pb, ps = pred["boxes"][pm], pred["scores"][pm]
            gb = gt["boxes"][gm]
            total_gt += len(gb)
            if len(pb) == 0:
                continue
            order = np.argsort(-ps)
            pb, ps = pb[order], ps[order]
            iou = rotated_iou_matrix(pb, gb, mode)
            matched = np.zeros(len(gb), bool)
            tp = np.zeros(len(pb), bool)
            for i in range(len(pb)):
                if len(gb) == 0:
                    break
                j = int(np.argmax(np.where(matched, -1.0, iou[i])))
                if iou[i, j] >= thr and not matched[j]:
                    matched[j] = True
                    tp[i] = True
            all_scores.append(ps)
            all_tp.append(tp)
        if total_gt == 0 or not all_scores:
            results[cname] = 0.0
            continue
        scores = np.concatenate(all_scores)
        tps = np.concatenate(all_tp)
        order = np.argsort(-scores)
        tps = tps[order]
        cum_tp = np.cumsum(tps)
        recall = cum_tp / total_gt
        precision = cum_tp / (np.arange(len(tps)) + 1)
        # interpolated AP at R recall points
        ap = 0.0
        for r in np.linspace(0, 1, num_recall_points + 1)[1:]:
            prec = precision[recall >= r]
            ap += (prec.max() if len(prec) else 0.0) / num_recall_points
        results[cname] = float(ap)
    results["mAP"] = float(np.mean([results[c] for c in classes]))
    return results


def eval_ap_breakdowns(
    predictions: list[dict],
    ground_truths: list[dict],
    classes: list[str],
    range_breakdowns=((0.0, 30.0), (30.0, 50.0), (50.0, 1e9)),
    **kwargs,
):
    """Waymo-style range-bucketed AP (the metric binary's RANGE breakdowns,
    waymo_dataset.py:416-470 table) + an L2-proxy split: gts with fewer than
    5 interior points are the reference's LEVEL_2 bucket when point counts
    are available in ground_truths[i]['num_points'].

    Filters BOTH predictions and gts by BEV range per bucket, then runs the
    standard protocol. Returns {"OVERALL": {...}, "0-30m": {...}, ...}.
    """

    def _filter(frames, lo, hi, is_pred):
        out = []
        for fr in frames:
            r = np.linalg.norm(fr["boxes"][:, :2], axis=1) if len(fr["boxes"]) \
                else np.zeros(0)
            m = (r >= lo) & (r < hi)
            f = {"boxes": fr["boxes"][m], "labels": fr["labels"][m]}
            if is_pred:
                f["scores"] = fr["scores"][m]
            out.append(f)
        return out

    results = {"OVERALL": eval_ap(predictions, ground_truths, classes,
                                  **kwargs)}
    for lo, hi in range_breakdowns:
        name = f"{int(lo)}-{int(hi)}m" if hi < 1e8 else f"{int(lo)}m+"
        results[name] = eval_ap(
            _filter(predictions, lo, hi, True),
            _filter(ground_truths, lo, hi, False),
            classes, **kwargs,
        )
    if all("num_points" in gt for gt in ground_truths):
        hard = [
            {"boxes": gt["boxes"][gt["num_points"] < 5],
             "labels": gt["labels"][gt["num_points"] < 5]}
            for gt in ground_truths
        ]
        results["L2_proxy_hard"] = eval_ap(predictions, hard, classes,
                                           **kwargs)
    return results
