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


def _np_cross(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _np_points_in_quad(pts, quad):
    """pts [..., P, 2] inside convex quad [..., 4, 2] (winding from
    _bev_corners) → [..., P] bool."""
    v1 = quad
    v2 = np.roll(quad, -1, axis=-2)
    d = v2 - v1
    rel = pts[..., :, None, :] - v1[..., None, :, :]  # [..., P, 4, 2]
    side = _np_cross(np.broadcast_to(d[..., None, :, :], rel.shape), rel)
    return (side <= 1e-8).all(axis=-1)


def rect_intersection_area_np(ca, cb):
    """Overlap area of quads ca/cb [..., 4, 2] — the same fully vectorized
    candidate-vertex + angular-sort + shoelace scheme as core/iou.py
    (no per-pair python; numpy on the whole [N, M] grid)."""
    a1, a2 = ca, np.roll(ca, -1, axis=-2)
    b1, b2 = cb, np.roll(cb, -1, axis=-2)
    d1, d2 = a2 - a1, b2 - b1

    A1 = a1[..., :, None, :]
    D1 = d1[..., :, None, :]
    B1 = b1[..., None, :, :]
    D2 = d2[..., None, :, :]
    denom = _np_cross(D1, D2)
    safe = np.where(np.abs(denom) < 1e-10, 1.0, denom)
    t = _np_cross(B1 - A1, D2) / safe
    s = _np_cross(B1 - A1, D1) / safe
    ok_int = (np.abs(denom) >= 1e-10) & (t >= 0) & (t <= 1) & (s >= 0) & (s <= 1)
    p_int = A1 + t[..., None] * D1  # [..., 4, 4, 2]

    lead = p_int.shape[:-3]
    cand = np.concatenate(
        [p_int.reshape(lead + (16, 2)),
         np.broadcast_to(ca, lead + (4, 2)),
         np.broadcast_to(cb, lead + (4, 2))], axis=-2,
    )  # [..., 24, 2]
    vmask = np.concatenate(
        [ok_int.reshape(lead + (16,)), _np_points_in_quad(ca, cb),
         _np_points_in_quad(cb, ca)], axis=-1,
    )  # [..., 24]

    cnt = vmask.sum(axis=-1)
    w = vmask[..., None].astype(cand.dtype)
    ctr = (cand * w).sum(axis=-2) / np.maximum(cnt, 1)[..., None]
    rel = cand - ctr[..., None, :]
    ang = np.where(vmask, np.arctan2(rel[..., 1], rel[..., 0]), np.inf)
    order = np.argsort(ang, axis=-1)
    sx = np.take_along_axis(cand[..., 0], order, axis=-1)
    sy = np.take_along_axis(cand[..., 1], order, axis=-1)
    live = np.arange(24) < np.maximum(cnt, 1)[..., None]
    sx = np.where(live, sx, sx[..., 0:1])
    sy = np.where(live, sy, sy[..., 0:1])
    contrib = sx * np.roll(sy, -1, axis=-1) - np.roll(sx, -1, axis=-1) * sy
    area = np.abs(0.5 * contrib.sum(axis=-1))
    return np.where(cnt >= 3, area, 0.0)


def rotated_iou_matrix(boxes_a, boxes_b, mode: str = "3d"):
    """[N, M] exact rotated IoU, vectorized numpy (replaces the round-1
    python double loop). mode '3d' adds the z-extent term, 'bev' is planar,
    'overlap' returns raw intersection area.

    A circumscribed-circle reject prunes the pair grid first; the exact
    candidate-vertex kernel (same scheme as core/iou.py) runs only on the
    surviving pairs, so dense eval matrices cost ~the number of real
    overlaps, not N*M."""
    boxes_a = np.asarray(boxes_a, np.float64)
    boxes_b = np.asarray(boxes_b, np.float64)
    n, m = len(boxes_a), len(boxes_b)
    out = np.zeros((n, m), np.float32)
    if n == 0 or m == 0:
        return out
    rad_a = 0.5 * np.hypot(boxes_a[:, 3], boxes_a[:, 4])
    rad_b = 0.5 * np.hypot(boxes_b[:, 3], boxes_b[:, 4])
    d2 = ((boxes_a[:, None, 0] - boxes_b[None, :, 0]) ** 2
          + (boxes_a[:, None, 1] - boxes_b[None, :, 1]) ** 2)
    near = d2 <= (rad_a[:, None] + rad_b[None, :]) ** 2
    ia, ib = np.nonzero(near)
    if len(ia) == 0:
        return out
    ca = _bev_corners(boxes_a[ia])
    cb = _bev_corners(boxes_b[ib])
    inter = rect_intersection_area_np(ca, cb)  # [K]
    area_a = boxes_a[ia, 3] * boxes_a[ia, 4]
    area_b = boxes_b[ib, 3] * boxes_b[ib, 4]
    if mode == "overlap":
        val = inter
    elif mode == "bev":
        val = inter / np.maximum(area_a + area_b - inter, 1e-6)
    else:
        za1, za2 = boxes_a[ia, 2], boxes_a[ia, 2] + boxes_a[ia, 5]
        zb1, zb2 = boxes_b[ib, 2], boxes_b[ib, 2] + boxes_b[ib, 5]
        ih = np.maximum(np.minimum(za2, zb2) - np.maximum(za1, zb1), 0.0)
        iv = inter * ih
        va = area_a * boxes_a[ia, 5]
        vb = area_b * boxes_b[ib, 5]
        val = iv / np.maximum(va + vb - iv, 1e-6)
    out[ia, ib] = val.astype(np.float32)
    return out


def greedy_match(iou, order, iou_thr, gt_eligible=None):
    """Exact sequential greedy matching: iterating predictions in ``order``,
    each takes its highest-IoU still-free eligible gt with IoU >= thr.
    Returns match[pred] = gt index or -1 (original index spaces).

    Vectorized fast path: predictions with no candidate gt never enter the
    python loop, so the loop length is bounded by the number of contended
    predictions (~#gt), not #predictions."""
    n, m = iou.shape
    match = np.full(n, -1, np.int64)
    if n == 0 or m == 0:
        return match
    elig = np.ones(m, bool) if gt_eligible is None else np.asarray(gt_eligible)
    has_cand = ((iou >= iou_thr) & elig[None, :]).any(axis=1)
    taken = ~elig
    for i in order:
        if not has_cand[i]:
            continue
        row = np.where(taken, -1.0, iou[i])
        j = int(np.argmax(row))
        if row[j] >= iou_thr:
            match[i] = j
            taken[j] = True
    return match


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
