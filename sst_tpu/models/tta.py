"""Test-time augmentation: run the detector over flipped/rotated copies of a
frame, map detections back, and merge with weighted NMS.

Counterpart of the reference's aug_test plumbing
(/root/reference/mmdet3d/models/detectors/base.py:14-43 Base3DDetector
.forward_test + single_stage_fsd aug_test merging): the reference composes
MultiScaleFlipAug3D pipeline copies and box3d_multiclass_nms over the merged
set; here the augmentations are applied on-device around one jitted predict.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sst_tpu.core.boxes import flip_boxes, rotate_2d, rotate_boxes
from sst_tpu.core.nms import weighted_nms_bev


def _flip_points(points, axis: str):
    # boxes 'x' flip negates y (horizontal flip), 'y' flip negates x
    idx = 1 if axis == "x" else 0
    return points.at[..., idx].mul(-1.0)


def _aug_batch(batch, flip: str, angle: float):
    pts = batch.points
    if flip in ("x", "y"):
        pts = _flip_points(pts, flip)
    elif flip == "xy":
        pts = _flip_points(_flip_points(pts, "x"), "y")
    if angle:
        b, p, _ = pts.shape
        xy = rotate_2d(pts[..., :2].reshape(-1, 2),
                       jnp.full((b * p,), angle))
        pts = pts.at[..., :2].set(xy.reshape(b, p, 2))
    return batch.replace(points=pts)


def _invert_boxes(boxes, flip: str, angle: float):
    """Detections from the augmented frame → original frame."""
    if angle:
        boxes = rotate_boxes(boxes, -angle)
    if flip == "x":
        boxes = flip_boxes(boxes, "x")
    elif flip == "y":
        boxes = flip_boxes(boxes, "y")
    elif flip == "xy":
        boxes = flip_boxes(flip_boxes(boxes, "x"), "y")
    return boxes


def tta_predict(predict_fn, batch, flips=("none", "x", "y", "xy"),
                angles=(0.0,), wnms_thr_lo: float = 0.1,
                wnms_thr_hi: float = 0.55, max_num: int = 500):
    """Augmented inference + weighted-NMS merge.

    predict_fn(batch) -> dict(boxes [B,K,7+], scores, labels, valid).
    Returns the same schema with [B, max_num] rows.
    """
    all_boxes, all_scores, all_labels, all_valid = [], [], [], []
    for flip in flips:
        for angle in angles:
            if flip != "none" or angle:
                out = predict_fn(_aug_batch(batch, flip, angle))
                boxes = jnp.stack([
                    _invert_boxes(out["boxes"][i], flip, angle)
                    for i in range(out["boxes"].shape[0])
                ])
            else:
                out = predict_fn(batch)
                boxes = out["boxes"]
            all_boxes.append(boxes)
            all_scores.append(out["scores"])
            all_labels.append(out["labels"])
            all_valid.append(out["valid"])
    boxes = jnp.concatenate(all_boxes, axis=1)
    scores = jnp.concatenate(all_scores, axis=1)
    labels = jnp.concatenate(all_labels, axis=1)
    valid = jnp.concatenate(all_valid, axis=1)

    merged = {"boxes": [], "scores": [], "labels": [], "valid": []}
    for i in range(boxes.shape[0]):
        # class-aware merge: offset centers per label so weighted NMS never
        # mixes classes (single frame, so a large xy offset is safe)
        off = labels[i].astype(jnp.float32) * 1e4
        shifted = boxes[i, :, :7].at[:, 0].add(off)
        mboxes, mscores, keep = weighted_nms_bev(
            shifted, scores[i], valid[i], thr_lo=wnms_thr_lo,
            thr_hi=wnms_thr_hi,
        )
        mboxes = mboxes.at[:, 0].add(-off)
        s = jnp.where(keep, mscores, -jnp.inf)
        top, idx = jax.lax.top_k(s, min(max_num, s.shape[0]))
        merged["boxes"].append(mboxes[idx])
        merged["scores"].append(jnp.where(jnp.isfinite(top), top, 0.0))
        merged["labels"].append(labels[i][idx])
        merged["valid"].append(jnp.isfinite(top))
    return {k: jnp.stack(v) for k, v in merged.items()}
