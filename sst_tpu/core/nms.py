"""Greedy rotated / nearest BEV NMS with static shapes.

TPU-native equivalent of the reference's iou3d CUDA NMS
(/root/reference/mmdet3d/ops/iou3d/iou3d_utils.py:31,106) and
``box3d_multiclass_nms`` (core/post_processing/box3d_nms.py:10).

The suppression loop runs over a statically-capped, score-sorted candidate
set: precompute the [K, K] IoU matrix once, then a fori_loop sweeps rows —
identical results to the 64-bit-mask CUDA kernel, MXU/VPU-friendly shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sst_tpu.core.iou import boxes_iou_bev, nearest_iou


def _suppress_fixpoint(sup: jax.Array, valid: jax.Array) -> jax.Array:
    """Exact greedy suppression via Jacobi fixed-point iteration.

    ``sup[i, j]`` = "box i, if kept, suppresses box j" (caller must make it
    strictly upper-triangular — rows are score-descending). The greedy
    sweep solves the triangular recurrence
        keep[j] = valid[j] & ~any_{i<j}(keep[i] & sup[i, j])
    by forward substitution — K sequential steps, ~6 us of TPU loop-step
    overhead each (~2.3 ms at K=1024, profiled on the flagship). The same
    unique solution is reached by Jacobi iteration from keep0 = valid:
    after t rounds every box whose suppression-DAG depth <= t is final, so
    it converges in (longest suppression chain + 1) rounds — typically
    3-6, each one a [K]x[K, K] bool matvec that the MXU does in ~us. The
    early-exit test is sound: a fixpoint of the update IS the (unique)
    solution of the triangular system."""
    k = sup.shape[0]
    supf = sup.astype(jnp.float32)

    def cond(c):
        it, keep, changed = c
        return changed & (it <= k)

    def body(c):
        it, keep, _ = c
        dead = (keep.astype(jnp.float32) @ supf) > 0.5
        new = valid & ~dead
        return it + 1, new, jnp.any(new != keep)

    _, keep, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), valid, jnp.bool_(True)))
    return keep


def _greedy_suppress(iou: jax.Array, valid: jax.Array, thr: float) -> jax.Array:
    """Greedy NMS keep-mask over a score-descending set (exact, see
    _suppress_fixpoint)."""
    k = iou.shape[0]
    later = jnp.arange(k)
    sup = (iou > thr) & (later[:, None] < later[None, :]) & valid[:, None]
    return _suppress_fixpoint(sup, valid)


def _pairwise_chunked(fn, boxes, chunk: int):
    """[K, K] pairwise matrix via lax.map over row chunks — bounds the live
    polygon-clipping intermediates to chunk*K instead of K*K."""
    k = boxes.shape[0]
    chunk = min(chunk, k)
    pad = (-k) % chunk
    rows = jnp.concatenate([boxes, jnp.zeros((pad, boxes.shape[1]), boxes.dtype)])
    rows = rows.reshape(-1, chunk, boxes.shape[1])
    out = jax.lax.map(lambda rb: fn(rb, boxes), rows)
    return out.reshape(-1, k)[:k]


@functools.partial(jax.jit, static_argnames=("use_rotate_nms", "chunk"))
def nms_bev(boxes, scores, valid, thr: float, use_rotate_nms: bool = True,
            chunk: int = 256):
    """NMS over score-sorted 7-dof boxes [K, 7]; returns keep mask [K].

    Caller must pass boxes already sorted by descending score (with padding
    rows masked via ``valid``); use :func:`topk_presort`.
    """
    fn = boxes_iou_bev if use_rotate_nms else nearest_iou
    iou = _pairwise_chunked(fn, boxes, chunk)
    return _greedy_suppress(iou, valid, thr)


def _greedy_suppress_mask(sup_mat: jax.Array, valid: jax.Array) -> jax.Array:
    """Greedy sweep where sup_mat[i, j] == True means "i suppresses j"."""
    k = sup_mat.shape[0]
    later = jnp.arange(k)
    sup = sup_mat & (later[:, None] < later[None, :]) & valid[:, None]
    return _suppress_fixpoint(sup, valid)


@functools.partial(jax.jit, static_argnames=())
def circle_nms(centers, scores, valid, thresh: float):
    """CenterPoint circular NMS (box3d_nms.py:294 numba kernel): suppress a
    center if a higher-scoring kept center lies within sqrt(thresh) BEV
    distance. Inputs must be score-sorted descending; returns keep mask."""
    d2 = jnp.sum(
        (centers[:, None, :2] - centers[None, :, :2]) ** 2, axis=-1
    )
    return _greedy_suppress_mask(d2 <= thresh, valid)


def aligned_3d_nms(boxes_xyzxyz, scores, classes, valid, thresh: float):
    """Axis-aligned 3D NMS (box3d_nms.py:243), class-gated; inputs
    score-sorted descending. boxes: [K, 6] (x1 y1 z1 x2 y2 z2)."""
    lt = jnp.maximum(boxes_xyzxyz[:, None, :3], boxes_xyzxyz[None, :, :3])
    rb = jnp.minimum(boxes_xyzxyz[:, None, 3:], boxes_xyzxyz[None, :, 3:])
    whd = jnp.maximum(rb - lt, 0.0)
    inter = whd.prod(-1)
    vol = jnp.prod(boxes_xyzxyz[:, 3:] - boxes_xyzxyz[:, :3], axis=-1)
    iou = inter / jnp.maximum(vol[:, None] + vol[None, :] - inter, 1e-6)
    iou = iou * (classes[:, None] == classes[None, :])
    return _greedy_suppress_mask(iou > thresh, valid)


@functools.partial(jax.jit, static_argnames=("use_rotate_nms", "chunk"))
def weighted_nms_bev(boxes, scores, valid, thr_lo: float, thr_hi: float,
                     use_rotate_nms: bool = True, chunk: int = 256):
    """Weighted NMS (box3d_multiclass_wnms box3d_nms.py:145, RangeDet's
    wnms_4c): greedy suppression at IoU > thr_lo; each kept box is replaced
    by the score-weighted average of all candidates with IoU > thr_hi
    (center/dims/z/h averaged directly, yaw via sin/cos). Returns
    (merged_boxes [K, 7], merged_scores, keep_mask)."""
    fn = boxes_iou_bev if use_rotate_nms else nearest_iou
    iou = _pairwise_chunked(fn, boxes, chunk)
    keep = _greedy_suppress(iou, valid, thr_lo)
    member = (iou > thr_hi) & valid[None, :]
    member = member | jnp.eye(iou.shape[0], dtype=bool)
    w = member * jnp.maximum(scores, 1e-6)[None, :]
    wsum = jnp.maximum(w.sum(-1, keepdims=True), 1e-6)
    lin = jnp.concatenate(
        [boxes[:, :6], jnp.sin(boxes[:, 6:7]), jnp.cos(boxes[:, 6:7])], -1
    )
    merged = (w @ lin) / wsum
    yaw = jnp.arctan2(merged[:, 6], merged[:, 7])
    out = jnp.concatenate([merged[:, :6], yaw[:, None]], -1)
    out = jnp.where(keep[:, None], out, boxes[:, :7])
    # re-score: score-weighted mean of member scores (RangeDet wnms_4c
    # returns the merged det's own confidence; the round-1 version passed
    # the pre-merge scores through)
    mscores = (w @ scores) / wsum[:, 0]
    mscores = jnp.where(keep, mscores, scores)
    return out, mscores, keep


def topk_presort(scores, valid, k: int):
    """Top-k indices by score among valid rows (padding scores → -inf)."""
    s = jnp.where(valid, scores, -jnp.inf)
    top_scores, idx = jax.lax.top_k(s, k)
    return idx, jnp.isfinite(top_scores)


@functools.partial(
    jax.jit, static_argnames=("max_num", "use_rotate_nms"),
)
def multiclass_nms_preselected(cand_boxes, cand_scores, sels, nms_thr: float,
                               max_num: int, use_rotate_nms: bool = True):
    """NMS over per-class preselected candidates.

    All classes run in ONE vmapped sweep: the greedy suppress loop is
    step-overhead-bound (~6 us/iter at K=1024), so C serial per-class loops
    cost ~Cx one batched loop. Callers that can select candidates cheaply
    (e.g. top-k on raw logits before box decode, anchor3d.py get_bboxes)
    enter here directly and skip the full-grid decode.

    Args: cand_boxes [C, K, D] score-descending per class; cand_scores
    [C, K]; sels [C, K] bool. Returns the padded [max_num] result dict.
    """
    c, k, _ = cand_boxes.shape
    fn = boxes_iou_bev if use_rotate_nms else nearest_iou
    iou = jax.vmap(lambda b: _pairwise_chunked(fn, b[:, :7], 256))(cand_boxes)
    keep = jax.vmap(lambda m, v: _greedy_suppress(m, v, nms_thr))(iou, sels)
    all_boxes = cand_boxes.reshape(c * k, -1)
    all_scores = jnp.where(keep, cand_scores, -jnp.inf).reshape(c * k)
    all_labels = jnp.repeat(jnp.arange(c, dtype=jnp.int32), k)
    all_valid = keep.reshape(c * k)
    top_scores, top_idx = jax.lax.top_k(all_scores, max_num)
    return {
        "boxes": all_boxes[top_idx],
        "scores": jnp.where(jnp.isfinite(top_scores), top_scores, 0.0),
        "labels": all_labels[top_idx],
        "valid": all_valid[top_idx] & jnp.isfinite(top_scores),
    }


@functools.partial(
    jax.jit,
    static_argnames=("num_classes", "nms_pre", "max_num", "use_rotate_nms",
                     "use_wnms"),
)
def box3d_multiclass_nms(
    boxes,
    scores,
    valid,
    num_classes: int,
    score_thr: float,
    nms_thr: float,
    nms_pre: int,
    max_num: int,
    use_rotate_nms: bool = True,
    use_wnms: bool = False,
    wnms_thr_lo: float = 0.1,
    wnms_thr_hi: float = 0.7,
):
    """Per-class NMS (box3d_nms.py:10) with static output size.

    Args:
      boxes: [N, 7+] decoded boxes (shared across classes, mmdet3d-style).
      scores: [N, num_classes] sigmoid class scores (no background column).
      valid: [N] bool.

    Returns dict with padded [max_num] results: boxes, scores, labels, valid.
    """
    if not use_wnms:
        k = min(nms_pre, boxes.shape[0])
        # unbatched per-class top_k (vmapped lax.top_k degrades to a full
        # variadic sort of the N rows per class), then one batched sweep
        sel = [topk_presort(scores[:, c], valid & (scores[:, c] > score_thr), k)
               for c in range(num_classes)]
        idxs = jnp.stack([s[0] for s in sel])  # [C, K]
        sels = jnp.stack([s[1] for s in sel])
        cand_boxes = boxes[idxs]  # [C, K, D]
        cand_scores = jnp.take_along_axis(
            jnp.swapaxes(scores, 0, 1), idxs, axis=1)
        return multiclass_nms_preselected(
            cand_boxes, cand_scores, sels, nms_thr, max_num, use_rotate_nms)

    out_boxes, out_scores, out_labels, out_valid = [], [], [], []
    for cls in range(num_classes):
        s = scores[:, cls]
        ok = valid & (s > score_thr)
        idx, sel_valid = topk_presort(s, ok, min(nms_pre, boxes.shape[0]))
        cand_boxes = boxes[idx]
        cand_scores = s[idx]
        if use_wnms:
            # weighted NMS (box3d_multiclass_wnms, box3d_nms.py:145)
            cand7, cand_scores, keep = weighted_nms_bev(
                cand_boxes[:, :7], cand_scores, sel_valid,
                thr_lo=wnms_thr_lo, thr_hi=wnms_thr_hi,
                use_rotate_nms=use_rotate_nms,
            )
            cand_boxes = jnp.concatenate([cand7, cand_boxes[:, 7:]], axis=-1)
        else:
            keep = nms_bev(cand_boxes, cand_scores, sel_valid, nms_thr,
                           use_rotate_nms)
        out_boxes.append(cand_boxes)
        out_scores.append(jnp.where(keep, cand_scores, -jnp.inf))
        out_labels.append(jnp.full_like(idx, cls))
        out_valid.append(keep)

    all_boxes = jnp.concatenate(out_boxes)
    all_scores = jnp.concatenate(out_scores)
    all_labels = jnp.concatenate(out_labels)
    all_valid = jnp.concatenate(out_valid)
    # global top max_num across classes
    top_scores, top_idx = jax.lax.top_k(all_scores, max_num)
    return {
        "boxes": all_boxes[top_idx],
        "scores": jnp.where(jnp.isfinite(top_scores), top_scores, 0.0),
        "labels": all_labels[top_idx],
        "valid": all_valid[top_idx] & jnp.isfinite(top_scores),
    }
