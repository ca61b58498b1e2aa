"""Rotated / nearest BEV IoU in pure XLA.

TPU-native equivalent of the reference CUDA ``iou3d_cuda`` extension
(/root/reference/mmdet3d/ops/iou3d/src/iou3d_kernel.cu:253-345 — rotated
rectangle overlap via polygon clipping) and the IoU calculators in
core/bbox/iou_calculators/iou3d_calculator.py.

Intersection of two rotated rectangles = Sutherland–Hodgman clip of one
4-gon by the other's 4 half-planes, with a static 8-vertex buffer (a convex
quadrilateral clipped by 4 half-planes has at most 8 vertices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sst_tpu.core.boxes import bev, bev_corners

_K = 8  # max vertices of rect∩rect


def _cross(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _clip_halfplane(poly, cnt, p1, p2):
    """Clip clockwise polygon (poly [K,2], cnt scalar) by directed edge p1→p2,
    keeping the right side (inside for clockwise winding)."""
    idx = jnp.arange(_K)
    nxt_idx = jnp.where(idx + 1 >= cnt, 0, idx + 1)
    cur = poly
    nxt = poly[nxt_idx]
    d = p2 - p1
    side_cur = _cross(d, cur - p1) <= 0.0
    side_nxt = _cross(d, nxt - p1) <= 0.0
    act = idx < cnt
    emit_cur = side_cur & act
    emit_int = (side_cur ^ side_nxt) & act
    denom = _cross(d, nxt - cur)
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t = _cross(d, p1 - cur) / denom
    inter = cur + t[:, None] * (nxt - cur)
    n_emit = emit_cur.astype(jnp.int32) + emit_int.astype(jnp.int32)
    pos0 = jnp.cumsum(n_emit) - n_emit
    new = jnp.zeros((_K, 2), poly.dtype)
    new = new.at[jnp.where(emit_cur, pos0, _K)].set(cur, mode="drop")
    new = new.at[jnp.where(emit_int, pos0 + emit_cur.astype(jnp.int32), _K)].set(
        inter, mode="drop"
    )
    return new, jnp.sum(n_emit)


def _rect_intersection_area(ca, cb):
    """Overlap area of two clockwise quads, ca/cb [4, 2]."""
    poly = jnp.zeros((_K, 2), ca.dtype).at[:4].set(ca)
    cnt = jnp.asarray(4, jnp.int32)
    for e in range(4):
        poly, cnt = _clip_halfplane(poly, cnt, cb[e], cb[(e + 1) % 4])
    idx = jnp.arange(_K)
    nxt_idx = jnp.where(idx + 1 >= cnt, 0, idx + 1)
    contrib = _cross(poly, poly[nxt_idx]) * (idx < cnt)
    return jnp.abs(0.5 * jnp.sum(contrib))


_pairwise_rect_area = jax.vmap(jax.vmap(_rect_intersection_area, (None, 0)), (0, None))


def bev_overlap(boxes_a, boxes_b):
    """[N, M] rotated BEV intersection areas. boxes are 7-dof rows."""
    ca = bev_corners(bev(boxes_a)).astype(jnp.float32)
    cb = bev_corners(bev(boxes_b)).astype(jnp.float32)
    return _pairwise_rect_area(ca, cb)


def boxes_iou_bev(boxes_a, boxes_b, eps: float = 1e-6):
    """[N, M] rotated BEV IoU (iou3d_utils.boxes_iou_bev)."""
    inter = bev_overlap(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return inter / jnp.maximum(area_a + area_b - inter, eps)


def boxes_iou_3d(boxes_a, boxes_b, eps: float = 1e-6):
    """[N, M] rotated 3D IoU with z-extent overlap
    (BboxOverlaps3D, iou3d_calculator.py)."""
    inter_bev = bev_overlap(boxes_a, boxes_b)
    za1, za2 = boxes_a[:, 2][:, None], (boxes_a[:, 2] + boxes_a[:, 5])[:, None]
    zb1, zb2 = boxes_b[:, 2][None, :], (boxes_b[:, 2] + boxes_b[:, 5])[None, :]
    inter_h = jnp.maximum(jnp.minimum(za2, zb2) - jnp.maximum(za1, zb1), 0.0)
    inter = inter_bev * inter_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter / jnp.maximum(vol_a + vol_b - inter, eps)


def _aligned_overlap_2d(xyxy_a, xyxy_b):
    lt = jnp.maximum(xyxy_a[:, None, :2], xyxy_b[None, :, :2])
    rb = jnp.minimum(xyxy_a[:, None, 2:], xyxy_b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


def nearest_iou(boxes_a, boxes_b, eps: float = 1e-6):
    """[N, M] axis-aligned nearest-BEV IoU (BboxOverlapsNearest3D) — the
    assignment metric for SST's Anchor3DHead (configs/_base_/models/sst_base.py)."""
    from sst_tpu.core.boxes import nearest_bev

    a = nearest_bev(boxes_a)
    b = nearest_bev(boxes_b)
    inter = _aligned_overlap_2d(a, b)
    area_a = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
    area_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[None, :]
    return inter / jnp.maximum(area_a + area_b - inter, eps)
