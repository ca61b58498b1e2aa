"""Rotated / nearest BEV IoU in pure XLA.

TPU-native equivalent of the reference CUDA ``iou3d_cuda`` extension
(/root/reference/mmdet3d/ops/iou3d/src/iou3d_kernel.cu:253-345) and the IoU
calculators in core/bbox/iou_calculators/iou3d_calculator.py.

Algorithm (Green's theorem, sort-free): the boundary of A∩B consists of the
sub-segments of A's edges inside B plus the sub-segments of B's edges inside
A.  Each sub-segment's line integral ½(x·dy − y·dx) is independent of every
other, so the area is a plain sum over the 8 edges — no vertex ordering, no
sort, no gather.  Clipping one edge against a convex quad is an interval
intersection on the edge parameter t (4 fused min/max ops).  This replaced
the CUDA-style 24-candidate + angular-sort formulation (the reference
kernel's approach, iou3d_kernel.cu:253-345): per-pair cost dropped ~6x on
TPU because the length-24 minor-axis sort dominated.

Shared-boundary double counting is avoided by an eps asymmetry: A's edges
are clipped to "inside B, boundary included", B's edges to "strictly inside
A", so a segment lying on both boundaries is counted exactly once (and two
identical boxes give exactly their own area).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sst_tpu.core.boxes import bev, bev_corners


def _cross(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _points_in_quad(pts, quad):
    """pts [..., P, 2] inside convex clockwise quad [..., 4, 2] → [..., P]."""
    v1 = quad  # [..., 4, 2]
    v2 = jnp.roll(quad, -1, axis=-2)
    d = v2 - v1  # [..., 4, 2]
    # clockwise winding ⇒ interior is on the right: cross(edge, p - v1) <= 0
    rel = pts[..., :, None, :] - v1[..., None, :, :]  # [..., P, 4, 2]
    side = _cross(jnp.broadcast_to(d[..., None, :, :], rel.shape), rel)
    return (side <= 1e-8).all(axis=-1)


def _clipped_edge_integrals(cp, cq, boundary_eps):
    """Σ over edges of clockwise quad P of ½-shoelace contributions of the
    edge portion inside clockwise quad Q.

    cp/cq: [..., 4, 2]. boundary_eps > 0 includes Q's boundary, < 0 excludes
    it (the tie-break that stops shared boundary segments counting twice).
    """
    a1 = cp
    d = jnp.roll(cp, -1, axis=-2) - a1  # [..., 4, 2] edge directions
    b1 = cq
    e = jnp.roll(cq, -1, axis=-2) - b1
    # half-plane h (from Q-edge): inside ⇔ cross(e_h, p - b1_h) <= eps.
    # Along edge p(t) = a1 + t d: side(t) = s0 + t sd, linear in t.
    rel = a1[..., :, None, :] - b1[..., None, :, :]  # [..., 4(P), 4(Q), 2]
    eh = e[..., None, :, :]
    s0 = _cross(eh, rel) - boundary_eps
    sd = _cross(eh, jnp.broadcast_to(d[..., :, None, :], rel.shape))
    flat = jnp.abs(sd) < 1e-9
    tcross = -s0 / jnp.where(flat, 1.0, sd)
    lo = jnp.where(~flat & (sd < 0), tcross, 0.0).max(axis=-1)
    hi = jnp.where(~flat & (sd > 0), tcross, 1.0)
    # sd ≈ 0: the whole edge is inside iff s0 <= 0, else fully clipped
    hi = jnp.where(flat & (s0 > 0), -1.0, hi).min(axis=-1)
    tlo = jnp.clip(lo, 0.0, 1.0)[..., None]
    thi = jnp.clip(hi, 0.0, 1.0)[..., None]
    pa = a1 + tlo * d
    pb = a1 + thi * d
    contrib = pa[..., 0] * pb[..., 1] - pb[..., 0] * pa[..., 1]
    return jnp.where(hi > lo, contrib, 0.0).sum(axis=-1)


def rect_intersection_area(ca, cb):
    """Overlap area of clockwise quads; ca/cb [..., 4, 2], broadcast over
    leading dims. Sort-free Green's-theorem formulation (see module doc)."""
    tot = (_clipped_edge_integrals(ca, cb, 1e-7)
           + _clipped_edge_integrals(cb, ca, -1e-7))
    return jnp.abs(0.5 * tot)


def bev_overlap(boxes_a, boxes_b):
    """[N, M] rotated BEV intersection areas. boxes are 7-dof rows."""
    ca = bev_corners(bev(boxes_a)).astype(jnp.float32)
    cb = bev_corners(bev(boxes_b)).astype(jnp.float32)
    return rect_intersection_area(ca[:, None], cb[None, :])


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


def boxes_overlap_1to1(boxes_a, boxes_b, mode: str = "iou", eps: float = 1e-6):
    """Row-paired rotated BEV overlap, [N] (TorchEx boxes_overlap_1to1 —
    FSD++ matches previous seeds to current detections with it,
    two_stage_fsdpp.py:918)."""
    ca = bev_corners(bev(boxes_a)).astype(jnp.float32)
    cb = bev_corners(bev(boxes_b)).astype(jnp.float32)
    inter = rect_intersection_area(ca, cb)
    area_a = boxes_a[:, 3] * boxes_a[:, 4]
    area_b = boxes_b[:, 3] * boxes_b[:, 4]
    if mode == "iof":
        return inter / jnp.maximum(area_a, eps)
    return inter / jnp.maximum(area_a + area_b - inter, eps)
