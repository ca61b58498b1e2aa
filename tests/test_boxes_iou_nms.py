"""Core box/IoU/NMS tests. Rotated IoU is validated against an independent
Monte-Carlo estimate plus exact closed-form cases."""

import jax.numpy as jnp
import numpy as np

from sst_tpu.core.boxes import (
    bev_corners,
    corners,
    gravity_center,
    limit_period,
    nearest_bev,
    points_in_boxes,
)
from sst_tpu.core.box_coders import delta_decode, delta_encode
from sst_tpu.core.iou import boxes_iou_3d, boxes_iou_bev, nearest_iou
from sst_tpu.core.nms import box3d_multiclass_nms, nms_bev, topk_presort


def box(x, y, z, w, l, h, yaw):
    return np.array([x, y, z, w, l, h, yaw], np.float32)


def test_corners_axis_aligned():
    b = jnp.asarray([box(1, 2, 0, 2, 4, 1, 0)])
    c = np.asarray(corners(b))[0]
    assert c.shape == (8, 3)
    np.testing.assert_allclose(sorted(set(np.round(c[:, 0], 5))), [0, 2])
    np.testing.assert_allclose(sorted(set(np.round(c[:, 1], 5))), [0, 4])
    np.testing.assert_allclose(sorted(set(np.round(c[:, 2], 5))), [0, 1])
    gc = np.asarray(gravity_center(b))[0]
    np.testing.assert_allclose(gc, [1, 2, 0.5])


def test_corners_rotation_sign():
    # mmdet3d-0.15 convention: x' = x cos + y sin, y' = -x sin + y cos.
    b = jnp.asarray([box(0, 0, 0, 2, 4, 1, np.pi / 2)])
    c = np.asarray(bev_corners(jnp.asarray([[0, 0, 2, 4, np.pi / 2]], jnp.float32)))[0]
    # a (w=2 along x, l=4 along y) box rotated 90° has extent 4 along x, 2 along y
    assert np.ptp(c[:, 0]) > 3.9 and np.ptp(c[:, 1]) < 2.1
    corner0 = c[0]  # local (-1, -2) -> rotated: x = -1*0 + -2*1 = -2, y = 1*1 + -2*0... check directly
    np.testing.assert_allclose(corner0, [-2.0, 1.0], atol=1e-5)


def _mc_iou(b1, b2, n=400000, seed=0):
    rng = np.random.RandomState(seed)
    lo = np.minimum(b1[:2] - 5, b2[:2] - 5)
    hi = np.maximum(b1[:2] + 5, b2[:2] + 5)
    pts = rng.uniform(lo, hi, size=(n, 2)).astype(np.float32)
    pts3 = np.concatenate([pts, np.full((n, 1), 0.5, np.float32)], -1)

    def inside(b):
        m = np.asarray(
            points_in_boxes(jnp.asarray(pts3), jnp.asarray(b[None]))
        )[:, 0]
        return m

    i1, i2 = inside(b1), inside(b2)
    inter = (i1 & i2).mean()
    union = (i1 | i2).mean()
    return inter / max(union, 1e-9)


def test_rotated_iou_exact_cases():
    a = jnp.asarray([box(0, 0, 0, 2, 2, 2, 0)])
    b = jnp.asarray([box(1, 0, 0, 2, 2, 2, 0)])
    iou = float(boxes_iou_bev(a, b)[0, 0])
    np.testing.assert_allclose(iou, 2 / 6, atol=1e-5)  # overlap 1x2 / union 6
    # identical boxes, arbitrary rotation
    c = jnp.asarray([box(3, -2, 0, 1.5, 3.2, 1, 0.7)])
    np.testing.assert_allclose(float(boxes_iou_bev(c, c)[0, 0]), 1.0, atol=1e-5)
    # 45° square on square: intersection is a regular octagon
    d = jnp.asarray([box(0, 0, 0, 2, 2, 2, np.pi / 4)])
    iou2 = float(boxes_iou_bev(a, d)[0, 0])
    inter = 8 * (np.sqrt(2) - 1)  # octagon area for unit half-width squares
    expect = inter / (4 + 4 - inter)
    np.testing.assert_allclose(iou2, expect, atol=1e-4)
    # disjoint
    e = jnp.asarray([box(10, 10, 0, 2, 2, 2, 0.3)])
    assert float(boxes_iou_bev(a, e)[0, 0]) == 0.0


def test_rotated_iou_monte_carlo(rng):
    boxes_a = []
    boxes_b = []
    for i in range(6):
        boxes_a.append(box(rng.uniform(-2, 2), rng.uniform(-2, 2), 0,
                           rng.uniform(1, 3), rng.uniform(1, 4), 2, rng.uniform(-np.pi, np.pi)))
        boxes_b.append(box(rng.uniform(-2, 2), rng.uniform(-2, 2), 0,
                           rng.uniform(1, 3), rng.uniform(1, 4), 2, rng.uniform(-np.pi, np.pi)))
    A, B = np.stack(boxes_a), np.stack(boxes_b)
    iou = np.asarray(boxes_iou_bev(jnp.asarray(A), jnp.asarray(B)))
    for i in range(6):
        ref = _mc_iou(A[i], B[i], seed=i)
        np.testing.assert_allclose(iou[i, i], ref, atol=0.02)


def test_iou3d_height():
    a = jnp.asarray([box(0, 0, 0, 2, 2, 2, 0)])
    b = jnp.asarray([box(0, 0, 1, 2, 2, 2, 0)])  # shifted up 1, overlap h=1
    iou = float(boxes_iou_3d(a, b)[0, 0])
    np.testing.assert_allclose(iou, 4.0 / 12.0, atol=1e-5)


def test_nearest_iou_matches_aligned():
    a = jnp.asarray([box(0, 0, 0, 2, 4, 1, 0)])
    b = jnp.asarray([box(0, 0, 0, 2, 4, 1, np.pi / 2)])  # ~90° → swapped dims
    v = float(nearest_iou(a, b)[0, 0])
    # aligned boxes: (2x4) vs swapped (4x2): inter 2x2=4, union 12
    np.testing.assert_allclose(v, 4 / 12, atol=1e-4)


def test_delta_coder_roundtrip(rng):
    anchors = np.abs(rng.randn(32, 7).astype(np.float32)) + 0.5
    gts = anchors + rng.randn(32, 7).astype(np.float32) * 0.1
    enc = delta_encode(jnp.asarray(anchors), jnp.asarray(gts))
    dec = delta_decode(jnp.asarray(anchors), enc)
    np.testing.assert_allclose(np.asarray(dec), gts, rtol=1e-4, atol=1e-4)


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray(
        [box(0, 0, 0, 2, 4, 1, 0.1), box(0.2, 0, 0, 2, 4, 1, 0.12),
         box(10, 10, 0, 2, 4, 1, 0.0), box(0.1, 0.1, 0, 2, 4, 1, 0.1)]
    )
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    keep = np.asarray(nms_bev(boxes, scores, jnp.ones(4, bool), 0.25))
    np.testing.assert_array_equal(keep, [True, False, True, False])


def test_nms_fixpoint_matches_sequential_greedy():
    """The Jacobi fixed-point sweep (core/nms.py _suppress_fixpoint) must
    equal the sequential greedy scan EXACTLY — including long suppression
    chains (A kills B, so B cannot kill C, so C survives, ...), the case
    where one Jacobi round alone is wrong."""
    from sst_tpu.core.nms import _greedy_suppress

    def numpy_greedy(iou, valid, thr):
        k = len(valid)
        keep = valid.copy()
        for i in range(k):
            if not keep[i]:
                continue
            for j in range(i + 1, k):
                if iou[i, j] > thr:
                    keep[j] = False
        return keep

    rs = np.random.RandomState(7)
    # random symmetric IoU matrices with heavy overlap
    for trial in range(5):
        k = 64
        m = rs.rand(k, k).astype(np.float32)
        iou = np.triu(m, 1) * (rs.rand(k, k) < 0.4)
        iou = iou + iou.T
        valid = rs.rand(k) < 0.9
        got = np.asarray(_greedy_suppress(
            jnp.asarray(iou), jnp.asarray(valid), 0.5))
        np.testing.assert_array_equal(got, numpy_greedy(iou, valid, 0.5))
    # adversarial chain: i suppresses i+1 only → keep alternates T,F,T,F...
    k = 33
    chain = np.zeros((k, k), np.float32)
    for i in range(k - 1):
        chain[i, i + 1] = chain[i + 1, i] = 0.9
    got = np.asarray(_greedy_suppress(
        jnp.asarray(chain), jnp.ones(k, bool), 0.5))
    np.testing.assert_array_equal(got, np.arange(k) % 2 == 0)


def test_multiclass_nms_shapes():
    n = 50
    rs = np.random.RandomState(1)
    boxes = jnp.asarray(
        np.concatenate(
            [rs.uniform(-20, 20, (n, 2)), np.zeros((n, 1)),
             rs.uniform(1, 4, (n, 3)), rs.uniform(-3, 3, (n, 1))], -1
        ).astype(np.float32)
    )
    scores = jnp.asarray(rs.rand(n, 3).astype(np.float32))
    out = box3d_multiclass_nms(
        boxes, scores, jnp.ones(n, bool), num_classes=3, score_thr=0.3,
        nms_thr=0.25, nms_pre=32, max_num=16,
    )
    assert out["boxes"].shape == (16, 7)
    assert out["labels"].shape == (16,)
    v = np.asarray(out["valid"])
    s = np.asarray(out["scores"])
    assert (s[v] > 0.3).all()
    # scores sorted descending among valid
    assert (np.diff(s[: v.sum()]) <= 1e-6).all()


def test_limit_period():
    v = jnp.asarray([0.1, np.pi + 0.1, -np.pi - 0.1, 3 * np.pi])
    out = np.asarray(limit_period(v))
    assert ((out >= -np.pi / 2 - 1e-6) & (out < np.pi / 2 + 1e-6)).all()
