"""Roi-major dynamic_point_pool vs brute force (reference
ops/dynamic_point_pool_op.py:12 semantics: all (roi, point) containment
pairs, trimmed to max_inbox_point per roi)."""

import jax.numpy as jnp
import numpy as np

from sst_tpu.models.fsd.roi_head import dynamic_point_pool


def brute_pairs(pts, pb, rois, rb, extra):
    pairs = set()
    for r in range(len(rois)):
        cx, cy, cz, w, l, h, yaw = rois[r]
        for n in range(len(pts)):
            if pb[n] != rb[r]:
                continue
            dx, dy = pts[n, 0] - cx, pts[n, 1] - cy
            lw = dx * np.cos(yaw) - dy * np.sin(yaw)
            ll = dx * np.sin(yaw) + dy * np.cos(yaw)
            lz = pts[n, 2] - (cz + h / 2)
            if (abs(lw) <= w / 2 + extra[0] and abs(ll) <= l / 2 + extra[1]
                    and abs(lz) <= h / 2 + extra[2]):
                pairs.add((r, n))
    return pairs


def test_pairing_matches_brute_force():
    rng = np.random.RandomState(3)
    n, r = 400, 12
    pts = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1, 2, n)
    pb = rng.randint(0, 2, n).astype(np.int32)
    rois = np.concatenate([
        rng.uniform(-8, 8, (r, 2)), rng.uniform(-0.5, 0.5, (r, 1)),
        rng.uniform(2, 5, (r, 3)), rng.uniform(-np.pi, np.pi, (r, 1)),
    ], -1).astype(np.float32)
    rb = rng.randint(0, 2, r).astype(np.int32)
    extra = (0.4, 0.4, 0.4)

    out = dynamic_point_pool(
        jnp.asarray(pts), jnp.ones((n,), bool), jnp.asarray(pb),
        jnp.asarray(rois), jnp.ones((r,), bool), jnp.asarray(rb),
        extra_wlh=extra, max_inbox_point=64, chunk=128,
    )
    got = set()
    idx = np.asarray(out["idx"])
    valid = np.asarray(out["valid"])
    for ri in range(r):
        for ki in range(64):
            if valid[ri, ki]:
                got.add((ri, int(idx[ri, ki])))
    want = brute_pairs(pts, pb, rois, rb, extra)
    assert got == want
    assert int(out["membership_overflow"]) == 0
    assert int(out["inbox_overflow"]) == 0

    # geometry: recompute one pair by hand
    if want:
        ri, ni = next(iter(got))
        ki = list(idx[ri]).index(ni)
        geo = np.asarray(out["geo"])[ri, ki]
        cx, cy, cz, w, l, h, yaw = rois[ri]
        dx, dy = pts[ni, 0] - cx, pts[ni, 1] - cy
        lw = dx * np.cos(yaw) - dy * np.sin(yaw)
        ll = dx * np.sin(yaw) + dy * np.cos(yaw)
        lz = pts[ni, 2] - (cz + h / 2)
        np.testing.assert_allclose(geo[:3], [ll, lw, lz], atol=1e-5)
        np.testing.assert_allclose(geo[10:], pts[ni] - rois[ri, :3], atol=1e-5)


def test_unbounded_multi_roi_membership():
    # one point inside 5 coincident enlarged rois reaches ALL 5 — per-point
    # pairing is uncapped (reference CUDA op pairs every containing roi)
    pts = np.zeros((8, 3), np.float32)
    pts[1:] += 50.0  # far away, inside nothing
    rois = np.tile(np.array([[0, 0, -1, 2, 2, 2, 0.0]], np.float32), (5, 1))
    rois[:, 0] += np.linspace(-0.1, 0.1, 5)  # overlapping, not identical
    out = dynamic_point_pool(
        jnp.asarray(pts), jnp.ones((8,), bool), jnp.zeros((8,), jnp.int32),
        jnp.asarray(rois), jnp.ones((5,), bool), jnp.zeros((5,), jnp.int32),
        extra_wlh=(0.5, 0.5, 0.5), max_inbox_point=8, chunk=8,
    )
    valid = np.asarray(out["valid"])
    idx = np.asarray(out["idx"])
    paired = {r for r in range(5) if (valid[r] & (idx[r] == 0)).any()}
    assert paired == set(range(5))
    assert int(out["membership_overflow"]) == 0
    assert int(out["inbox_overflow"]) == 0


def test_candidate_cap_overflow_counter():
    # 6 points inside one roi with max_paired_points=4: the 4 lowest-index
    # points pair; 2 candidate points are dropped and counted
    n = 8
    pts = np.zeros((n, 3), np.float32)
    pts[6:] += 50.0  # 2 points outside everything
    rois = np.array([[0, 0, -1, 4, 4, 4, 0.0]], np.float32)
    out = dynamic_point_pool(
        jnp.asarray(pts), jnp.ones((n,), bool), jnp.zeros((n,), jnp.int32),
        jnp.asarray(rois), jnp.ones((1,), bool), jnp.zeros((1,), jnp.int32),
        max_inbox_point=8, max_paired_points=4, chunk=8,
    )
    assert int(out["membership_overflow"]) == 2
    idx = np.asarray(out["idx"])
    valid = np.asarray(out["valid"])
    assert sorted(idx[0][valid[0]].tolist()) == [0, 1, 2, 3]


def test_per_roi_cap_keeps_first_points():
    # 100 points inside one roi, cap 16 → the 16 lowest point indices survive
    # and the dropped 84 pairs are visible in inbox_overflow (the reference
    # caps identically)
    n = 100
    pts = np.zeros((n, 3), np.float32)
    rois = np.array([[0, 0, -1, 4, 4, 4, 0.3]], np.float32)
    out = dynamic_point_pool(
        jnp.asarray(pts), jnp.ones((n,), bool), jnp.zeros((n,), jnp.int32),
        jnp.asarray(rois), jnp.ones((1,), bool), jnp.zeros((1,), jnp.int32),
        max_inbox_point=16, chunk=64,
    )
    assert np.asarray(out["valid"]).all()
    assert sorted(np.asarray(out["idx"])[0].tolist()) == list(range(16))
    assert int(out["inbox_overflow"]) == 84
