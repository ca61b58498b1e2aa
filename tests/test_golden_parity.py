"""Golden numerical-parity tests for head losses and box coders against the
reference formulas, computed with INDEPENDENT torch/numpy reimplementations
transcribed from the cited reference code (VERDICT r03 item 6: 'golden
numerical-parity tests for head losses/decoders against reference formulas
with identical inputs').

Each `_ref_*` function is a fresh transcription of the reference math
(file:line cited), evaluated in float64 torch/numpy; the test compares the
repo's JAX implementation on the same random inputs.
"""

import numpy as np
import pytest
import torch


# ------------------------------------------------------------------ coders


def _ref_delta_encode(src, dst):
    """delta_xyzwhlr_bbox_coder.py:19-55 (torch, f64)."""
    xa, ya, za, wa, la, ha, ra = [src[:, i] for i in range(7)]
    xg, yg, zg, wg, lg, hg, rg = [dst[:, i] for i in range(7)]
    za = za + ha / 2
    zg = zg + hg / 2
    diagonal = torch.sqrt(la**2 + wa**2)
    out = torch.stack([
        (xg - xa) / diagonal, (yg - ya) / diagonal, (zg - za) / ha,
        torch.log(wg / wa), torch.log(lg / la), torch.log(hg / ha),
        rg - ra,
    ], dim=-1)
    if src.shape[1] > 7:
        out = torch.cat([out, dst[:, 7:] - src[:, 7:]], dim=-1)
    return out


def _ref_delta_decode(anchors, deltas):
    """delta_xyzwhlr_bbox_coder.py:57-90."""
    xa, ya, za, wa, la, ha, ra = [anchors[:, i] for i in range(7)]
    xt, yt, zt, wt, lt, ht, rt = [deltas[:, i] for i in range(7)]
    za = za + ha / 2
    diagonal = torch.sqrt(la**2 + wa**2)
    xg = xt * diagonal + xa
    yg = yt * diagonal + ya
    zg = zt * ha + za
    lg = torch.exp(lt) * la
    wg = torch.exp(wt) * wa
    hg = torch.exp(ht) * ha
    rg = rt + ra
    zg = zg - hg / 2
    out = torch.stack([xg, yg, zg, wg, lg, hg, rg], dim=-1)
    if deltas.shape[1] > 7:
        out = torch.cat([out, deltas[:, 7:] + anchors[:, 7:]], dim=-1)
    return out


def _rand_boxes(rng, n, extra=0):
    b = np.zeros((n, 7 + extra), np.float64)
    b[:, :3] = rng.uniform(-40, 40, (n, 3))
    b[:, 3:6] = rng.uniform(0.5, 6.0, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    if extra:
        b[:, 7:] = rng.randn(n, extra)
    return b


class TestDeltaCoderGolden:
    @pytest.mark.parametrize("extra", [0, 2])
    def test_encode_matches_reference(self, rng, extra):
        from sst_tpu.core.box_coders import delta_encode

        a = _rand_boxes(rng, 64, extra)
        g = _rand_boxes(rng, 64, extra)
        want = _ref_delta_encode(torch.from_numpy(a), torch.from_numpy(g))
        got = np.asarray(delta_encode(a.astype(np.float32),
                                      g.astype(np.float32)))
        np.testing.assert_allclose(got, want.numpy(), rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("extra", [0, 2])
    def test_decode_matches_reference(self, rng, extra):
        from sst_tpu.core.box_coders import delta_decode

        a = _rand_boxes(rng, 64, extra)
        d = np.clip(rng.randn(64, 7 + extra), -1.5, 1.5)
        want = _ref_delta_decode(torch.from_numpy(a), torch.from_numpy(d))
        got = np.asarray(delta_decode(a.astype(np.float32),
                                      d.astype(np.float32)))
        np.testing.assert_allclose(got, want.numpy(), rtol=2e-4, atol=2e-4)


def _ref_base_point_encode(bboxes, base_points):
    """base_point_bbox_coder.py:36-58 (EPS=1e-6, no scale — the
    /window_size_meter division is commented out in the reference)."""
    eps = 1e-6
    xyz = bboxes[:, :3]
    dims = bboxes[:, 3:6]
    yaw = bboxes[:, 6:7]
    log_dims = (dims + eps).log()
    delta = xyz - base_points
    out = torch.cat([delta, log_dims, yaw.sin(), yaw.cos()], dim=1)
    if bboxes.shape[1] > 7:
        out = torch.cat([out, bboxes[:, 7:9]], dim=1)
    return out


def _ref_base_point_decode(reg_preds, base_points):
    """base_point_bbox_coder.py:60-82."""
    eps = 1e-6
    velo = reg_preds[:, 8:] if reg_preds.shape[1] > 8 else None
    xyz = reg_preds[:, :3] + base_points
    dims = reg_preds[:, 3:6].exp() - eps
    yaw = torch.atan2(reg_preds[:, 6:7], reg_preds[:, 7:8])
    out = torch.cat([xyz, dims, yaw], dim=1)
    if velo is not None:
        out = torch.cat([out, velo], dim=1)
    return out


class TestBasePointCoderGolden:
    @pytest.mark.parametrize("extra", [0, 2])
    def test_encode(self, rng, extra):
        from sst_tpu.core.box_coders import base_point_encode

        g = _rand_boxes(rng, 64, extra)
        bp = rng.uniform(-40, 40, (64, 3))
        want = _ref_base_point_encode(
            torch.from_numpy(g), torch.from_numpy(bp)).numpy()
        got = np.asarray(base_point_encode(
            bp.astype(np.float32), g.astype(np.float32), scale=1.0))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("extra", [0, 2])
    def test_decode(self, rng, extra):
        from sst_tpu.core.box_coders import base_point_decode

        p = rng.randn(64, 8 + extra)
        p[:, 3:6] = np.clip(p[:, 3:6], -1.5, 1.5)
        bp = rng.uniform(-40, 40, (64, 3))
        want = _ref_base_point_decode(
            torch.from_numpy(p), torch.from_numpy(bp)).numpy()
        got = np.asarray(base_point_decode(
            bp.astype(np.float32), p.astype(np.float32), scale=1.0))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)

    def test_round_trip_any_scale(self, rng):
        from sst_tpu.core.box_coders import (
            base_point_decode,
            base_point_encode,
        )

        g = _rand_boxes(rng, 32).astype(np.float32)
        bp = rng.uniform(-40, 40, (32, 3)).astype(np.float32)
        dec = np.asarray(base_point_decode(
            bp, base_point_encode(bp, g, scale=4.0), scale=4.0))
        np.testing.assert_allclose(dec[:, :6], g[:, :6], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.sin(dec[:, 6]), np.sin(g[:, 6]),
                                   atol=1e-5)


# -------------------------------------------------------------- losses


def _ref_sigmoid_focal_loss(pred, target_onehot, gamma, alpha):
    """mmdet sigmoid focal loss core (focal_loss.py py_sigmoid_focal_loss
    math): pt = (1-p)*t + p*(1-t); w = (alpha*t + (1-alpha)*(1-t)) * pt^gamma;
    loss = BCE(pred, t) * w, summed over classes."""
    p = pred.sigmoid()
    t = target_onehot
    pt = (1 - p) * t + p * (1 - t)
    focal_weight = (alpha * t + (1 - alpha) * (1 - t)) * pt.pow(gamma)
    bce = torch.nn.functional.binary_cross_entropy_with_logits(
        pred, t, reduction="none")
    return (bce * focal_weight).sum(-1)


class TestFocalLossGolden:
    @pytest.mark.parametrize("gamma,alpha", [(2.0, 0.25), (3.0, 0.8)])
    def test_matches_mmdet(self, rng, gamma, alpha):
        from sst_tpu.core.losses import sigmoid_focal_loss

        n, c = 128, 3
        logits = rng.randn(n, c) * 3
        labels = rng.randint(0, c + 1, n)  # c = background → all-zero onehot
        onehot = np.eye(c + 1)[labels][:, :c]
        want_per = _ref_sigmoid_focal_loss(
            torch.from_numpy(logits), torch.from_numpy(onehot.astype(float)),
            gamma, alpha).numpy()
        weight = rng.rand(n)
        avg = 17.0
        want = float((want_per * weight).sum() / avg)
        got = float(sigmoid_focal_loss(
            logits.astype(np.float32), labels.astype(np.int32),
            weight=weight.astype(np.float32), gamma=gamma, alpha=alpha,
            avg_factor=avg))
        np.testing.assert_allclose(got, want, rtol=2e-5)


def _ref_gaussian_focal_loss(pred, gaussian_target, alpha=2.0, gamma=4.0):
    """mmdet GaussianFocalLoss (models/losses/gaussian_focal_loss.py):
    pos at gt==1, penalty-reduced negatives elsewhere."""
    eps = 1e-12
    pos_weights = gaussian_target.eq(1).float()
    neg_weights = (1 - gaussian_target).pow(gamma)
    pos_loss = -(pred + eps).log() * (1 - pred).pow(alpha) * pos_weights
    neg_loss = -(1 - pred + eps).log() * pred.pow(alpha) * neg_weights * (
        1 - pos_weights)
    return pos_loss + neg_loss


class TestGaussianFocalGolden:
    def test_matches_mmdet(self, rng):
        from sst_tpu.models.heads.center_head import gaussian_focal_loss

        hm = rng.rand(64, 64).astype(np.float64)
        hm[rng.rand(64, 64) > 0.9] = 1.0  # some exact-positive pixels
        pred = np.clip(rng.rand(64, 64), 1e-4, 1 - 1e-4)
        want = _ref_gaussian_focal_loss(
            torch.from_numpy(pred), torch.from_numpy(hm)).numpy()
        got = np.asarray(gaussian_focal_loss(
            pred.astype(np.float32), hm.astype(np.float32),
            (hm == 1.0).astype(np.float32)))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def _ref_gaussian_radius(h, w, min_overlap):
    """core/utils/gaussian.py:56-86 — note every root is (b+sq)/2, the
    upstream CornerNet quirk (NOT the textbook /2a)."""
    a1 = 1
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + np.sqrt(b1**2 - 4 * a1 * c1)) / 2
    a2 = 4
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    r2 = (b2 + np.sqrt(b2**2 - 4 * a2 * c2)) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    r3 = (b3 + np.sqrt(b3**2 - 4 * a3 * c3)) / 2
    return min(r1, r2, r3)


class TestGaussianRadiusGolden:
    @pytest.mark.parametrize("min_overlap", [0.1, 0.5])
    def test_matches_reference(self, rng, min_overlap):
        from sst_tpu.models.heads.center_head import gaussian_radius

        wl = rng.uniform(1.0, 30.0, (64, 2))
        want = np.array([
            _ref_gaussian_radius(w, l, min_overlap) for w, l in wl])
        got = np.asarray(gaussian_radius(
            wl.astype(np.float32), min_overlap))
        np.testing.assert_allclose(got, want, rtol=1e-4)


# ---------------------------------------------------------- corner loss


def _ref_corners_lidar(boxes):
    """LiDARInstance3DBoxes.corners (lidar_box3d.py:54-91): origin
    (0.5, 0.5, 0) unit-cube corners scaled by dims, rotated by yaw about z
    via rotation_3d_in_axis (utils.py:46-51 — the einsum contraction
    ``out_x = x cos + y sin, out_y = -x sin + y cos`` is a CLOCKWISE
    rotation for +yaw: the pre-v1.0 mmdet3d lidar yaw convention), shifted
    by the bottom-center position. Enumeration order differs from the
    repo's (pairing is order-invariant: both sides pair the SAME local
    corner)."""
    corners_norm = np.stack(np.unravel_index(
        np.arange(8), (2, 2, 2)), axis=1).astype(np.float64)
    corners_norm = corners_norm[[0, 1, 3, 2, 4, 5, 7, 6]]
    corners_norm = corners_norm - np.array([0.5, 0.5, 0.0])
    c = boxes[:, None, 3:6] * corners_norm[None]
    yaw = boxes[:, 6]
    cos, sin = np.cos(yaw), np.sin(yaw)
    x = c[..., 0] * cos[:, None] + c[..., 1] * sin[:, None]
    y = -c[..., 0] * sin[:, None] + c[..., 1] * cos[:, None]
    out = np.stack([x, y, c[..., 2]], axis=-1)
    return out + boxes[:, None, :3]


def _ref_corner_loss(pred, gt, delta=1.0):
    """sparse_cluster_head.py:216-248: min over gt yaw-flip of per-corner
    L2 distance, huber with delta, mean over the 8 corners."""
    pc = _ref_corners_lidar(pred)
    gc = _ref_corners_lidar(gt)
    gt_flip = gt.copy()
    gt_flip[:, 6] += np.pi
    gcf = _ref_corners_lidar(gt_flip)
    d = np.minimum(np.linalg.norm(pc - gc, axis=2),
                   np.linalg.norm(pc - gcf, axis=2))
    quadratic = np.clip(d, None, delta)
    linear = d - quadratic
    return (0.5 * quadratic**2 + delta * linear).mean(1)


def _corner_set_distance(a, b):
    """max over corners of min-distance — permutation-invariant equality."""
    d = np.linalg.norm(a[:, :, None, :] - b[:, None, :, :], axis=-1)
    return d.min(-1).max(-1)


class TestCornerLossGolden:
    def test_corner_sets_match_reference(self, rng):
        """The repo's corners() enumerates the same 8 physical corners as
        LiDARInstance3DBoxes.corners (set equality)."""
        from sst_tpu.core.boxes import corners

        b = _rand_boxes(rng, 32).astype(np.float32)
        mine = np.asarray(corners(b))
        ref = _ref_corners_lidar(b.astype(np.float64))
        assert _corner_set_distance(mine, ref).max() < 1e-3

    def test_corner_loss_value_matches(self, rng):
        """The RoI-head huber corner loss (roi_head.py:342-357 math) equals
        the reference get_corner_loss on the same decoded boxes. Pairing is
        by local corner id, so any consistent enumeration gives the same
        distances; verify numerically with the repo's corners()."""
        import jax.numpy as jnp

        from sst_tpu.core.boxes import corners

        pred = _rand_boxes(rng, 32).astype(np.float32)
        gt = pred.copy()
        gt[:, :3] += rng.randn(32, 3).astype(np.float32) * 0.3
        gt[:, 6] += rng.randn(32).astype(np.float32) * 0.4

        pc = corners(jnp.asarray(pred))
        gc = corners(jnp.asarray(gt))
        gcf = corners(jnp.asarray(gt).at[:, 6].add(np.pi))
        cd = jnp.minimum(jnp.linalg.norm(pc - gc, axis=-1),
                         jnp.linalg.norm(pc - gcf, axis=-1))
        huber = jnp.where(cd < 1.0, 0.5 * cd**2, cd - 0.5).mean(-1)

        want = _ref_corner_loss(pred.astype(np.float64),
                                gt.astype(np.float64))
        np.testing.assert_allclose(np.asarray(huber), want, rtol=1e-3,
                                   atol=1e-4)


# ------------------------------------------------- heatmap render parity


class TestHeatmapRenderGolden:
    def test_aligned_center_matches_reference_draw(self):
        """For a gt centered exactly on a pixel center, the dense
        max-of-gaussians render equals the reference draw_heatmap_gaussian
        (gaussian.py:24-53: integer grid, sigma = diameter/6) up to the
        radius float/int difference — use a box size whose radius is ~flat
        between truncations."""
        import jax.numpy as jnp

        from sst_tpu.models.heads.center_head import (
            CenterHead,
            gaussian_radius,
        )

        head = CenterHead(
            tasks=(("Car",),),
            class_names=("Car",),
            voxel_size=(1.0, 1.0, 6.0),
            point_cloud_range=(0.0, 0.0, -2.0, 16.0, 16.0, 4.0),
            out_size_factor=1,
            gaussian_overlap=0.1,
            min_radius=2,
        )
        # center on the pixel-center grid: pixel (8, 8) center = 8.5, 8.5
        w_m, l_m = 9.0, 7.0
        box = np.array([[8.5, 8.5, 0.0, w_m, l_m, 2.0, 0.0]], np.float32)
        hm, pos = head.heatmap_targets(
            (16, 16), jnp.asarray(box[None]),
            jnp.zeros((1, 1), jnp.int32), jnp.ones((1, 1), bool), 0)
        hm = np.asarray(hm)[0, :, :, 0]
        pos = np.asarray(pos)[0, :, :, 0]
        assert pos[8, 8] and pos.sum() == 1

        r_float = float(gaussian_radius(np.array([w_m, l_m]), 0.1))
        radius = max(int(r_float), 2)
        diameter = 2 * radius + 1
        sigma = diameter / 6.0
        ref = np.zeros((16, 16))
        for yy in range(16):
            for xx in range(16):
                d2 = (xx - 8) ** 2 + (yy - 8) ** 2
                if abs(xx - 8) <= radius and abs(yy - 8) <= radius:
                    ref[yy, xx] = np.exp(-d2 / (2 * sigma * sigma))
        assert abs(hm[8, 8] - 1.0) < 1e-5  # exact 1 at the center pixel
        # inside the reference's radius window the dense render matches the
        # scattered gaussian exactly (same int radius → same sigma)
        mask = ref > 0.01
        np.testing.assert_allclose(hm[mask], ref[mask], rtol=1e-4)
        # outside the window the dense render keeps the (tiny) tail the
        # reference truncates; it must stay below the in-window minimum
        assert hm[~mask].max() <= ref[mask].min() + 1e-6
