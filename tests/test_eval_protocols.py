"""Golden-value tests for the official-protocol eval stack: vectorized
rotated IoU, Waymo L1/L2 mAP/mAPH."""

import numpy as np


def _box(x, y, yaw=0.0, wlh=(2.0, 4.0, 1.5), z=0.0):
    w, l, h = wlh
    return np.array([x, y, z, w, l, h, yaw], np.float32)


class TestRotatedIoU:
    def test_identity_and_disjoint(self):
        from sst_tpu.core.evaluation import rotated_iou_matrix

        a = np.stack([_box(0, 0), _box(10, 10, 0.3)])
        iou = rotated_iou_matrix(a, a, "bev")
        np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-5)
        assert iou[0, 1] == 0.0

    def test_known_overlap(self):
        from sst_tpu.core.evaluation import rotated_iou_matrix

        # two unit-square BEV boxes offset by 0.5 in x: inter 0.5, union 1.5
        a = _box(0, 0, wlh=(1, 1, 1))[None]
        b = _box(0.5, 0, wlh=(1, 1, 1))[None]
        np.testing.assert_allclose(
            rotated_iou_matrix(a, b, "bev")[0, 0], 0.5 / 1.5, atol=1e-5)
        # 45-degree rotated unit square on an identical axis-aligned one:
        # intersection is the octagon area 2*(sqrt(2)-1) ≈ 0.8284
        c = _box(0, 0, yaw=np.pi / 4, wlh=(1, 1, 1))[None]
        inter = 2 * (np.sqrt(2) - 1)
        np.testing.assert_allclose(
            rotated_iou_matrix(a, c, "bev")[0, 0], inter / (2 - inter),
            atol=1e-4)

    def test_3d_height_term(self):
        from sst_tpu.core.evaluation import rotated_iou_matrix

        a = _box(0, 0, wlh=(1, 1, 1), z=0.0)[None]
        b = _box(0, 0, wlh=(1, 1, 1), z=0.5)[None]  # half the height overlaps
        np.testing.assert_allclose(
            rotated_iou_matrix(a, b, "3d")[0, 0], 0.5 / 1.5, atol=1e-5)


class TestWaymoEval:
    def _frame(self, preds, gts):
        """preds: list of (box, score); gts: list of (box, num_points)."""
        p = dict(
            boxes=np.stack([b for b, _ in preds]) if preds else np.zeros((0, 7)),
            scores=np.array([s for _, s in preds], np.float32),
            labels=np.zeros(len(preds), np.int64),
        )
        g = dict(
            boxes=np.stack([b for b, _ in gts]) if gts else np.zeros((0, 7)),
            labels=np.zeros(len(gts), np.int64),
            num_points=np.array([n for _, n in gts], np.int64),
        )
        return p, g

    def test_perfect_predictions(self):
        from sst_tpu.core.eval_waymo import waymo_eval

        g1, g2 = _box(0, 0), _box(8, 3, 0.4)
        p, g = self._frame([(g1, 0.9), (g2, 0.8)], [(g1, 20), (g2, 20)])
        out = waymo_eval([p], [g], classes=("Car",))
        assert out["Vehicle/L1 mAP"] == 100.0
        assert out["Vehicle/L1 mAPH"] == 100.0
        assert out["Vehicle/L2 mAP"] == 100.0
        assert out["Overall/L2 mAPH"] == 100.0

    def test_l2_gt_is_ignored_at_l1(self):
        from sst_tpu.core.eval_waymo import waymo_eval

        easy, hard = _box(0, 0), _box(10, 0)
        # pred on the easy gt + pred on the 3-point (L2) gt + one FP
        p, g = self._frame(
            [(easy, 0.9), (hard, 0.8), (_box(30, 30), 0.7)],
            [(easy, 20), (hard, 3)])
        out = waymo_eval([p], [g], classes=("Car",))
        # L1: 1 counted gt; the hard-gt match is removed (not FP), the
        # far box is FP after full recall → precision envelope stays 1.0
        assert out["Vehicle/L1 mAP"] == 100.0
        # L2: both gts count, both recalled before the FP
        assert out["Vehicle/L2 mAP"] == 100.0

    def test_zero_point_gt_excluded(self):
        from sst_tpu.core.eval_waymo import waymo_eval

        seen, unseen = _box(0, 0), _box(10, 0)
        p, g = self._frame([(seen, 0.9)], [(seen, 20), (unseen, 0)])
        out = waymo_eval([p], [g], classes=("Car",))
        assert out["Vehicle/L2 mAP"] == 100.0  # 0-pt gt is not a miss

    def test_heading_penalty(self):
        from sst_tpu.core.eval_waymo import waymo_eval

        gt = _box(0, 0, yaw=0.0, wlh=(4, 4, 1.5))  # square: rotation-safe IoU
        pred = gt.copy()
        pred[6] = np.pi / 2  # heading off by 90°: weight 0.5
        p, g = self._frame([(pred, 0.9)], [(gt, 20)])
        out = waymo_eval([p], [g], classes=("Car",))
        assert out["Vehicle/L1 mAP"] == 100.0
        # APH: single TP with weight .5 → envelope .5 over recall [0, .5]
        np.testing.assert_allclose(out["Vehicle/L1 mAPH"], 25.0, atol=0.01)

    def test_heading_wraps(self):
        from sst_tpu.core.eval_waymo import waymo_eval

        gt = _box(0, 0, yaw=np.pi - 0.05)
        pred = gt.copy()
        pred[6] = -np.pi + 0.05  # true heading error 0.1, not 2pi-0.1
        p, g = self._frame([(pred, 0.9)], [(gt, 20)])
        out = waymo_eval([p], [g], classes=("Car",))
        w = 1 - 0.1 / np.pi
        np.testing.assert_allclose(
            out["Vehicle/L1 mAPH"], 100 * w * w, atol=0.05)

    def test_missed_gt_caps_recall(self):
        from sst_tpu.core.eval_waymo import waymo_eval

        g1, g2 = _box(0, 0), _box(10, 0)
        p, g = self._frame([(g1, 0.9)], [(g1, 20), (g2, 20)])
        out = waymo_eval([p], [g], classes=("Car",))
        # one of two gts recalled at precision 1 → AP 50
        np.testing.assert_allclose(out["Vehicle/L1 mAP"], 50.0, atol=0.01)

    def test_range_breakdowns(self):
        from sst_tpu.core.eval_waymo import waymo_eval

        near, far = _box(5, 0), _box(40, 0)
        p, g = self._frame([(near, 0.9)], [(near, 20), (far, 20)])
        out = waymo_eval([p], [g], classes=("Car",), range_breakdowns=True)
        assert out["Vehicle/L2 mAP [0, 30)"] == 100.0
        assert out["Vehicle/L2 mAP [30, 50)"] == 0.0


def _kitti_anno(rows, with_score=False):
    """rows: (name, x, z, ry, bbox_h, occ, trunc[, score]); camera frame,
    fixed car-ish dims."""
    n = len(rows)
    anno = dict(
        name=np.array([r[0] for r in rows]),
        location=np.array([[r[1], 1.7, r[2]] for r in rows], np.float32),
        dimensions=np.array([[4.0, 1.5, 1.8]] * n, np.float32),  # l, h, w
        rotation_y=np.array([r[3] for r in rows], np.float32),
        bbox=np.array([[100, 100, 140, 100 + r[4]] for r in rows],
                      np.float32),
        occluded=np.array([r[5] for r in rows], np.int32),
        truncated=np.array([r[6] for r in rows], np.float32),
    )
    if with_score:
        anno["score"] = np.array([r[7] for r in rows], np.float32)
    return anno


def _car_grid(n, name="Car", bbox_h=50, occ=0, trunc=0.0, score0=None,
              x_off=0.0):
    """n easy cars on a grid, optionally as detections with descending
    scores. R40 threshold sampling needs dense recall (>=41 positives) to
    fill its 41 slots — exactly like the official numba protocol."""
    rows = []
    for i in range(n):
        x, z = (i % 10) * 15.0 + x_off, (i // 10) * 15.0 + 10.0
        r = [name, x, z, 0.1 * (i % 5), bbox_h, occ, trunc]
        if score0 is not None:
            r.append(score0 - i * 0.01)
        rows.append(tuple(r))
    return rows


class TestKittiEval:
    def test_perfect(self):
        from sst_tpu.core.eval_kitti import kitti_eval

        gt = _kitti_anno(_car_grid(60))
        dt = _kitti_anno(_car_grid(60, score0=0.95), with_score=True)
        out = kitti_eval([gt], [dt])
        for d in ("easy", "moderate", "hard"):
            assert out[f"Car_3d_{d}_R40"] > 97.0  # 41-slot sampling of p=1
            assert out[f"Car_bev_{d}_R40"] > 97.0

    def test_difficulty_filtering(self):
        from sst_tpu.core.eval_kitti import kitti_eval

        easy = _car_grid(60)
        hard = _car_grid(20, bbox_h=30, occ=1, trunc=0.2, x_off=7.0)
        gt = _kitti_anno(easy + hard)
        # detect everything: hard matches must not become easy-level FPs
        dt = _kitti_anno(_car_grid(60, score0=0.95)
                         + _car_grid(20, bbox_h=30, x_off=7.0, score0=0.94),
                         with_score=True)
        out = kitti_eval([gt], [dt], eval_types=("3d",))
        assert out["Car_3d_easy_R40"] > 97.0
        assert out["Car_3d_moderate_R40"] > 97.0

        # miss all hard gts: easy unaffected, moderate drops to ~60/80
        dt1 = _kitti_anno(_car_grid(60, score0=0.95), with_score=True)
        out1 = kitti_eval([gt], [dt1], eval_types=("3d",))
        assert out1["Car_3d_easy_R40"] > 97.0
        assert out1["Car_3d_moderate_R40"] < 80.0

    def test_van_is_ignored_for_car(self):
        from sst_tpu.core.eval_kitti import kitti_eval

        gt_plain = _kitti_anno(_car_grid(60))
        dt_plain = _kitti_anno(_car_grid(60, score0=0.95), with_score=True)
        base = kitti_eval([gt_plain], [dt_plain], eval_types=("3d",))

        # add Van gts + Car detections on them: matches are neither TP nor
        # FP, so the score is unchanged
        gt = _kitti_anno(_car_grid(60) + _car_grid(10, name="Van", x_off=7.0))
        dt = _kitti_anno(_car_grid(60, score0=0.95)
                         + _car_grid(10, x_off=7.0, score0=0.99),
                         with_score=True)
        out = kitti_eval([gt], [dt], eval_types=("3d",))
        assert out["Car_3d_easy_R40"] == base["Car_3d_easy_R40"]

    def test_false_positive_hurts(self):
        from sst_tpu.core.eval_kitti import kitti_eval

        gt = _kitti_anno(_car_grid(60))
        base = kitti_eval(
            [gt], [_kitti_anno(_car_grid(60, score0=0.95), with_score=True)],
            eval_types=("3d",))
        # 30 high-scored FPs in empty space
        dt = _kitti_anno(_car_grid(60, score0=0.95)
                         + _car_grid(30, x_off=7.5, score0=0.99),
                         with_score=True)
        out = kitti_eval([gt], [dt], eval_types=("3d",))
        assert out["Car_3d_easy_R40"] < base["Car_3d_easy_R40"] - 20.0

    def test_camera_lidar_roundtrip(self):
        from sst_tpu.data.datasets import (
            camera_to_lidar_boxes,
            lidar_to_camera_annos,
        )

        rng = np.random.RandomState(2)
        rect = np.eye(4, dtype=np.float32)
        trv2c = np.eye(4, dtype=np.float32)
        # a real-ish extrinsic: rotate axes + translate
        trv2c[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]],
                                 np.float32)
        trv2c[:3, 3] = [0.1, -0.2, 0.3]
        annos = dict(
            location=rng.uniform(-10, 10, (5, 3)).astype(np.float32),
            dimensions=np.abs(rng.uniform(1, 4, (5, 3))).astype(np.float32),
            rotation_y=rng.uniform(-np.pi, np.pi, 5).astype(np.float32),
        )
        lidar = camera_to_lidar_boxes(annos, rect, trv2c)
        back = lidar_to_camera_annos(
            lidar, np.ones(5), np.zeros(5, np.int64), ("Car",),
            rect=rect, Trv2c=trv2c)
        np.testing.assert_allclose(back["location"], annos["location"],
                                   atol=1e-4)
        np.testing.assert_allclose(back["dimensions"], annos["dimensions"],
                                   atol=1e-5)
        dyaw = np.angle(np.exp(
            1j * (back["rotation_y"] - annos["rotation_y"])))
        assert np.abs(dyaw).max() < 1e-4


def _vel_box(x, y, yaw=0.0, vx=0.0, vy=0.0, wlh=(2.0, 4.0, 1.5)):
    w, l, h = wlh
    return np.array([x, y, 0.0, w, l, h, yaw, vx, vy], np.float32)


class TestNuscEval:
    def _frames(self, preds, gts, n_classes=2):
        p = dict(
            boxes=np.stack([b for b, _, _ in preds]) if preds
            else np.zeros((0, 9)),
            scores=np.array([s for _, s, _ in preds], np.float32),
            labels=np.array([c for _, _, c in preds], np.int64),
        )
        g = dict(
            boxes=np.stack([b for b, c in gts]) if gts else np.zeros((0, 9)),
            labels=np.array([c for _, c in gts], np.int64),
        )
        return [p], [g]

    def test_perfect(self):
        from sst_tpu.core.eval_nuscenes import nusc_eval

        boxes = [_vel_box(i * 10.0, 0, 0.2 * i, vx=1.0) for i in range(30)]
        preds = [(b, 0.9 - 0.001 * i, 0) for i, b in enumerate(boxes)]
        gts = [(b, 0) for b in boxes]
        p, g = self._frames(preds, gts)
        out = nusc_eval(p, g, classes=("car",))
        assert out["car_AP_dist_0.5"] > 0.98
        assert out["mATE"] < 1e-5 and out["mASE"] < 1e-5
        assert out["mAOE"] < 1e-5 and out["mAVE"] < 1e-5
        assert out["NDS"] > 0.99

    def test_translation_error_and_threshold_split(self):
        from sst_tpu.core.eval_nuscenes import nusc_eval

        gts = [(_vel_box(i * 15.0, 0), 0) for i in range(30)]
        # all predictions off by 1.2 m: misses the 0.5/1.0 thresholds,
        # matches at 2.0/4.0 with ATE 1.2
        preds = [(_vel_box(i * 15.0, 1.2), 0.9 - 0.001 * i, 0)
                 for i in range(30)]
        p, g = self._frames(preds, gts)
        out = nusc_eval(p, g, classes=("car",))
        assert out["car_AP_dist_0.5"] == 0.0
        assert out["car_AP_dist_1.0"] == 0.0
        assert out["car_AP_dist_2.0"] > 0.98
        np.testing.assert_allclose(out["mATE"], 1.2, atol=1e-4)

    def test_velocity_error(self):
        from sst_tpu.core.eval_nuscenes import nusc_eval

        gts = [(_vel_box(i * 15.0, 0, vx=2.0), 0) for i in range(20)]
        preds = [(_vel_box(i * 15.0, 0, vx=0.5), 0.9, 0) for i in range(20)]
        p, g = self._frames(preds, gts)
        out = nusc_eval(p, g, classes=("car",))
        np.testing.assert_allclose(out["mAVE"], 1.5, atol=1e-4)


class TestArgo2Eval:
    def test_perfect_and_cds(self):
        from sst_tpu.core.eval_argo2 import argo2_eval

        boxes = np.stack([_vel_box(i * 12.0, 0, 0.1 * i)[:7]
                          for i in range(30)])
        p = [dict(boxes=boxes, scores=np.linspace(0.9, 0.5, 30),
                  labels=np.zeros(30, np.int64))]
        g = [dict(boxes=boxes, labels=np.zeros(30, np.int64))]
        out = argo2_eval(p, g, classes=("Regular_vehicle",))
        assert out["mAP"] > 0.99
        assert out["mATE"] < 1e-5 and out["mASE"] < 1e-5
        assert out["CDS"] > 0.99

    def test_feather_roundtrip(self, tmp_path):
        import pandas as pd

        from sst_tpu.core.eval_argo2 import (
            format_results_feather,
            lidar_to_argo2_cuboids,
        )

        boxes = np.stack([_vel_box(1.0, 2.0, 0.3)[:7],
                          _vel_box(-4.0, 5.0, -1.2)[:7]])
        results = [dict(boxes_3d=boxes, scores_3d=np.array([0.9, 0.8]),
                        labels_3d=np.array([0, 1]))]
        infos = [dict(uuid="log-abc/1234567")]
        path = format_results_feather(
            results, infos, ("Regular_vehicle", "Pedestrian"),
            str(tmp_path / "dts"))
        df = pd.read_feather(path)
        assert len(df) == 2
        assert set(df["category"]) == {"REGULAR_VEHICLE", "PEDESTRIAN"}
        assert (df["log_id"] == "log-abc").all()
        cub = lidar_to_argo2_cuboids(boxes)
        # quaternion encodes -yaw - pi/2 about z
        want_yaw = -boxes[:, 6] - np.pi / 2
        got_yaw = 2 * np.arctan2(cub[:, 9], cub[:, 6])
        dyaw = np.angle(np.exp(1j * (got_yaw - want_yaw)))
        assert np.abs(dyaw).max() < 1e-6
        # gravity center z = bottom + h/2
        np.testing.assert_allclose(cub[:, 2],
                                   boxes[:, 2] + boxes[:, 5] / 2)


# ---------------------------------------------------------------- round 3
# matcher performance + greedy-vs-Hungarian deviation quantification


def _synthetic_val(n_frames, seed=0, n_gt=25, n_fp=8, det_rate=0.85):
    """Realistic-density synthetic val split: jittered-gt detections with
    noisy scores + random false positives."""
    rng = np.random.RandomState(seed)
    preds, gts = [], []
    for _ in range(n_frames):
        m = rng.randint(n_gt // 2, n_gt + 1)
        gb = np.concatenate([
            rng.uniform(-50, 50, (m, 2)), rng.uniform(-1, 1, (m, 1)),
            rng.uniform(1.5, 5, (m, 3)),
            rng.uniform(-np.pi, np.pi, (m, 1))], 1).astype(np.float32)
        gl = rng.randint(0, 3, m).astype(np.int64)
        npts = rng.randint(0, 50, m)
        det = rng.rand(m) < det_rate
        pb = gb[det].copy()
        pb[:, :2] += rng.normal(0, 0.2, (int(det.sum()), 2))
        pb[:, 6] += rng.normal(0, 0.1, int(det.sum()))
        psc = np.clip(rng.normal(0.8, 0.15, int(det.sum())), 0, 1)
        fb = np.concatenate([
            rng.uniform(-50, 50, (n_fp, 2)), rng.uniform(-1, 1, (n_fp, 1)),
            rng.uniform(1.5, 5, (n_fp, 3)),
            rng.uniform(-np.pi, np.pi, (n_fp, 1))], 1).astype(np.float32)
        fsc = np.clip(rng.normal(0.3, 0.15, n_fp), 0, 1)
        preds.append(dict(
            boxes=np.concatenate([pb, fb]),
            scores=np.concatenate([psc, fsc]).astype(np.float32),
            labels=np.concatenate([gl[det], rng.randint(0, 3, n_fp)])))
        gts.append(dict(boxes=gb, labels=gl, num_points=npts))
    return preds, gts


class TestMatcherPerformance:
    def test_10k_frames_under_one_minute(self):
        """VERDICT r2 next-#7 done criterion: 10k-frame synthetic val in
        < 1 min (the round-2 per-prediction python loop took hours)."""
        import time

        from sst_tpu.core.eval_waymo import waymo_eval

        preds, gts = _synthetic_val(10000)
        t0 = time.time()
        out = waymo_eval(preds, gts)
        dt = time.time() - t0
        assert dt < 60.0, f"10k-frame eval took {dt:.1f}s"
        assert out["Overall/L2 mAPH"] > 50.0  # sanity: matches happened

    def test_greedy_match_exactness(self):
        """greedy_match == the plain sequential greedy reference loop."""
        from sst_tpu.core.evaluation import greedy_match

        rng = np.random.RandomState(7)
        for _ in range(50):
            n, m = rng.randint(1, 30), rng.randint(0, 15)
            iou = rng.rand(n, m).astype(np.float32)
            iou[iou < 0.5] = 0.0
            order = rng.permutation(n)
            elig = rng.rand(m) < 0.8
            got = greedy_match(iou, order, 0.5, elig)
            want = np.full(n, -1, np.int64)
            taken = np.zeros(m, bool)
            for i in order:
                best, bj = -1.0, -1
                for j in range(m):
                    if taken[j] or not elig[j]:
                        continue
                    if iou[i, j] > best:
                        best, bj = iou[i, j], j
                if bj >= 0 and best >= 0.5:
                    want[i] = bj
                    taken[bj] = True
            np.testing.assert_array_equal(got, want)


class TestGreedyVsHungarian:
    def test_deviation_under_training_noise(self):
        """Quantifies the documented greedy-matching deviation: on a
        300-frame realistic synthetic val, |greedy − Hungarian| is ~0.15
        mAPH points (run-to-run training noise on Waymo is ~±0.3)."""
        from sst_tpu.core.eval_waymo import waymo_eval

        preds, gts = _synthetic_val(300, seed=1)
        g = waymo_eval(preds, gts)
        h = waymo_eval(preds, gts, matcher="hungarian")
        for key in ("Overall/L1 mAP", "Overall/L1 mAPH",
                    "Overall/L2 mAP", "Overall/L2 mAPH"):
            delta = abs(g[key] - h[key])
            assert delta < 0.5, f"{key}: greedy {g[key]} vs hung {h[key]}"


class TestBinaryStdoutParser:
    STDOUT = """
OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1: [mAP 0.713284] [mAPH 0.705106]
OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2: [mAP 0.632087] [mAPH 0.624787]
OBJECT_TYPE_TYPE_PEDESTRIAN_LEVEL_1: [mAP 0.800114] [mAPH 0.716605]
OBJECT_TYPE_TYPE_PEDESTRIAN_LEVEL_2: [mAP 0.716643] [mAPH 0.640034]
OBJECT_TYPE_TYPE_SIGN_LEVEL_1: [mAP 0] [mAPH 0]
OBJECT_TYPE_TYPE_SIGN_LEVEL_2: [mAP 0] [mAPH 0]
OBJECT_TYPE_TYPE_CYCLIST_LEVEL_1: [mAP 0.707153] [mAPH 0.680098]
OBJECT_TYPE_TYPE_CYCLIST_LEVEL_2: [mAP 0.680137] [mAPH 0.654117]
RANGE_TYPE_VEHICLE_[0, 30)_LEVEL_1: [mAP 0.912] [mAPH 0.905]
RANGE_TYPE_VEHICLE_[30, 50)_LEVEL_2: [mAP 0.6] [mAPH 0.59]
RANGE_TYPE_VEHICLE_[50, INF)_LEVEL_2: [mAP 0.41] [mAPH 0.4]
"""

    def test_parses_object_type_table(self):
        from sst_tpu.core.eval_waymo import parse_metrics_stdout

        out = parse_metrics_stdout(self.STDOUT)
        assert out["Vehicle/L1 mAP"] == 71.3284
        assert out["Vehicle/L2 mAPH"] == 62.4787
        assert out["Pedestrian/L1 mAPH"] == 71.6605
        assert out["Cyclist/L2 mAP"] == 68.0137
        assert out["Sign/L1 mAP"] == 0.0
        # Overall = mean of Veh/Ped/Cyc, Sign excluded (reference :449-461)
        want = round((71.3284 + 80.0114 + 70.7153) / 3, 4)
        assert out["Overall/L1 mAP"] == want

    def test_parses_range_breakdowns(self):
        from sst_tpu.core.eval_waymo import parse_metrics_stdout

        out = parse_metrics_stdout(self.STDOUT)
        assert out["Vehicle/L1 mAP [0, 30)"] == 91.2
        assert out["Vehicle/L2 mAPH [30, 50)"] == 59.0
        assert out["Vehicle/L2 mAP [50, inf)"] == 41.0
