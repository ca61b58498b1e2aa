"""Data pipeline + loader + evaluation tests."""

import numpy as np

from sst_tpu.core.evaluation import eval_ap, rotated_iou_matrix
from sst_tpu.data.datasets import SyntheticDataset
from sst_tpu.data.loader import DataLoader
from sst_tpu.data.pipelines import build_pipeline


PCR = (-20, -20, -2, 20, 20, 4)


def make_ds(n=8):
    return SyntheticDataset(
        num_samples=n, num_points=2048, num_objects=6, pc_range=PCR,
        pipeline=build_pipeline([
            dict(type="RandomFlip3D"),
            dict(type="GlobalRotScaleTrans"),
            dict(type="PointsRangeFilter", point_cloud_range=PCR),
            dict(type="ObjectRangeFilter", point_cloud_range=PCR),
            dict(type="PointShuffle"),
            dict(type="PadToCap", max_points=2048, max_gt=16),
        ]),
    )


def test_pipeline_and_loader_shapes():
    ds = make_ds()
    loader = DataLoader(ds, batch_size=4, num_workers=2, shuffle=True)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b.points.shape == (4, 2048, 5)
    assert b.valid.shape == (4, 2048)
    assert b.gt_boxes.shape == (4, 16, 7)
    # points marked valid stay in range
    pts = np.asarray(b.points)
    val = np.asarray(b.valid)
    assert (np.abs(pts[val][:, 0]) <= 20).all()


def test_augmentation_keeps_points_in_boxes():
    """Flip+rot+scale must transform points and boxes consistently."""
    ds = SyntheticDataset(num_samples=1, num_points=4096, num_objects=4,
                          pc_range=PCR)
    raw = ds[0]
    from sst_tpu.data.pipelines import GlobalRotScaleTrans, RandomFlip3D

    sample = dict(raw)
    rng = np.random.RandomState(3)
    sample["rng"] = rng
    n_before = _count_in_boxes(raw["points"], raw["gt_boxes"])
    sample = RandomFlip3D(flip_ratio_bev_horizontal=1.0,
                          flip_ratio_bev_vertical=1.0)(sample)
    sample = GlobalRotScaleTrans()(sample)
    n_after = _count_in_boxes(sample["points"], sample["gt_boxes"])
    assert n_after >= 0.95 * n_before


def _count_in_boxes(points, boxes):
    import jax.numpy as jnp

    from sst_tpu.core.boxes import points_in_boxes

    m = points_in_boxes(jnp.asarray(points[:, :3]), jnp.asarray(boxes))
    return int(np.asarray(m).any(axis=1).sum())


def test_eval_ap_perfect_predictions():
    gts = []
    preds = []
    rng = np.random.RandomState(0)
    for _ in range(4):
        g = rng.randint(3, 8)
        boxes = np.concatenate(
            [rng.uniform(-20, 20, (g, 2)), np.zeros((g, 1)),
             rng.uniform(1, 4, (g, 3)), rng.uniform(-3, 3, (g, 1))], -1
        ).astype(np.float32)
        labels = rng.randint(0, 3, g)
        gts.append({"boxes": boxes, "labels": labels})
        preds.append({"boxes": boxes.copy(), "labels": labels.copy(),
                      "scores": rng.rand(g).astype(np.float32)})
    res = eval_ap(preds, gts, ["Car", "Pedestrian", "Cyclist"])
    assert res["mAP"] > 0.99


def test_eval_ap_wrong_predictions():
    gt_boxes = np.array([[0, 0, 0, 2, 4, 1.5, 0.0]], np.float32)
    far = np.array([[10, 10, 0, 2, 4, 1.5, 0.0]], np.float32)
    gts = [{"boxes": gt_boxes, "labels": np.array([0])}]
    preds = [{"boxes": far, "labels": np.array([0]),
              "scores": np.array([0.9], np.float32)}]
    res = eval_ap(preds, gts, ["Car"])
    assert res["Car"] == 0.0


def test_rotated_iou_matrix_matches_jax(rng):
    import jax.numpy as jnp

    from sst_tpu.core.iou import boxes_iou_3d

    boxes_a = np.concatenate(
        [rng.uniform(-3, 3, (5, 2)), np.zeros((5, 1)),
         rng.uniform(1, 3, (5, 3)), rng.uniform(-3, 3, (5, 1))], -1
    ).astype(np.float32)
    boxes_b = np.concatenate(
        [rng.uniform(-3, 3, (4, 2)), np.zeros((4, 1)),
         rng.uniform(1, 3, (4, 3)), rng.uniform(-3, 3, (4, 1))], -1
    ).astype(np.float32)
    ref = np.asarray(boxes_iou_3d(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
    got = rotated_iou_matrix(boxes_a, boxes_b, "3d")
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_eval_ap_breakdowns():
    import numpy as np

    from sst_tpu.core.evaluation import eval_ap_breakdowns

    rng = np.random.RandomState(0)
    gts, preds = [], []
    for _ in range(3):
        near = np.concatenate([rng.uniform(-20, 20, (4, 2)),
                               np.full((4, 1), -0.5), np.tile([[2, 4, 1.6]], (4, 1)),
                               rng.uniform(-3, 3, (4, 1))], 1).astype(np.float32)
        far = near.copy()
        far[:, 0] += 45.0
        boxes = np.concatenate([near, far])
        labels = np.zeros(8, np.int32)
        gts.append(dict(boxes=boxes, labels=labels,
                        num_points=np.array([50, 50, 2, 2, 50, 2, 50, 2])))
        # perfect predictions for near only
        preds.append(dict(boxes=near.copy(), labels=np.zeros(4, np.int32),
                          scores=np.ones(4, np.float32)))
    out = eval_ap_breakdowns(preds, gts, ["Car"])
    assert set(out) >= {"OVERALL", "0-30m", "30-50m", "50m+", "L2_proxy_hard"}
    assert out["0-30m"]["Car"] > 0.9      # near gts all found
    assert out["OVERALL"]["Car"] < 0.7    # far gts missed
