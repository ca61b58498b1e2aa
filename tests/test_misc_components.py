"""Cosine attention, IoU head branch, samplers, timer."""

import jax
import jax.numpy as jnp
import numpy as np

from sst_tpu.data.loader import sequential_lane_indices, weak_shuffle_indices
from sst_tpu.utils.timer import Timer


def test_cosine_attention_forward():
    from sst_tpu.flagship import tiny_batch, tiny_sst

    model = tiny_sst().clone(backbone=dict(
        d_model=(32, 32), nhead=(2, 2), num_blocks=2,
        dim_feedforward=(64, 64), num_attached_conv=1,
        conv_kwargs=({"kernel_size": 3, "dilation": 1},),
        conv_out_channel=32, in_channel=32, remat_blocks=False, cosine=True,
    ))
    batch = tiny_batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    # tau params exist
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    assert any("tau" in jax.tree_util.keystr(p) for p, _ in flat)
    out = model.apply(variables, batch, train=False)
    assert np.isfinite(np.asarray(out["cls"])).all()


def test_iou_branch():
    from sst_tpu.models.fsd import SparseClusterHeadV2

    head = SparseClusterHeadV2(
        num_classes=2, tasks=(("car",), ("ped",)),
        class_names=("car", "ped"), in_channel=16,
        shared_mlp_dims=(16,), num_cls_layer=1, cls_hidden_dim=16,
        common_attrs=(("center", 3, 1, 16), ("dim", 3, 1, 16), ("rot", 2, 1, 16)),
        with_iou=True,
    )
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    valid = jnp.ones(32, bool)
    variables = head.init(jax.random.PRNGKey(0), feats, valid)
    outs = head.apply(variables, feats, valid)
    assert len(outs["iou_logits"]) == 2
    xyz = jnp.asarray(rng.uniform(-5, 5, (32, 3)).astype(np.float32))
    gt = jnp.asarray(np.concatenate(
        [rng.uniform(-5, 5, (1, 4, 3)), rng.uniform(1, 3, (1, 4, 3)),
         rng.uniform(-3, 3, (1, 4, 1))], -1).astype(np.float32))
    losses = head.loss(outs, xyz, jnp.zeros(32, jnp.int32), valid, gt,
                       jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), bool))
    assert "loss_iou.task0" in losses
    assert np.isfinite(float(sum(losses.values())))
    res = head.get_bboxes(outs, xyz, jnp.zeros(32, jnp.int32), valid, 1,
                          max_num=8, nms_pre=16)
    assert np.isfinite(np.asarray(res["scores"])).all()


def test_weak_shuffle_preserves_intra_sequence_order():
    seq = np.asarray([0] * 5 + [1] * 7 + [2] * 3)
    idx = weak_shuffle_indices(seq, shard_size=4, seed=0, epoch=1)
    assert sorted(idx.tolist()) == list(range(15))
    # within each contiguous run of the same sequence, time order holds
    runs = []
    for i in idx:
        runs.append(int(i))
    # check: any two adjacent picks from the same sequence are increasing
    for a, b in zip(idx[:-1], idx[1:]):
        if seq[a] == seq[b] and abs(int(b) - int(a)) == 1:
            assert b == a + 1


def test_sequential_lanes():
    seq = np.asarray([0] * 4 + [1] * 6 + [2] * 2 + [3] * 5)
    lanes = sequential_lane_indices(seq, num_lanes=2)
    all_idx = sorted(i for l in lanes for i in l)
    assert all_idx == list(range(17))
    for lane in lanes:
        # whole sequences, in order
        assert lane == sorted(lane)
        seqs = [int(seq[i]) for i in lane]
        for s in set(seqs):
            assert seqs.count(s) == int((seq == s).sum())


def test_timer():
    t = Timer(print_interval=100)
    with t("phase"):
        x = sum(range(1000))
    assert "phase" in t.summary()


def test_boxes_overlap_1to1():
    import jax.numpy as jnp

    from sst_tpu.core.iou import boxes_iou_bev, boxes_overlap_1to1

    rng = np.random.RandomState(0)
    boxes = np.concatenate([
        rng.uniform(-5, 5, (16, 2)), np.zeros((16, 1)),
        rng.uniform(1, 4, (16, 3)), rng.uniform(-3, 3, (16, 1)),
    ], -1).astype(np.float32)
    shifted = boxes.copy()
    shifted[:, 0] += 0.5
    paired = np.asarray(boxes_overlap_1to1(jnp.asarray(boxes),
                                           jnp.asarray(shifted)))
    full = np.asarray(boxes_iou_bev(jnp.asarray(boxes), jnp.asarray(shifted)))
    np.testing.assert_allclose(paired, np.diag(full), atol=1e-5)


def test_roiaware_pool3d():
    import jax.numpy as jnp

    from sst_tpu.ops.roiaware import roiaware_pool3d

    # one axis-aligned roi; points in two known sub-voxels
    rois = jnp.asarray([[0.0, 0.0, -1.0, 2.0, 4.0, 2.0, 0.0]])
    pts = jnp.asarray([
        [-0.6, -1.5, -0.9],   # low corner-ish cell
        [0.6, 1.5, 0.7],      # high corner-ish cell
        [0.6, 1.5, 0.8],      # same cell, bigger feature
    ])
    feats = jnp.asarray([[1.0], [2.0], [5.0]])
    out = np.asarray(roiaware_pool3d(
        pts, feats, jnp.ones(3, bool), jnp.zeros(3, jnp.int32),
        rois, jnp.ones(1, bool), jnp.zeros(1, jnp.int32),
        out_size=(2, 2, 2), mode="max", max_inbox_point=8,
    ))
    assert out.shape == (1, 2, 2, 2, 1)
    assert out[0, 0, 0, 0, 0] == 1.0
    assert out[0, 1, 1, 1, 0] == 5.0  # max of the two co-located points
    assert out.sum() == 6.0  # everything else empty → zero


def test_tta_predict_inverse_consistency():
    """Each augmented view 'detects' the same physical object (derived from
    the augmented points); after inversion + merge, all views must agree on
    one box at the original location."""
    import jax
    import jax.numpy as jnp

    from sst_tpu.flagship import tiny_batch
    from sst_tpu.models.tta import tta_predict

    base = tiny_batch(batch_size=1, num_points=64)

    def fake_predict(batch):
        ctr = (batch.points * batch.valid[..., None]).sum(1) / \
            batch.valid.sum(1)[:, None]
        box = jnp.concatenate(
            [ctr[:, :2], jnp.full((1, 1), -0.5), jnp.asarray([[2., 4., 1.5]]),
             jnp.full((1, 1), 0.3)], -1)
        return dict(boxes=box[:, None, :], scores=jnp.ones((1, 1)),
                    labels=jnp.zeros((1, 1), jnp.int32),
                    valid=jnp.ones((1, 1), bool))

    plain = np.asarray(fake_predict(base)["boxes"][0, 0])
    out = tta_predict(fake_predict, base, flips=("none", "x", "y", "xy"),
                      angles=(0.0, 0.5), max_num=8, wnms_thr_hi=0.5)
    v = np.asarray(out["valid"][0])
    boxes = np.asarray(out["boxes"][0])[v]
    # every view maps back to the same box → weighted NMS merges into one
    assert v.sum() == 1, boxes
    np.testing.assert_allclose(boxes[0][:6], plain[:6], atol=1e-4)


class TestPointPillars:
    """Legacy VoxelNet-family detector (hard pillars + SECOND), SURVEY
    §2.11 parity-optional row."""

    def _tiny(self):
        from sst_tpu.models.detectors.pointpillars import PointPillars

        return PointPillars(
            voxel_size=(0.5, 0.5, 6.0),
            point_cloud_range=(-8.0, -8.0, -2.0, 8.0, 8.0, 4.0),
            max_voxels=512, max_points_per_voxel=8,
            vfe=dict(feat_channels=(16,)),
            backbone=dict(out_channels=(16, 32, 32), layer_nums=(1, 1, 1)),
            neck=dict(out_channels=(16, 16, 16), upsample_strides=(1, 2, 4)),
            head=dict(
                num_classes=3, feat_channels=48,
                anchor_ranges=((-8, -8, -0.03, 8, 8, -0.03),) * 3,
            ),
            test_cfg=dict(score_thr=0.05, nms_thr=0.25, nms_pre=64,
                          max_num=32, use_rotate_nms=True),
        )

    def test_loss_and_predict(self):
        import jax

        from sst_tpu.flagship import fsd_batch

        rng = np.random.RandomState(0)
        model = self._tiny()
        batch = fsd_batch(rng, b=2, p=512)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, train=True, method=model.loss,
                mutable=["batch_stats"])
            return sum(v for k, v in out.items()
                       if k.startswith("loss")), out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"])
        assert np.isfinite(float(loss)), {k: float(v) for k, v in out.items()}
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree_util.tree_leaves(grads))
        pred = model.apply(variables, batch, method=model.predict)
        assert pred["boxes"].shape[0] == 2
        assert np.isfinite(np.asarray(pred["boxes"])).all()

    def test_config_builds(self):
        import sst_tpu.models  # noqa: F401
        from sst_tpu.utils.builders import build_model_from_cfg
        from sst_tpu.utils.config import load_config

        cfg = load_config("configs/pointpillars/pointpillars_waymoD5_3class.py")
        m = build_model_from_cfg(cfg, train=False)
        assert type(m).__name__ == "PointPillars"
