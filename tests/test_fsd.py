"""FSD integration tests on tiny shapes: segmentor forward, CCL clustering,
full detector loss/grads/predict."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sst_tpu.models.detectors.dynamic_voxelnet import PointBatch
from sst_tpu.models.fsd import FSDCaps, SingleStageFSD
from sst_tpu.ops.ccl import compact_labels, connected_components

PCR = (-8.0, -8.0, -2.0, 8.0, 8.0, 4.0)

# canonical tiny builds live in sst_tpu.flagship (shared with the driver's
# multi-chip dryrun)
from sst_tpu.flagship import fsd_batch as make_batch  # noqa: E402
from sst_tpu.flagship import tiny_fsd, tiny_fsd_two_stage  # noqa: E402, F401


def test_ccl_basic():
    xy = jnp.asarray(
        [[0, 0], [0.3, 0], [0.6, 0], [5, 5], [5.2, 5], [0, 0.3], [9, 9]],
        jnp.float32,
    )
    batch = jnp.zeros(7, jnp.int32)
    valid = jnp.ones(7, bool)
    labels = np.asarray(connected_components(xy, batch, valid, 0.5))
    assert labels[0] == labels[1] == labels[2] == labels[5]
    assert labels[3] == labels[4] != labels[0]
    assert labels[6] not in (labels[0], labels[3])
    comp, n = compact_labels(jnp.asarray(labels), valid, 8)
    assert int(n) == 3
    assert set(np.asarray(comp).tolist()) == {0, 1, 2}


def test_ccl_batch_separation():
    xy = jnp.asarray([[0, 0], [0.1, 0]], jnp.float32)
    batch = jnp.asarray([0, 1], jnp.int32)
    labels = np.asarray(connected_components(xy, batch, jnp.ones(2, bool), 0.5))
    assert labels[0] != labels[1]


@pytest.fixture(scope="module")
def fsd_setup():
    model = tiny_fsd()
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return model, variables, batch


def test_fsd_loss_and_grads(fsd_setup):
    model, variables, batch = fsd_setup

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, method=model.loss, mutable=["batch_stats"],
        )
        total = sum(v for k, v in out.items() if k.startswith("loss"))
        return total, out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(loss)), out
    assert float(out["num_fg_points"]) > 0
    assert float(out["num_clusters"]) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_fsd_predict(fsd_setup):
    model, variables, batch = fsd_setup
    out = model.apply(variables, batch, method=model.predict)
    assert out["boxes"].shape == (2, 32, 7)
    assert np.isfinite(np.asarray(out["boxes"])).all()



@pytest.fixture(scope="module")
def fsd2_setup():
    model = tiny_fsd_two_stage()
    rng = np.random.RandomState(1)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return model, variables, batch


def test_fsd_two_stage_loss(fsd2_setup):
    model, variables, batch = fsd2_setup

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, method=model.loss, mutable=["batch_stats"],
        )
        total = sum(v for k, v in out.items() if k.startswith("loss"))
        return total, out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(loss)), {k: float(v) for k, v in out.items()}
    assert "loss_rcnn_cls" in out and "loss_rcnn_bbox" in out
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


def test_fsd_two_stage_predict(fsd2_setup):
    model, variables, batch = fsd2_setup
    out = model.apply(variables, batch, method=model.predict)
    assert out["boxes"].shape[0] == 2
    assert np.isfinite(np.asarray(out["boxes"])).all()
    out_rpn = model.apply(variables, batch, method=model.predict, skip_rcnn=True)
    assert out_rpn["boxes"].shape[0] == 2


def test_fsd_two_stage_no_valid_gt(fsd2_setup):
    """All-invalid gt must not NaN any loss (zero-dim padded boxes guard)."""
    import jax

    model, variables, batch = fsd2_setup
    empty = batch.replace(gt_valid=jnp.zeros_like(batch.gt_valid))
    out, _ = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        empty, train=True, method=model.loss, mutable=["batch_stats"],
    )
    for k, v in out.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_hybrid_assigner_ssg_path():
    """SSGAssigner/HybridAssigner (single_stage_fsd.py:1002,:1104): per-class
    dispatch between CCL and FPS-keypoint assignment trains end to end."""
    model = tiny_fsd().clone(
        assigner_per_class=("ccl", "ssg", "ssg"),
        ssg_radius=(1.0, 0.5, 0.5), ssg_num_fps=(16, 16, 16),
    )
    batch = make_batch(np.random.RandomState(9))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out, _ = model.apply(variables, batch, train=True, method=model.loss,
                         mutable=["batch_stats"])
    assert np.isfinite(float(sum(v for k, v in out.items()
                                 if k.startswith("loss"))))
    assert float(out["num_clusters"]) > 0


def test_fsd_dense_segmentor_loss_and_predict():
    """configs/fsd/fsd_waymoD1_1x_dense.py path: FSD two-stage with the
    z-banded dense-BEV segmentor (the same module swap the FSDv2 flagship
    A/B validated) must train and predict finitely."""
    from sst_tpu.flagship import _single_stage_cfg, _tiny_roi_head_cfg
    from sst_tpu.models.fsd import FSD

    ss = _single_stage_cfg(tiny_fsd())
    ss["segmentor"] = dict(
        ss["segmentor"], backbone="dense_bev", z_groups=2,
        dense_pre_channels=8, dense_group_channels=8,
        unet=dict(encoder_channels=((16, 16), (32, 32)),
                  decoder_channels=(16,), out_channels=16),
    )
    model = FSD(single_stage=ss, roi_head=_tiny_roi_head_cfg(),
                rois_per_sample=16)
    rng = np.random.RandomState(3)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, method=model.loss, mutable=["batch_stats"],
        )
        return sum(v for k, v in out.items() if k.startswith("loss")), out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss)), {k: float(v) for k, v in out.items()}
    assert "loss_rcnn_cls" in out
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)

    pred = model.apply(variables, batch, method=model.predict)
    assert np.isfinite(np.asarray(pred["boxes"])).all()


def test_grouped_fsd_loss_predict_and_pretrain():
    """group_sample mode (single_stage_fsd.py:818, the Argo2 recipe scaled
    to 5 classes / 2 groups): loss is finite with per-task keys for both
    groups, pretrain=True returns segmentation losses only, predict decodes
    26-free class labels within [0, 5)."""
    from sst_tpu.flagship import tiny_fsd_grouped

    model = tiny_fsd_grouped()
    rng = np.random.RandomState(1)
    batch = make_batch(rng)
    # labels in [0, 5)
    batch = batch.replace(gt_labels=jnp.asarray(
        np.random.RandomState(2).randint(0, 5, batch.gt_labels.shape)
        .astype(np.int32)))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    losses = model.apply(variables, batch, train=True, method=model.loss,
                         mutable=["batch_stats"])[0]
    assert "loss_cls.task0" in losses and "loss_cls.task1" in losses
    assert all(np.isfinite(float(v)) for v in losses.values()), losses

    pre = model.apply(variables, batch, train=True, method=model.loss,
                      pretrain=True, mutable=["batch_stats"])[0]
    assert set(k for k in pre if k.startswith("loss")) == \
        {"loss_sem_seg", "loss_vote"}

    out = model.apply(variables, batch, method=model.predict)
    labels = np.asarray(out["labels"])
    valid = np.asarray(out["valid"])
    assert ((labels[valid] >= 0) & (labels[valid] < 5)).all()
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_sst_encoder_segmentor_forward():
    """VoteSegmentor backbone='sst' (fsd_waymoD1_1x_sst_encoder.py recipe):
    pillar-grid SSTv2 with per-voxel outputs decoded back to points."""
    from sst_tpu.models.fsd.vote_segmentor import VoteSegmentor

    seg = VoteSegmentor(
        voxel_size=(0.5, 0.5, 6.0),  # full-height pillars over tiny range
        point_cloud_range=PCR,
        max_voxels=512,
        backbone="sst",
        sst=dict(window_shape=(4, 4),
                 buckets=((8, 0, 8, 64), (16, 8, 100000, 32)),
                 max_total_windows=128),
        vfe=dict(feat_channels=(16, 16), mode="max"),
        unet=dict(d_model=(16,) * 2, nhead=(2,) * 2, num_blocks=2,
                  dim_feedforward=(32,) * 2, num_attached_conv=0),
        head=dict(num_classes=3, hidden_dims=(16,)),
    )
    rng = np.random.RandomState(0)
    n = 512
    pts = jnp.asarray(
        np.concatenate([rng.uniform(-7, 7, (n, 3)), rng.rand(n, 2)], -1)
        .astype(np.float32))
    bidx = jnp.zeros((n,), jnp.int32)
    valid = jnp.ones((n,), bool)
    variables = seg.init(
        {"params": jax.random.PRNGKey(0), "shuffle": jax.random.PRNGKey(1)},
        pts, bidx, valid, 1)
    out = seg.apply(variables, pts, bidx, valid, 1)
    assert out["seg_logits"].shape == (n, 3)
    assert np.isfinite(np.asarray(out["seg_logits"])).all()
    assert np.isfinite(np.asarray(out["offsets"])).all()


def test_voxel_downsample_dedups_sweep_overlap():
    """voxel_downsampling_size (3-sweep recipe): coincident points merge to
    one valid slot with averaged fields; distinct cells survive."""
    from sst_tpu.models.fsd.vote_segmentor import VoteSegmentor

    seg = VoteSegmentor(
        voxel_size=(0.5, 0.5, 6.0), point_cloud_range=PCR, max_voxels=256,
        backbone="sst",
        sst=dict(window_shape=(4, 4), buckets=((8, 0, 100000, 64),),
                 max_total_windows=128),
        voxel_downsampling_size=(0.1, 0.1, 0.1),
        vfe=dict(feat_channels=(8,), mode="max"),
        unet=dict(d_model=(8,), nhead=(1,), num_blocks=1,
                  dim_feedforward=(16,), num_attached_conv=0),
        head=dict(num_classes=3, hidden_dims=(8,)),
    )
    # 4 points: two coincident (same 0.1 cell), two far apart
    pts = jnp.asarray(np.array([
        [1.02, 1.02, 0.5, 0.2, 0.0],
        [1.03, 1.03, 0.5, 0.6, 0.0],
        [-3.0, 2.0, 0.5, 1.0, 0.0],
        [5.0, -4.0, 0.5, 1.0, 0.0],
    ], np.float32))
    out, ok = VoteSegmentor.voxel_downsample(seg, pts, jnp.ones((4,), bool), 1)
    ok = np.asarray(ok)
    assert ok.sum() == 3
    merged = np.asarray(out)[ok]
    # the merged slot averaged xyz and intensity of the coincident pair
    d = np.abs(merged - np.array([1.025, 1.025, 0.5, 0.4, 0.0])).sum(1)
    assert d.min() < 1e-5


def test_predict_seg_protocol(rng):
    """predict_seg returns per-point pred/gt labels consumable by
    core/eval_seg.seg_eval (the --eval seg CLI path)."""
    model = tiny_fsd()
    batch = make_batch(rng, b=2, p=256)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch, train=False)
    out = jax.jit(
        lambda v, b: model.apply(v, b, method=model.predict_seg)
    )(variables, batch)
    b, p = batch.points.shape[:2]
    assert out["pred"].shape == (b, p) and out["gt"].shape == (b, p)
    nc = model.num_classes
    assert int(out["pred"].max()) <= nc and int(out["gt"].max()) <= nc
    # gt must agree with the training-target rule (seg_targets labels)
    from sst_tpu.models.fsd.vote_segmentor import seg_targets

    lbl0 = seg_targets(batch.points[0, :, :3], batch.valid[0],
                       batch.gt_boxes[0], batch.gt_labels[0],
                       batch.gt_valid[0], nc)[0]
    np.testing.assert_array_equal(np.asarray(out["gt"][0]), np.asarray(lbl0))
    # a frame with gt boxes has at least one fg gt point
    assert int((np.asarray(out["gt"]) < nc).sum()) > 0
    # and the eval protocol consumes it end to end
    from sst_tpu.core.eval_seg import seg_eval

    res = seg_eval(
        [np.asarray(out["gt"][i])[np.asarray(batch.valid[i])] for i in range(b)],
        [np.asarray(out["pred"][i])[np.asarray(batch.valid[i])] for i in range(b)],
        ("car", "ped", "cyc", "background"))
    assert 0.0 <= res["acc"] <= 1.0 and "miou" in res
