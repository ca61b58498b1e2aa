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


def tiny_fsd():
    return SingleStageFSD(
        point_cloud_range=PCR,
        score_thresh=(0.05, 0.05, 0.05),
        cluster_voxel_size=((0.3, 0.3, 6.0), (0.05, 0.05, 6.0), (0.2, 0.2, 6.0)),
        connected_dist=(0.6, 0.1, 0.4),
        min_points=1,
        pre_voxelization_size=(0.1, 0.1, 0.1),
        caps=FSDCaps(
            fg_per_class=(256, 128, 128),
            cluster_voxels_per_class=(256, 256, 256),
            clusters_per_class=(32, 32, 32),
            pre_voxels=1024,
        ),
        segmentor=dict(
            voxel_size=(0.25, 0.25, 0.2),
            max_voxels=1024,
            unet_level_caps=(1024, 512, 256, 128),
            unet_strides=((2, 2, 2),) * 3,
            unet_paddings=((1, 1, 1),) * 3,
            vfe=dict(feat_channels=(16, 16), mode="max"),
            unet=dict(
                in_channels=16, base_channels=16,
                encoder_channels=((16,), (16, 16), (32, 32)),
                decoder_channels=((32, 32, 16), (16, 16, 16), (16, 16, 16)),
            ),
            head=dict(num_classes=3, hidden_dims=(32, 32)),
        ),
        backbone=dict(
            num_blocks=2,
            in_channels=(0, 0),
            feat_channels=((32, 32), (32, 32)),
            rel_mlp_hidden=((8, 8), (8, 8)),
        ),
        head=dict(
            in_channel=128,
            shared_mlp_dims=(64, 64),
            common_attrs=(("center", 3, 1, 32), ("dim", 3, 1, 32), ("rot", 2, 1, 32)),
            num_cls_layer=1,
            cls_hidden_dim=32,
        ),
        test_cfg=dict(score_thr=0.05, nms_thr=0.25, nms_pre=64, max_num=32,
                      use_rotate_nms=True),
    )


def make_batch(rng, b=2, p=1024, g=6):
    # clustered points around gt boxes so fg/clustering paths are exercised
    boxes = np.concatenate(
        [
            rng.uniform(-6, 6, (b, g, 2)),
            np.full((b, g, 1), -0.5),
            rng.uniform(1.0, 3.0, (b, g, 3)),
            rng.uniform(-np.pi, np.pi, (b, g, 1)),
        ],
        -1,
    ).astype(np.float32)
    pts = []
    for i in range(b):
        obj = boxes[i, rng.randint(0, g, p // 2), :3] + rng.randn(p // 2, 3) * 0.5
        bgp = rng.uniform(-7, 7, (p - p // 2, 3))
        pp = np.concatenate([obj, bgp]).astype(np.float32)
        pp[:, 2] = np.clip(pp[:, 2], -1.5, 3.5)
        inten = rng.rand(p, 2).astype(np.float32)
        pts.append(np.concatenate([pp, inten], -1))
    return PointBatch(
        points=jnp.asarray(np.stack(pts)),
        valid=jnp.ones((b, p), bool),
        gt_boxes=jnp.asarray(boxes),
        gt_labels=jnp.asarray(rng.randint(0, 3, (b, g)).astype(np.int32)),
        gt_valid=jnp.ones((b, g), bool),
    )


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


def tiny_fsd_two_stage():
    from sst_tpu.models.fsd import FSD

    ss = tiny_fsd()
    cfg = {f.name: getattr(ss, f.name) for f in ss.__dataclass_fields__.values()
           if f.name not in ("parent", "name", "dtype")}
    return FSD(
        single_stage=cfg,
        roi_head=dict(
            max_inbox_point=32,
            bbox_head=dict(
                num_blocks=2,
                feat_channels=((32, 32),) * 2,
                rel_mlp_hidden=((8, 8),) * 2,
                reg_mlp=(64, 64),
                cls_mlp=(64, 64),
            ),
        ),
        rois_per_sample=16,
    )


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
