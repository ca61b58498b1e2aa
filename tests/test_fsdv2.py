"""FSDv2 integration tests on tiny shapes: single-stage loss/grads/predict and
the two-stage (GroupCorrection) variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sst_tpu.models.detectors.dynamic_voxelnet import PointBatch
from sst_tpu.models.fsd import FSDV2, FSDV2Caps, SingleStageFSDV2
from tests.test_fsd import make_batch

PCR = (-8.0, -8.0, -2.0, 8.0, 8.0, 4.0)


def tiny_fsdv2(as_rpn=False):
    return SingleStageFSDV2(
        point_cloud_range=PCR,
        virtual_voxel_size=(0.5, 0.5, 0.5),
        score_thresh=(0.05, 0.05, 0.05),
        caps=FSDV2Caps(
            fg_per_class=(256, 128, 128),
            voxels=1024,
            union_voxels=2048,
            virtual_out=256,
        ),
        multiscale_levels=(0, 1),
        ms_projector_hiddens=((16,), (16,)),
        ms_output_dim=16,
        segmentor=dict(
            voxel_size=(0.5, 0.5, 0.5),
            max_voxels=1024,
            unet_level_caps=(1024, 512, 256),
            unet_strides=((2, 2, 2),) * 2,
            unet_paddings=((1, 1, 1),) * 2,
            vfe=dict(feat_channels=(16, 16), mode="max"),
            unet=dict(
                in_channels=16, base_channels=16,
                encoder_channels=((16,), (16, 16), (16, 16)),
                decoder_channels=((16, 16, 16), (16, 16, 16), (16, 16, 16)),
            ),
            head=dict(num_classes=3, hidden_dims=(32, 32)),
        ),
        vfe=dict(feat_channels=(16, 16), mode="max"),
        mixer=dict(
            base_channels=16, output_channels=32,
            encoder_channels=((16,), (16, 16), (16, 16)),
            decoder_channels=((16, 16, 16), (16, 16, 16), (16, 16, 16)),
        ),
        head=dict(
            in_channel=32,
            shared_mlp_dims=(64, 64),
            common_attrs=(("center", 3, 1, 32), ("dim", 3, 1, 32), ("rot", 2, 1, 32)),
            num_cls_layer=1,
            cls_hidden_dim=32,
        ),
        as_rpn=as_rpn,
        test_cfg=dict(score_thr=0.05, nms_thr=0.25, nms_pre=64, max_num=32,
                      use_rotate_nms=True),
    )


@pytest.fixture(scope="module")
def fsdv2_setup():
    model = tiny_fsdv2()
    rng = np.random.RandomState(2)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return model, variables, batch


def test_fsdv2_loss_and_grads(fsdv2_setup):
    model, variables, batch = fsdv2_setup

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
    assert float(out["num_virtual"]) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_fsdv2_pretrain_mode(fsdv2_setup):
    """disable_pretrain topk sampling (no threshold) must also be finite."""
    model, variables, batch = fsdv2_setup
    out, _ = model.apply(
        variables, batch, train=True, pretrain=True, method=model.loss,
        mutable=["batch_stats"],
    )
    assert np.isfinite(float(sum(v for k, v in out.items() if k.startswith("loss"))))


def test_fsdv2_predict(fsdv2_setup):
    model, variables, batch = fsdv2_setup
    out = model.apply(variables, batch, method=model.predict)
    assert out["boxes"].shape == (2, 32, 7)
    assert np.isfinite(np.asarray(out["boxes"])).all()


def tiny_fsdv2_two_stage():
    ss = tiny_fsdv2()
    cfg = {f.name: getattr(ss, f.name) for f in ss.__dataclass_fields__.values()
           if f.name not in ("parent", "name", "dtype")}
    return FSDV2(
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
def fsdv2_ts_setup():
    model = tiny_fsdv2_two_stage()
    rng = np.random.RandomState(3)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return model, variables, batch


def test_fsdv2_two_stage_loss(fsdv2_ts_setup):
    model, variables, batch = fsdv2_ts_setup

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


def test_fsdv2_two_stage_predict(fsdv2_ts_setup):
    model, variables, batch = fsdv2_ts_setup
    out = model.apply(variables, batch, method=model.predict)
    assert out["boxes"].shape[0] == 2
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_fsdv2_batched_group_sample():
    """nuScenes-style group sampling: background softmax column + grouped
    thresholds (single_stage_fsd_v2.py:790)."""
    base = tiny_fsdv2()
    model = base.clone(
        group_names=(("Car",), ("Pedestrian", "Cyclist")),
        score_thresh=(0.05, 0.05),
        segmentor={**base.segmentor,
                   "head": dict(num_classes=4, hidden_dims=(32, 32))},
    )
    rng = np.random.RandomState(6)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out, _ = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        batch, train=True, method=model.loss, mutable=["batch_stats"],
    )
    total = sum(float(v) for k, v in out.items() if k.startswith("loss"))
    assert np.isfinite(total), {k: float(v) for k, v in out.items()}
    pred = model.apply(variables, batch, method=model.predict)
    assert np.isfinite(np.asarray(pred["boxes"])).all()
