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
