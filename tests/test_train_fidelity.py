"""Training-fidelity features: add_gt_fg_points, centroid_alpha,
IoUNegPiecewiseSampler (reference single_stage_fsd.py:776-796,
single_stage_fsd_v2.py:248-260, iou_neg_piecewise_sampler.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from sst_tpu.core.target_assign import (
    gt_fg_points_mask,
    gt_point_class_labels,
    iou_neg_piecewise_sample,
)


def _toy_scene():
    pts = np.array([[1.0, 1.0, 0.0], [5.0, 5.0, 0.0], [1.0, 1.0, 0.0]],
                   np.float32)
    bidx = np.array([0, 0, 1], np.int32)
    gt = np.zeros((2, 2, 7), np.float32)
    gt[0, 0] = [1, 1, -1, 2, 2, 2, 0.0]   # contains point 0 (batch 0)
    gt[1, 0] = [9, 9, -1, 2, 2, 2, 0.0]   # batch 1, far away
    gl = np.array([[2, 0], [1, 0]], np.int32)
    gv = np.array([[True, False], [True, False]])
    return pts, bidx, gt, gl, gv


def test_gt_fg_mask_and_labels_respect_batch_and_class():
    pts, bidx, gt, gl, gv = _toy_scene()
    valid = jnp.ones(3, bool)
    m = np.asarray(gt_fg_points_mask(
        jnp.asarray(pts), jnp.asarray(bidx), valid, jnp.asarray(gt),
        jnp.asarray(gl), jnp.asarray(gv), chunk=2))
    assert m.tolist() == [True, False, False]  # pt2 same xy but batch 1
    m2 = np.asarray(gt_fg_points_mask(
        jnp.asarray(pts), jnp.asarray(bidx), valid, jnp.asarray(gt),
        jnp.asarray(gl), jnp.asarray(gv), cls=0, chunk=2))
    assert m2.tolist() == [False, False, False]  # box label is 2, not 0
    lbl = np.asarray(gt_point_class_labels(
        jnp.asarray(pts), jnp.asarray(bidx), valid, jnp.asarray(gt),
        jnp.asarray(gl), jnp.asarray(gv), chunk=2))
    assert lbl.tolist() == [2, -1, -1]


def test_piecewise_sampler_budgets():
    p = 200
    rng = np.random.RandomState(0)
    max_iou = rng.uniform(0, 1, p).astype(np.float32)
    is_pos = max_iou > 0.6
    valid = np.ones(p, bool)
    keep = np.asarray(iou_neg_piecewise_sample(
        jax.random.PRNGKey(0), jnp.asarray(max_iou), jnp.asarray(is_pos),
        jnp.asarray(valid), num=64, pos_fraction=0.5,
        neg_piece_fractions=(0.8, 0.2), neg_iou_piece_thrs=(0.55, 0.1)))
    n_pos = (keep & is_pos).sum()
    n_neg = (keep & ~is_pos).sum()
    assert n_pos <= 32
    assert n_pos + n_neg == 64
    # hard negatives (iou in [0.1, 0.55)) dominate per the 0.8 fraction
    hard = keep & ~is_pos & (max_iou >= 0.1) & (max_iou < 0.55)
    easy = keep & ~is_pos & (max_iou < 0.1)
    assert hard.sum() > easy.sum()
    # no negative above the top threshold band is ever selected
    assert not (keep & ~is_pos & (max_iou >= 0.55)).any()


def test_piecewise_sampler_short_piece_extends():
    # only 3 hard negatives exist → the easy piece absorbs the remainder
    max_iou = np.concatenate([
        np.full(3, 0.3), np.full(100, 0.05), np.full(10, 0.9)
    ]).astype(np.float32)
    is_pos = max_iou > 0.6
    keep = np.asarray(iou_neg_piecewise_sample(
        jax.random.PRNGKey(1), jnp.asarray(max_iou), jnp.asarray(is_pos),
        jnp.ones(113, bool), num=64, pos_fraction=0.5,
        neg_piece_fractions=(0.8, 0.2), neg_iou_piece_thrs=(0.55, 0.1)))
    assert (keep & is_pos).sum() == 10
    assert (keep & (max_iou >= 0.1) & (max_iou < 0.55)).sum() == 3
    assert keep.sum() == 64  # easy piece filled the gap


def test_fsdv2_gt_fg_and_centroid_alpha_train():
    from sst_tpu.flagship import tiny_batch
    from tests.test_fsdv2 import tiny_fsdv2

    model = tiny_fsdv2().clone(add_gt_fg_points=True, centroid_alpha=0.1)
    batch = tiny_batch(batch_size=2, num_points=256)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    losses, _ = model.apply(variables, batch, train=True, method=model.loss,
                            mutable=["batch_stats"])
    assert np.isfinite(float(sum(v for k, v in losses.items()
                                 if k.startswith("loss"))))


def test_two_stage_sampler_rng_threading():
    from tests.test_fsd import make_batch, tiny_fsd_two_stage

    base = tiny_fsd_two_stage()
    model = base.clone(roi_head={
        **base.roi_head,
        "sampler": dict(num=16, pos_fraction=0.5,
                        neg_piece_fractions=(0.8, 0.2),
                        neg_iou_piece_thrs=(0.55, 0.1)),
    })
    batch = make_batch(np.random.RandomState(5))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    losses, _ = model.apply(
        variables, batch, train=True, method=model.loss,
        rngs={"sampler": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    assert np.isfinite(float(sum(v for k, v in losses.items()
                                 if k.startswith("loss"))))
