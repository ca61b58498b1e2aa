"""CenterHead tests: heatmap targets, loss/grads, decode; plus the extra NMS
variants (circle / aligned / weighted)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sst_tpu.core.nms import aligned_3d_nms, circle_nms, weighted_nms_bev
from sst_tpu.models.heads.center_head import CenterHead, gaussian_radius


def test_gaussian_radius_monotonic():
    small = gaussian_radius(jnp.asarray([2.0, 4.0]))
    big = gaussian_radius(jnp.asarray([4.0, 8.0]))
    assert float(big) > float(small) > 0


@pytest.fixture(scope="module")
def ch_setup():
    head = CenterHead(
        in_channels=32, share_conv_channel=16, head_conv=16,
        common_heads=(("reg", 2, 1), ("height", 1, 1), ("dim", 3, 1),
                      ("rot", 2, 1)),
        point_cloud_range=(-8.0, -8.0, -2.0, 8.0, 8.0, 4.0),
        voxel_size=(0.5, 0.5, 6.0),
        max_objs=16,
    )
    rng = np.random.RandomState(0)
    bev = jnp.asarray(rng.randn(2, 32, 32, 32).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), bev, train=False)
    g = 6
    boxes = np.concatenate(
        [rng.uniform(-6, 6, (2, g, 2)), np.full((2, g, 1), -0.5),
         rng.uniform(1, 4, (2, g, 3)), rng.uniform(-3, 3, (2, g, 1))], -1,
    ).astype(np.float32)
    gt = (jnp.asarray(boxes),
          jnp.asarray(rng.randint(0, 3, (2, g)).astype(np.int32)),
          jnp.ones((2, g), bool))
    return head, variables, bev, gt


def test_center_head_loss_and_grads(ch_setup):
    head, variables, bev, (gb, gl, gv) = ch_setup

    def loss_fn(params):
        outs, mut = head.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            bev, train=True, mutable=["batch_stats"],
        )
        l = head.loss(outs, gb, gl, gv)
        return sum(l.values()), l

    (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total)), {k: float(v) for k, v in parts.items()}
    assert any(k.startswith("loss_heatmap") for k in parts)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_center_head_heatmap_targets(ch_setup):
    head, variables, bev, (gb, gl, gv) = ch_setup
    hm, pos = head.heatmap_targets((32, 32), gb, gl, gv, task_id=0)
    assert hm.shape == (2, 32, 32, 1)
    assert float(hm.max()) <= 1.0 + 1e-6
    car_present = bool((np.asarray(gl) == 0).any())
    assert (float(hm.max()) > 0.9) == car_present


def test_center_head_decode(ch_setup):
    head, variables, bev, _ = ch_setup
    outs = head.apply(variables, bev, train=False)
    res = head.get_bboxes(outs, nms_pre=64, max_num=32)
    assert res["boxes"].shape == (2, 32, 7)
    assert np.isfinite(np.asarray(res["boxes"])).all()
    res_c = head.get_bboxes(outs, nms_pre=64, max_num=32, use_circle_nms=True)
    assert res_c["boxes"].shape == (2, 32, 7)


def test_circle_nms():
    centers = jnp.asarray([[0, 0], [0.5, 0], [10, 10]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(circle_nms(centers, scores, jnp.ones(3, bool), 1.0))
    assert keep.tolist() == [True, False, True]


def test_aligned_3d_nms():
    boxes = jnp.asarray([
        [0, 0, 0, 2, 2, 2],
        [0.1, 0.1, 0, 2.1, 2.1, 2],
        [5, 5, 5, 6, 6, 6],
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    cls = jnp.asarray([0, 0, 0])
    keep = np.asarray(aligned_3d_nms(boxes, scores, cls, jnp.ones(3, bool), 0.25))
    assert keep.tolist() == [True, False, True]
    # different class → not suppressed
    keep2 = np.asarray(aligned_3d_nms(boxes, scores, jnp.asarray([0, 1, 0]),
                                      jnp.ones(3, bool), 0.25))
    assert keep2.tolist() == [True, True, True]


def test_weighted_nms():
    boxes = jnp.asarray([
        [0, 0, 0, 2, 4, 1.5, 0.0],
        [0.2, 0.0, 0, 2, 4, 1.5, 0.0],
        [10, 10, 0, 2, 4, 1.5, 0.5],
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.6, 0.8])
    merged, sc, keep = weighted_nms_bev(boxes, scores, jnp.ones(3, bool),
                                        thr_lo=0.1, thr_hi=0.3)
    k = np.asarray(keep)
    assert k.tolist() == [True, False, True]
    m = np.asarray(merged)
    # kept box 0 merged toward box 1 (weighted mean of x: between 0 and 0.2)
    assert 0.0 < m[0, 0] < 0.2
    # isolated box unchanged
    np.testing.assert_allclose(m[2], np.asarray(boxes)[2], atol=1e-5)


def test_multiclass_wnms_path():
    from sst_tpu.core.nms import box3d_multiclass_nms

    rng = np.random.RandomState(0)
    n = 64
    boxes = jnp.asarray(np.concatenate(
        [rng.uniform(-30, 30, (n, 2)), rng.uniform(-1, 0, (n, 1)),
         rng.uniform(1.5, 4, (n, 3)), rng.uniform(-3, 3, (n, 1))], 1
    ).astype(np.float32))
    scores = jnp.asarray(rng.rand(n, 3).astype(np.float32))
    out = box3d_multiclass_nms(
        boxes, scores, jnp.ones(n, bool), num_classes=3, score_thr=0.05,
        nms_thr=0.25, nms_pre=32, max_num=16, use_wnms=True,
    )
    assert out["boxes"].shape == (16, 7)
    assert np.isfinite(np.asarray(out["boxes"])).all()
