"""High-level inference API + visualizer tests (reference test_apis.py)."""

import os

import numpy as np


def test_init_model_and_inference(tmp_path):
    from sst_tpu.apis import inference_detector, init_model

    model, variables, predict = init_model(
        os.path.join(os.path.dirname(__file__), "..",
                     "configs/sst/sst_tiny_synthetic.py"),
        num_point_features=4,
    )
    rng = np.random.RandomState(0)
    pts = rng.uniform(-6, 6, (3000, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1, 2, 3000)
    out = inference_detector(model, variables, predict, pts, max_points=2048)
    assert out["boxes"].shape[-1] == 7
    assert np.isfinite(out["boxes"]).all()
    assert out["scores"].shape == out["labels"].shape


def test_show_bev(tmp_path):
    from sst_tpu.utils.visualizer import show_bev

    rng = np.random.RandomState(0)
    pts = rng.uniform(-30, 30, (5000, 3))
    boxes = np.concatenate(
        [rng.uniform(-20, 20, (5, 3)), rng.uniform(1, 4, (5, 3)),
         rng.uniform(-3, 3, (5, 1))], 1)
    out = show_bev(pts, gt_boxes=boxes, pred_boxes=boxes + 0.5,
                   pred_scores=rng.rand(5),
                   out_file=str(tmp_path / "bev.png"))
    assert os.path.exists(out) and os.path.getsize(out) > 10000
