"""Offline-tool tests: ctrl track-input/candidates generation, fsdpp seed
generation, head velocity branch."""

import pickle
import subprocess
import sys

import numpy as np


def _make_tracking_bin(tmp_path):
    from sst_tpu.core.tracklet import LiDARTracklet, tracklets_to_bin

    rng = np.random.RandomState(0)
    trks = []
    for i in range(3):
        n = 4 + i
        boxes = np.concatenate(
            [rng.uniform(-20, 20, (n, 3)), rng.uniform(1, 4, (n, 3)),
             rng.uniform(-3, 3, (n, 1))], 1).astype(np.float32)
        trks.append(LiDARTracklet(
            context_name="ctx", obj_id=f"t{i}", type_id=1,
            timestamps=[100 + 10 * k for k in range(n)],
            boxes=boxes, scores=rng.rand(n).astype(np.float32),
        ))
    path = tmp_path / "trk.bin"
    tracklets_to_bin(trks, str(path))
    return str(path), trks


def test_ctrl_pipeline_tools(tmp_path):
    bin_path, trks = _make_tracking_bin(tmp_path)
    out1 = tmp_path / "tracklets.pkl"
    r = subprocess.run(
        [sys.executable, "tools/ctrl/generate_track_input.py",
         "--bin", bin_path, "--out", str(out1), "--min-len", "2"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    with open(out1, "rb") as f:
        loaded = pickle.load(f)
    assert len(loaded) == 3

    # gt bin = tracker boxes + small noise → candidates should match
    from sst_tpu.core.waymo_bin import write_waymo_bin
    frames = []
    for t in trks:
        for ts, b in zip(t.timestamps, t.boxes):
            frames.append(dict(boxes=b[None] + 0.01, scores=[1.0],
                               labels=[0], context_name="ctx",
                               timestamp_micros=ts))
    gt_bin = tmp_path / "gt.bin"
    write_waymo_bin(str(gt_bin), frames)

    out2 = tmp_path / "cands.pkl"
    r = subprocess.run(
        [sys.executable, "tools/ctrl/generate_candidates.py",
         "--tracklets", str(out1), "--gt-bin", str(gt_bin),
         "--out", str(out2)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    with open(out2, "rb") as f:
        cands = pickle.load(f)
    assert all(c["valid"].all() for c in cands)


def test_fsdpp_seed_tool(tmp_path):
    from sst_tpu.core.waymo_bin import write_waymo_bin

    rng = np.random.RandomState(1)
    frames = [dict(
        boxes=np.concatenate(
            [rng.uniform(-20, 20, (4, 3)), rng.uniform(1, 4, (4, 3)),
             rng.uniform(-3, 3, (4, 1))], 1).astype(np.float32),
        scores=np.asarray([0.9, 0.5, 0.2, 0.8]),
        labels=np.asarray([0, 1, 2, 0]),
        context_name="ctx", timestamp_micros=1000 + i,
    ) for i in range(3)]
    bin_path = tmp_path / "dets.bin"
    write_waymo_bin(str(bin_path), frames)

    out = tmp_path / "seeds.pkl"
    r = subprocess.run(
        [sys.executable, "tools/fsdpp/generate_seeds.py",
         "--bin", str(bin_path), "--out", str(out), "--score-thr", "0.3"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    with open(out, "rb") as f:
        seeds = pickle.load(f)
    assert len(seeds) == 3
    k = ("ctx", 1000)
    assert k in seeds and len(seeds[k]["boxes"]) == 3  # 0.2-score dropped


def test_head_velocity_branch():
    import jax
    import jax.numpy as jnp

    from sst_tpu.models.fsd import SparseClusterHeadV2

    head = SparseClusterHeadV2(
        num_classes=2, tasks=(("car",), ("ped",)),
        class_names=("car", "ped"), in_channel=16,
        shared_mlp_dims=(16,), num_cls_layer=1, cls_hidden_dim=16,
        common_attrs=(("center", 3, 1, 16), ("dim", 3, 1, 16), ("rot", 2, 1, 16)),
        with_vel=True,
    )
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    valid = jnp.ones(32, bool)
    variables = head.init(jax.random.PRNGKey(0), feats, valid)
    outs = head.apply(variables, feats, valid)
    assert outs["reg_preds"][0].shape == (32, 10)
    xyz = jnp.asarray(rng.uniform(-5, 5, (32, 3)).astype(np.float32))
    batch_idx = jnp.zeros(32, jnp.int32)
    gt = jnp.asarray(
        np.concatenate([rng.uniform(-5, 5, (1, 4, 3)),
                        rng.uniform(1, 3, (1, 4, 3)),
                        rng.uniform(-3, 3, (1, 4, 1)),
                        rng.randn(1, 4, 2)], -1).astype(np.float32))
    losses = head.loss(outs, xyz, batch_idx, valid, gt,
                       jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), bool))
    assert "loss_vel.task0" in losses
    assert np.isfinite(float(sum(losses.values())))
    res = head.get_bboxes(outs, xyz, batch_idx, valid, 1, max_num=8,
                          nms_pre=16)
    assert res["boxes"].shape[-1] == 9


def test_train_cli_in_train_eval(tmp_path):
    """--eval-interval runs the EvalHook equivalent: a val pass at the
    interval writes val/* metrics to the jsonl log."""
    import json
    import os

    env = dict(os.environ)
    env["SST_TPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    wd = str(tmp_path / "wd")
    r = subprocess.run(
        [sys.executable, "tools/train.py", "configs/sst/sst_tiny_synthetic.py",
         "--synthetic", "--max-steps", "2", "--eval-interval", "2",
         "--eval-samples", "2", "--work-dir", wd],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "eval @ 2" in r.stdout
    recs = [json.loads(line) for line in
            open(os.path.join(wd, "train_log.jsonl"))]
    val = [m for m in recs if "val/mAP" in m]
    assert val and val[-1]["step"] == 2
