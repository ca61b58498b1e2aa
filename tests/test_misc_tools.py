"""tools/misc + tools/vis CLIs (reference tools/misc/*, tools/vis/show_bin.py)."""

import os
import pickle
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs/sst/sst_tiny_synthetic.py")


def _run(args, **kw):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=600, **kw)


def test_print_config_cli():
    r = _run(["tools/misc/print_config.py", CFG,
              "--cfg-options", "data.samples_per_device=2"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Config:" in r.stdout and "model" in r.stdout
    assert "'samples_per_device': 2" in r.stdout.replace('"', "'")


def test_browse_dataset_cli(tmp_path):
    out = str(tmp_path / "browse")
    r = _run(["tools/misc/browse_dataset.py", CFG, "--synthetic",
              "--num", "2", "--output-dir", out, "--objs"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "sample_0000.png"))
    assert os.path.exists(os.path.join(out, "sample_0001", "sample_0001_points.obj"))


def test_visualize_results_cli(tmp_path):
    res = [dict(boxes=np.array([[1, 2, 0.5, 4, 2, 1.5, 0.1, 0.9, 0]], np.float32)[:, :7],
                scores=np.array([0.9], np.float32),
                labels=np.array([0]), valid=np.array([True]))]
    pkl = str(tmp_path / "preds.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(res, f)
    show = str(tmp_path / "vis")
    r = _run(["tools/misc/visualize_results.py", CFG, "--synthetic",
              "--result", pkl, "--show-dir", show])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(show, "frame_0000",
                                       "frame_0000_pred.obj"))


def test_show_bin_cli(tmp_path):
    from sst_tpu.core.waymo_bin import write_waymo_bin

    frames = [dict(
        context_name="ctx", timestamp_micros=1234,
        boxes=np.array([[5.0, 1.0, 0.5, 4.0, 1.8, 1.5, 0.2]], np.float32),
        scores=np.array([0.8], np.float32), labels=np.array([0]),
    )]
    binp = str(tmp_path / "preds.bin")
    write_waymo_bin(binp, frames)
    out = str(tmp_path / "vis_folder")
    r = _run(["tools/vis/show_bin.py", "--bin-path", binp, "--no-gt",
              "--save-folder", out, "--interval", "1"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "1234.png"))


def test_fuse_conv_bn_equivalence():
    sys.path.insert(0, REPO)
    from sst_tpu.models.layers import ConvNormAct
    from tools.misc.fuse_conv_bn import fuse_variables

    class Net:  # two stacked ConvNormActs
        pass

    import flax.linen as nn

    class TwoConv(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = ConvNormAct(8, 3)(x, train)
            return ConvNormAct(4, 3)(x, train)

    m = TwoConv()
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 3).astype(np.float32))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    # make BN stats non-trivial so fusion actually moves numbers
    out1, st = m.apply(vars_, x, train=True, mutable=["batch_stats"])
    vars_ = {**vars_, **st}
    ref = m.apply(vars_, x, train=False)
    fused = fuse_variables(jax.tree_util.tree_map(np.asarray, vars_))
    got = m.apply(fused, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_dist_train_wrapper_checks_devices():
    """dist_train.sh forwards the chip count as --expect-devices; a wrong
    count must abort before any training work."""
    env = dict(os.environ)
    # hermetic: force the CPU backend (train.py honors SST_TPU_PLATFORM) so
    # the device check never touches the remote TPU client — which can hang
    # the whole subprocess when the axon backend is down
    env["SST_TPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    r = subprocess.run(
        ["bash", "tools/dist_train.sh", CFG, "997", "--synthetic",
         "--max-steps", "1", "--work-dir", "/tmp/_dist_smoke"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode != 0
    assert "--expect-devices 997" in (r.stdout + r.stderr)


def test_analyze_logs_cli(tmp_path):
    import json as _json
    log = tmp_path / "train_log.jsonl"
    with open(log, "w") as f:
        for i in range(1, 6):
            f.write(_json.dumps({"step": i * 50, "wall": i * 10.0,
                                 "loss_total": 5.0 / i}) + "\n")
    r = _run(["tools/analysis_tools/analyze_logs.py", "cal_train_time",
              str(log)])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "per-step time" in r.stdout
    out = tmp_path / "c.png"
    r = _run(["tools/analysis_tools/analyze_logs.py", "plot_curve", str(log),
              "--keys", "loss_total", "--out", str(out)])
    assert r.returncode == 0, r.stderr[-2000:]


def test_eval_nus_json_cli(tmp_path):
    """Perfect global-frame predictions against a synthesized info pkl score
    NDS ~1 (the tool inverts the lidar->ego->global chain)."""
    import json as _json
    import pickle as _pkl

    import numpy as np

    rng = np.random.RandomState(0)
    classes = ("car", "pedestrian")
    # one sample, ego rotated 30deg and offset
    yaw_e = np.pi / 6
    q_eg = [np.cos(yaw_e / 2), 0, 0, np.sin(yaw_e / 2)]
    t_eg = [100.0, -50.0, 1.0]
    gt = np.array([[5.0, 2.0, -1.0, 2.0, 4.0, 1.6, 0.4],
                   [-3.0, 7.0, -0.8, 0.7, 0.8, 1.7, -1.2]], np.float32)
    names = ["car", "pedestrian"]
    info = dict(token="tok0", gt_boxes=gt, gt_names=names,
                gt_velocity=np.zeros((2, 2), np.float32),
                lidar2ego_rotation=[1.0, 0, 0, 0],
                lidar2ego_translation=[0.0, 0.0, 0.0],
                ego2global_rotation=q_eg, ego2global_translation=t_eg)
    info_path = tmp_path / "infos.pkl"
    with open(info_path, "wb") as f:
        _pkl.dump([info], f)

    # build global-frame submission entries from the lidar gt
    R = np.array([[np.cos(yaw_e), -np.sin(yaw_e), 0],
                  [np.sin(yaw_e), np.cos(yaw_e), 0], [0, 0, 1]])
    entries = []
    for row, name in zip(gt, names):
        ctr = row[:3].copy(); ctr[2] += row[5] / 2
        g = R @ ctr + np.asarray(t_eg)
        gyaw = row[6] + yaw_e
        entries.append(dict(
            translation=g.tolist(), size=row[3:6].tolist(),
            rotation=[float(np.cos(gyaw / 2)), 0.0, 0.0,
                      float(np.sin(gyaw / 2))],
            velocity=[0.0, 0.0], detection_name=name, detection_score=0.9))
    res_path = tmp_path / "results_nusc.json"
    with open(res_path, "w") as f:
        _json.dump({"results": {"tok0": entries}, "meta": {}}, f)

    r = _run(["tools/analysis_tools/eval_nus_json.py", str(res_path),
              "--info-path", str(info_path)])
    assert r.returncode == 0, r.stderr[-2000:]
    last = r.stdout.strip().splitlines()[-1]
    out = _json.loads(last)
    # per-class APs perfect for the two present classes (the global mAP/NDS
    # average over all 10 detection classes, 8 of which have no gt here)
    for cls in ("car", "pedestrian"):
        for t in (0.5, 1.0, 2.0, 4.0):
            assert out[f"{cls}_AP_dist_{t}"] > 0.99, out
    assert out["mATE"] < 0.01 and out["mAOE"] < 0.01, out
