"""Devkit-free nuScenes converter round-trip on a synthesized mini scene
(reference behavior: tools/data_converter/nuscenes_converter.py
create_nuscenes_infos): geometry of box/velocity/sweep transforms, info
schema consumed by NuScenesDataset, and NDS eval on the produced gts."""

import json
import os
import pickle

import numpy as np
import pytest

from tools.data_converter.nuscenes_converter import (
    create_nuscenes_infos,
    quat_mult,
    quat_to_rot,
    quat_yaw,
)


def _quat_z(theta):
    return [float(np.cos(theta / 2)), 0.0, 0.0, float(np.sin(theta / 2))]


def _write_tables(root, version="v1.0-trainval"):
    """One scene, 3 keyframes 0.5 s apart, ego translating +x at 2 m/s,
    lidar mounted at [0.9, 0, 1.8] rotated 90° about z (realistic nuScenes
    mount), one non-keyframe sweep between keyframes; a moving car and a
    static pedestrian annotated in every frame."""
    tdir = os.path.join(root, version)
    os.makedirs(tdir, exist_ok=True)
    os.makedirs(os.path.join(root, "samples"), exist_ok=True)
    os.makedirs(os.path.join(root, "sweeps"), exist_ok=True)

    lidar_q = _quat_z(np.pi / 2)
    lidar_t = [0.9, 0.0, 1.8]
    t0 = 1_600_000_000_000_000
    dt = 500_000  # 0.5 s in us

    scene = [dict(token="sc0", name="scene-0001", log_token="lg0",
                  first_sample_token="s0", last_sample_token="s2",
                  nbr_samples=3)]
    log = [dict(token="lg0", location="test")]
    sensor = [dict(token="se_l", channel="LIDAR_TOP", modality="lidar")]
    calib = [dict(token="cs0", sensor_token="se_l", translation=lidar_t,
                  rotation=lidar_q, camera_intrinsic=[])]
    samples, sds, poses = [], [], []
    car_v = np.array([3.0, 1.0, 0.0])
    car_p0 = np.array([20.0, 5.0, 1.0])
    ped_p = np.array([12.0, -4.0, 0.9])
    anns, instances = [], [
        dict(token="in_car", category_token="cat_car", nbr_annotations=3,
             first_annotation_token="a0c", last_annotation_token="a2c"),
        dict(token="in_ped", category_token="cat_ped", nbr_annotations=3,
             first_annotation_token="a0p", last_annotation_token="a2p"),
    ]
    category = [dict(token="cat_car", name="vehicle.car"),
                dict(token="cat_ped", name="human.pedestrian.adult")]

    for i in range(3):
        ts = t0 + i * dt
        stoken = f"s{i}"
        samples.append(dict(
            token=stoken, timestamp=ts, scene_token="sc0",
            prev=f"s{i-1}" if i else "", next=f"s{i+1}" if i < 2 else "",
            data={}, anns=[f"a{i}c", f"a{i}p"]))
        # keyframe lidar sample_data + pose (ego at x = 2 t)
        poses.append(dict(token=f"ep{i}", timestamp=ts,
                          translation=[2.0 * i * 0.5, 0.0, 0.0],
                          rotation=_quat_z(0.0)))
        sds.append(dict(
            token=f"sd{i}", sample_token=stoken,
            calibrated_sensor_token="cs0", ego_pose_token=f"ep{i}",
            timestamp=ts, is_key_frame=True,
            filename=f"samples/lidar_{i}.bin",
            prev=f"sw{i-1}" if i else "", next="", fileformat="bin"))
        if i < 2:  # one intermediate sweep between keyframes
            ts_s = ts + dt // 2
            poses.append(dict(token=f"eps{i}", timestamp=ts_s,
                              translation=[2.0 * (i + 0.5) * 0.5, 0.0, 0.0],
                              rotation=_quat_z(0.0)))
            sds.append(dict(
                token=f"sw{i}", sample_token=f"s{i+1}",
                calibrated_sensor_token="cs0", ego_pose_token=f"eps{i}",
                timestamp=ts_s, is_key_frame=False,
                filename=f"sweeps/lidar_{i}.bin",
                prev=f"sd{i}", next=f"sd{i+1}", fileformat="bin"))
        for kind, tok, p, q, size, cat in (
                ("c", f"a{i}c", car_p0 + car_v * (i * 0.5), _quat_z(0.3),
                 [2.0, 4.5, 1.7], "vehicle.car"),
                ("p", f"a{i}p", ped_p, _quat_z(-1.0), [0.7, 0.8, 1.8],
                 "human.pedestrian.adult")):
            anns.append(dict(
                token=tok, sample_token=stoken,
                instance_token="in_car" if kind == "c" else "in_ped",
                translation=list(map(float, p)), size=size, rotation=q,
                prev=f"a{i-1}{kind}" if i else "",
                next=f"a{i+1}{kind}" if i < 2 else "",
                num_lidar_pts=25 if kind == "c" else 4, num_radar_pts=1,
                category_name=cat, visibility_token="4", attribute_tokens=[]))

    for name, rows in (("scene", scene), ("log", log), ("sensor", sensor),
                       ("calibrated_sensor", calib), ("sample", samples),
                       ("sample_data", sds), ("ego_pose", poses),
                       ("sample_annotation", anns), ("instance", instances),
                       ("category", category)):
        with open(os.path.join(tdir, f"{name}.json"), "w") as f:
            json.dump(rows, f)
    rng = np.random.RandomState(0)
    for sd in sds:
        pts = rng.randn(64, 5).astype(np.float32)
        pts.tofile(os.path.join(root, sd["filename"]))
    return dict(lidar_q=lidar_q, lidar_t=np.asarray(lidar_t),
                car_p0=car_p0, car_v=car_v, ped_p=ped_p)


@pytest.fixture(scope="module")
def mini_scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nusc"))
    geo = _write_tables(root)
    paths = create_nuscenes_infos(root, version="v1.0-trainval",
                                  max_sweeps=10, val_ratio=0.0)
    with open(paths[0], "rb") as f:
        data = pickle.load(f)
    return root, geo, data["infos"], paths


def _global_to_lidar(p, ego_t, lidar_q, lidar_t):
    Rl = quat_to_rot(lidar_q)
    return np.linalg.inv(Rl) @ ((p - ego_t) - lidar_t)


class TestConverter:
    def test_schema_and_split(self, mini_scene):
        _, _, infos, paths = mini_scene
        assert len(infos) == 3  # all train (val_ratio 0)
        info = infos[0]
        for k in ("lidar_path", "token", "sweeps", "gt_boxes", "gt_names",
                  "gt_velocity", "num_lidar_pts", "valid_flag", "timestamp"):
            assert k in info, k
        assert info["gt_boxes"].shape == (2, 7)
        assert set(info["gt_names"]) == {"car", "pedestrian"}

    def test_box_center_in_lidar_frame(self, mini_scene):
        _, geo, infos, _ = mini_scene
        info = infos[1]  # frame 1: ego at x=1.0
        i_car = list(info["gt_names"]).index("car")
        want = _global_to_lidar(geo["car_p0"] + geo["car_v"] * 0.5,
                                np.array([1.0, 0, 0]),
                                geo["lidar_q"], geo["lidar_t"])
        np.testing.assert_allclose(info["gt_boxes"][i_car, :3], want,
                                   atol=1e-6)

    def test_yaw_second_convention(self, mini_scene):
        _, geo, infos, _ = mini_scene
        info = infos[0]
        i_car = list(info["gt_names"]).index("car")
        # lidar-frame yaw of the box: global 0.3 minus lidar mount pi/2;
        # stored as -yaw' - pi/2 (SECOND convention)
        yaw_lidar = 0.3 - np.pi / 2
        want = -yaw_lidar - np.pi / 2
        got = info["gt_boxes"][i_car, 6]
        np.testing.assert_allclose(np.angle(np.exp(1j * (got - want))), 0.0,
                                   atol=1e-6)
        # size stays [w, l, h]
        np.testing.assert_allclose(info["gt_boxes"][i_car, 3:6],
                                   [2.0, 4.5, 1.7])

    def test_velocity_finite_difference_in_lidar_frame(self, mini_scene):
        _, geo, infos, _ = mini_scene
        info = infos[1]  # middle frame: central difference
        i_car = list(info["gt_names"]).index("car")
        i_ped = list(info["gt_names"]).index("pedestrian")
        Rl = quat_to_rot(geo["lidar_q"])
        want = (np.linalg.inv(Rl) @ geo["car_v"])[:2]
        np.testing.assert_allclose(info["gt_velocity"][i_car], want,
                                   atol=1e-5)
        np.testing.assert_allclose(info["gt_velocity"][i_ped], [0, 0],
                                   atol=1e-6)

    def test_sweep_transform(self, mini_scene):
        _, geo, infos, _ = mini_scene
        info = infos[1]  # keyframe 1 has sweep sw0 (ego at x=0.5) via prev
        assert len(info["sweeps"]) >= 1
        sw = info["sweeps"][0]
        # a point at the sweep lidar origin lands at the sweep sensor's
        # position in the current lidar frame
        p = np.zeros(3) @ sw["sensor2lidar_rotation"] \
            + sw["sensor2lidar_translation"]
        want = _global_to_lidar(np.array([0.5, 0, 0]) + geo["lidar_t"],
                                np.array([1.0, 0, 0]),
                                geo["lidar_q"], geo["lidar_t"])
        np.testing.assert_allclose(p, want, atol=1e-6)
        # timestamps carried for the time-lag feature channel
        assert sw["timestamp"] < info["timestamp"]

    def test_dataset_roundtrip_and_nds(self, mini_scene):
        root, _, _, paths = mini_scene
        from sst_tpu.core.eval_nuscenes import nusc_eval
        from sst_tpu.data.datasets import NuScenesDataset

        ds = NuScenesDataset(data_root=root, info_path=paths[0])
        assert len(ds) == 3
        s = ds.get_sample(0)
        assert s["points"].shape[1] == 5
        assert s["gt_boxes"].shape[1] == 9  # velocity appended
        # perfect predictions == gts → NDS ~ 1
        # perfect predictions == gts → NDS ~ 1 (labels remapped to the two
        # classes present so absent-class zeros don't dilute the average)
        present = ("car", "pedestrian")
        remap = {ds.classes.index(c): i for i, c in enumerate(present)}
        preds, gts = [], []
        for i in range(len(ds)):
            sm = ds.get_sample(i)
            lab = np.asarray([remap[int(l)] for l in sm["gt_labels"]])
            preds.append(dict(boxes=sm["gt_boxes"],
                              scores=np.ones(len(sm["gt_boxes"])),
                              labels=lab))
            gts.append(dict(boxes=sm["gt_boxes"], labels=lab))
        res = nusc_eval(preds, gts, classes=list(present))
        assert res["NDS"] > 0.95

    def test_mini_split_names(self, tmp_path):
        # v1.0-mini uses the embedded official scene split
        root = str(tmp_path)
        _write_tables(root, version="v1.0-mini")
        paths = create_nuscenes_infos(root, version="v1.0-mini")
        with open(paths[1], "rb") as f:
            val = pickle.load(f)["infos"]
        # scene-0001 is not in MINI_VAL → all samples are train
        assert len(val) == 0

    def test_train_dataset_build_and_one_step(self, mini_scene):
        """fsdv2_nusc-style data cfg → build_train_dataset → collate →
        one train step on a tiny model (VERDICT r2 next-#9 done criterion:
        create_data nuscenes → infos → train step + NDS eval)."""
        import jax

        from sst_tpu.data.datasets import collate_to_batch
        from sst_tpu.flagship import tiny_fsdv2_flagship
        from sst_tpu.train import (
            create_train_state,
            make_jitted_train_step,
            make_optimizer,
        )
        from sst_tpu.train.data_setup import build_train_dataset

        root, _, _, paths = mini_scene
        cfg = {
            "model": {"point_cloud_range": (-3.9, -3.9, -2.0, 3.9, 3.9, 2.0)},
            "capacity": {"max_points": 512, "max_gt": 8},
            "data": {"dataset": "nuscenes", "data_root": root,
                     "info_path": paths[0], "cbgs": True,
                     "load_dim": 5, "use_dim": (0, 1, 2, 3, 4)},
        }
        import types

        stub = types.SimpleNamespace(
            point_cloud_range=cfg["model"]["point_cloud_range"])
        dataset, collate, kind, _ = build_train_dataset(cfg, model=stub)
        assert kind == "nuscenes"
        assert len(dataset) >= 3  # CBGS resampling never shrinks
        samples = [dataset[i] for i in range(2)]
        batch = collate_to_batch(samples)
        assert batch.points.shape[0] == 2

        model = tiny_fsdv2_flagship()
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        state = create_train_state(
            model, variables, make_optimizer(base_lr=1e-4, total_steps=10))
        step = make_jitted_train_step(model)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss_total"]))

    def test_lyft_format_identity_names(self, tmp_path):
        """fmt='lyft': flat category names pass through unmapped (Lyft's
        devkit is a nuScenes fork with the same tables; reference
        counterpart tools/data_converter/lyft_converter.py)."""
        root = str(tmp_path)
        _write_tables(root, version="v1.01-train")
        # overwrite categories with lyft-style flat names
        tdir = os.path.join(root, "v1.01-train")
        cats = json.load(open(os.path.join(tdir, "category.json")))
        anns = json.load(open(os.path.join(tdir, "sample_annotation.json")))
        for c in cats:
            c["name"] = "car" if c["token"] == "cat_car" else "animal"
        for a in anns:
            a["category_name"] = ("car" if a["instance_token"] == "in_car"
                                  else "animal")
        json.dump(cats, open(os.path.join(tdir, "category.json"), "w"))
        json.dump(anns, open(
            os.path.join(tdir, "sample_annotation.json"), "w"))
        paths = create_nuscenes_infos(root, info_prefix="lyft",
                                      version="v1.01-train", fmt="lyft")
        with open(paths[0], "rb") as f:
            infos = pickle.load(f)["infos"]
        assert set(infos[0]["gt_names"]) == {"car", "animal"}
