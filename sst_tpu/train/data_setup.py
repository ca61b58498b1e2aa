"""Train-time dataset selection — the counterpart of the reference's
build_dataset + train_detector(_seq) dispatch (mmdet3d/apis/train.py:18-47,
seq_training_apis.py): picks the dataset class AND the matching collate so
each detector family gets the batch container its loss expects
(PointBatch / TemporalBatch / TrackletBatch)."""

from __future__ import annotations


def default_train_pipeline(point_cloud_range, max_points):
    return [
        dict(type="RandomFlip3D"),
        dict(type="GlobalRotScaleTrans"),
        dict(type="PointsRangeFilter", point_cloud_range=point_cloud_range),
        dict(type="ObjectRangeFilter", point_cloud_range=point_cloud_range),
        dict(type="PointShuffle"),
        dict(type="PadToCap", max_points=max_points),
    ]


def build_train_dataset(cfg, model, synthetic: bool = False, seed: int = 0,
                        batch_size: int = 1):
    """Returns (dataset, collate_or_None, ds_kind, train_pipeline_cfg).

    collate None means the DataLoader default (PointBatch).
    ds_kind: 'synthetic' | 'waymo' | 'waymo_incremental' | 'waymo_tracklet'
      | 'nuscenes' | 'argo2'.
    """
    from sst_tpu.data.datasets import SyntheticDataset, WaymoDataset
    from sst_tpu.data.pipelines import build_pipeline

    data_cfg = cfg.get("data", {})
    cap = cfg.get("capacity", {})
    max_points = cap.get("max_points", 65536)

    # One pipeline list shared by dataset construction AND the
    # DisableAugmentation rebuild (fsd_hooks.py equivalent), so the rebuild
    # filters the pipeline actually in use.
    train_pipeline_cfg = data_cfg.get("train_pipeline") or \
        default_train_pipeline(model.point_cloud_range, max_points)

    ds_kind = "synthetic" if synthetic else data_cfg.get("dataset", "waymo")
    if ds_kind == "waymo" and data_cfg.get("sequential"):
        ds_kind = "waymo_incremental"  # FSD++ multi-frame assembly

    collate = None
    if ds_kind == "synthetic":
        dataset = SyntheticDataset(
            num_samples=max(batch_size * 8, 64),
            num_points=min(max_points, 32768),
            pc_range=model.point_cloud_range,
            pipeline=build_pipeline([
                dict(type="PointsRangeFilter",
                     point_cloud_range=model.point_cloud_range),
                dict(type="PadToCap", max_points=max_points),
            ]),
        )
    elif ds_kind == "waymo_incremental":
        from sst_tpu.data import IncrementalWaymoDataset, collate_temporal

        kw = {}
        for k in ("load_dim", "use_dim"):
            if k in data_cfg:
                kw[k] = data_cfg[k]
        dataset = IncrementalWaymoDataset(
            data_root=data_cfg["data_root"],
            info_path=data_cfg["info_path"],
            load_interval=data_cfg.get("load_interval", 1),
            seeds_path=data_cfg.get("seeds_path"),
            num_previous_frames=data_cfg.get("num_previous_frames", 6),
            max_points=max_points,
            max_seeds=cap.get("max_seeds", 256),
            max_gt=cap.get("max_gt", 128),
            **kw,
        )
        collate = collate_temporal
    elif ds_kind == "waymo_tracklet":
        from sst_tpu.data import WaymoTrackletDataset, collate_tracklets

        dataset = WaymoTrackletDataset(
            data_root=data_cfg["data_root"],
            tracklet_path=data_cfg["tracklet_path"],
            poses_path=data_cfg["poses_path"],
            frame_index_path=data_cfg["frame_index_path"],
            candidates_path=data_cfg.get("candidates_path"),
            max_points=max_points,
            max_frames=cap.get("max_frames", 200),
            seed=seed,
        )
        collate = collate_tracklets
    elif ds_kind == "waymo":
        kw = {}
        for k in ("load_dim", "use_dim"):
            if k in data_cfg:
                kw[k] = data_cfg[k]
        dataset = WaymoDataset(
            data_root=data_cfg["data_root"],
            info_path=data_cfg["info_path"],
            load_interval=data_cfg.get("load_interval", 1),
            pipeline=build_pipeline(train_pipeline_cfg),
            **kw,
        )
    elif ds_kind == "nuscenes":
        from sst_tpu.data.datasets import CBGSDataset, NuScenesDataset

        kw = {}
        for k in ("load_dim", "use_dim", "with_velocity"):
            if k in data_cfg:
                kw[k] = data_cfg[k]
        dataset = NuScenesDataset(
            data_root=data_cfg.get("data_root", "data/nuscenes"),
            info_path=data_cfg.get(
                "info_path", "data/nuscenes/nuscenes_infos_train.pkl"),
            load_interval=data_cfg.get("load_interval", 1),
            pipeline=build_pipeline(train_pipeline_cfg),
            **kw,
        )
        if data_cfg.get("cbgs", False):
            dataset = CBGSDataset(dataset)
    elif ds_kind == "argo2":
        from sst_tpu.data.datasets import Argo2Dataset

        kw = {}
        for k in ("load_dim", "use_dim"):
            if k in data_cfg:
                kw[k] = data_cfg[k]
        dataset = Argo2Dataset(
            data_root=data_cfg.get("data_root", "data/argo2"),
            info_path=data_cfg.get(
                "info_path", "data/argo2/argo2_infos_train.pkl"),
            load_interval=data_cfg.get("load_interval", 1),
            pipeline=build_pipeline(train_pipeline_cfg),
            **kw,
        )
    else:
        raise ValueError(f"unknown data.dataset {ds_kind!r}")

    return dataset, collate, ds_kind, train_pipeline_cfg


def build_val_dataset(cfg, model, synthetic: bool = False,
                      num_samples: int = 32):
    """Validation dataset for in-train evaluation (the reference's
    ``evaluation = dict(interval=...)`` EvalHook). PointBatch families only —
    FSD++ sequential and CTRL tracklet evaluation stay in tools/test.py
    (--sequential), matching the reference's separate sequential test path.

    Returns (dataset, class_names) or (None, None) when the configured
    dataset kind has no in-train eval path.
    """
    from sst_tpu.data.pipelines import build_pipeline

    data_cfg = cfg.get("data", {})
    cap = cfg.get("capacity", {})
    max_points = cap.get("max_points", 65536)
    pipeline = build_pipeline([
        dict(type="PointsRangeFilter",
             point_cloud_range=model.point_cloud_range),
        dict(type="PadToCap", max_points=max_points),
    ])
    ds_kind = "synthetic" if synthetic else data_cfg.get("dataset", "waymo")
    if ds_kind == "synthetic":
        from sst_tpu.data.datasets import SyntheticDataset

        ds = SyntheticDataset(
            num_samples=num_samples, num_points=min(max_points, 32768),
            pc_range=model.point_cloud_range, pipeline=pipeline, seed=991)
        return ds, list(ds.CLASSES)
    if ds_kind not in ("waymo", "nuscenes", "argo2"):
        return None, None
    if "val_info_path" not in data_cfg:
        return None, None
    from sst_tpu.data.datasets import (Argo2Dataset, NuScenesDataset,
                                       WaymoDataset)

    cls = {"waymo": WaymoDataset, "nuscenes": NuScenesDataset,
           "argo2": Argo2Dataset}[ds_kind]
    ds = cls(data_root=data_cfg.get("data_root", ""),
             info_path=data_cfg["val_info_path"], pipeline=pipeline,
             test_mode=True)
    return ds, list(ds.classes)
