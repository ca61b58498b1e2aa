"""build_train_dataset dispatch: each detector family's config selects the
dataset class + collate its loss expects (apis/train.py:18-47 equivalent)."""

import numpy as np

from tests.test_incremental_dataset import seq_data  # noqa: F401 (fixture)
from tests.test_tracklet_dataset import ctrl_world  # noqa: F401 (fixture)


class _ModelStub:
    point_cloud_range = (-8.0, -8.0, -2.0, 8.0, 8.0, 4.0)


def test_synthetic_dispatch():
    from sst_tpu.train.data_setup import build_train_dataset

    cfg = dict(capacity=dict(max_points=1024), data=dict())
    ds, collate, kind, pipe = build_train_dataset(
        cfg, _ModelStub(), synthetic=True, batch_size=2)
    assert kind == "synthetic" and collate is None
    s = ds[0]
    assert s["points"].shape[0] == 1024


def test_waymo_dispatch(seq_data):  # noqa: F811
    from sst_tpu.train.data_setup import build_train_dataset

    cfg = dict(
        capacity=dict(max_points=1024),
        data=dict(dataset="waymo", data_root=str(seq_data),
                  info_path=str(seq_data / "infos.pkl"),
                  load_dim=6, use_dim=(0, 1, 2, 3, 4)),
    )
    ds, collate, kind, pipe = build_train_dataset(cfg, _ModelStub())
    assert kind == "waymo" and collate is None
    # the pipeline list returned is the one the dataset was built with,
    # so the DisableAugmentation rebuild filters the real pipeline
    assert any(p["type"] == "PadToCap" for p in pipe)
    s = ds[0]
    assert s["points"].shape[0] == 1024 and "points_valid" in s


def test_incremental_dispatch(seq_data):  # noqa: F811
    from sst_tpu.models.fsd import TemporalBatch
    from sst_tpu.train.data_setup import build_train_dataset

    cfg = dict(
        capacity=dict(max_points=2048, max_seeds=8, max_gt=8),
        data=dict(dataset="waymo", sequential=True,
                  data_root=str(seq_data),
                  info_path=str(seq_data / "infos.pkl"),
                  seeds_path=str(seq_data / "seeds.pkl"),
                  num_previous_frames=2, load_dim=6, use_dim=(0, 1, 2, 3, 4)),
    )
    ds, collate, kind, _ = build_train_dataset(cfg, _ModelStub())
    assert kind == "waymo_incremental" and collate is not None
    batch = collate([ds[2], ds[3]])
    assert isinstance(batch, TemporalBatch)
    assert batch.points.shape == (2, 2048, 5)
    assert bool(batch.seed_valid.any())


def test_tracklet_dispatch(ctrl_world):  # noqa: F811
    from sst_tpu.models.ctrl import TrackletBatch
    from sst_tpu.train.data_setup import build_train_dataset

    cfg = dict(
        capacity=dict(max_points=4096, max_frames=8),
        data=dict(dataset="waymo_tracklet", data_root=str(ctrl_world),
                  tracklet_path=str(ctrl_world / "tracklets.pkl"),
                  poses_path=str(ctrl_world / "poses.pkl"),
                  frame_index_path=str(ctrl_world / "frame_index.pkl"),
                  candidates_path=str(ctrl_world / "cands.pkl")),
    )
    ds, collate, kind, _ = build_train_dataset(cfg, _ModelStub())
    assert kind == "waymo_tracklet" and collate is not None
    batch = collate([ds[0]])
    assert isinstance(batch, TrackletBatch)
    assert batch.points.shape[1] == 4096
    assert bool(np.asarray(batch.trk_valid).any())
