"""Shared helpers for the CTRL offline pipeline.

Counterpart of /root/reference/tools/ctrl/utils.py — read_bin /
generate_tracklets / get_pc_from_time_stamp, built on the repo's
devkit-free bin codec (sst_tpu/core/waymo_bin.py) and LiDARTracklet.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from sst_tpu.core.tracklet import LiDARTracklet  # noqa: E402
from sst_tpu.core.waymo_bin import (  # noqa: E402
    read_bin_as_frames,
    read_waymo_bin,
)


def read_bin(path: str):
    """Objects bin → list of decoded object dicts (utils.py:12 read_bin)."""
    return read_waymo_bin(path)


def generate_tracklets(bin_path: str, types=(1, 2, 4), min_len: int = 1):
    """Group a tracking bin into LiDARTracklet list (utils.py:18)."""
    tracklets = LiDARTracklet.from_waymo_bin(bin_path, min_len=min_len)
    return [t for t in tracklets if t.type_id in types]


def get_pc_from_time_stamp(timestamp, ts2idx, data_root, split="training"):
    """Load the velodyne points of a timestamp (utils.py:60)."""
    idx = ts2idx[timestamp]
    path = os.path.join(data_root, split, "velodyne", f"{idx}.bin")
    return np.fromfile(path, dtype=np.float32).reshape(-1, 6)


def load_pose_maps(kitti_root: str):
    """poses.pkl ({ts: pose}) + context2timestamp.pkl, as produced by
    tools/ctrl/extract_poses.py."""
    import pickle

    with open(os.path.join(kitti_root, "poses.pkl"), "rb") as f:
        ts2pose = pickle.load(f)
    with open(os.path.join(kitti_root, "context2timestamp.pkl"), "rb") as f:
        context2ts = pickle.load(f)
    return ts2pose, context2ts
