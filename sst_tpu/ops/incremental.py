"""Incremental (multi-frame residual) point ops for FSD++.

TPU rebuild of /root/reference/mmdet3d/models/detectors/incremental_ops.py:
  - find_delta_points_by_voxelization(_list_v3) (:45,:103): points of the
    current frame whose voxel is NOT occupied by any previous frame
    (TorchEx `incremental_points_mask` CUDA hash). Here: one boolean
    occupancy canvas scatter + a gather — static shapes, no sort.
  - points_frame_transform (:178), box_frame_transform_gpu (:125): rigid
    pose transforms of points / 7-dof (or 9-dof velocity) boxes between
    ego frames.

All functions take validity masks instead of ragged tensors; "removed"
points stay in place with valid=False (the downstream detectors consume
masks, so no compaction is needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def points_frame_transform(points_xyz, pre_pose, cur_pose_inv):
    """Map [N, 3] points from a previous ego frame into the current one."""
    mm = cur_pose_inv @ pre_pose
    return points_xyz @ mm[:3, :3].T + mm[:3, 3]


def box_frame_transform(boxes, pre_pose, cur_pose_inv):
    """Map [N, 7(+2)] LiDAR boxes between ego frames; yaw via the heading
    unit vector trick (incremental_ops.py:125-160). mmdet3d v0.15 heading
    unit vector = (sin(yaw), cos(yaw), 0)."""
    mm = cur_pose_inv @ pre_pose
    centers = boxes[:, :3] @ mm[:3, :3].T + mm[:3, 3]
    yaw = boxes[:, 6]
    heading = jnp.stack(
        [jnp.sin(yaw), jnp.cos(yaw), jnp.zeros_like(yaw)], axis=-1
    )
    heading = heading @ mm[:3, :3].T
    new_yaw = jnp.arctan2(heading[:, 0], heading[:, 1])
    out = jnp.concatenate(
        [centers, boxes[:, 3:6], new_yaw[:, None]], axis=-1
    )
    if boxes.shape[1] >= 9:
        vel = jnp.concatenate(
            [boxes[:, 7:9], jnp.zeros_like(boxes[:, :1])], axis=-1
        ) @ mm[:3, :3].T
        out = jnp.concatenate([out, vel[:, :2]], axis=-1)
    return out


def _voxel_keys(points_xyz, valid, point_cloud_range, voxel_size):
    pcr = jnp.asarray(point_cloud_range, jnp.float32)
    vs = jnp.asarray(voxel_size, jnp.float32)
    nx = int((point_cloud_range[3] - point_cloud_range[0]) / voxel_size[0]) + 1
    ny = int((point_cloud_range[4] - point_cloud_range[1]) / voxel_size[1]) + 1
    nz = int((point_cloud_range[5] - point_cloud_range[2]) / voxel_size[2]) + 1
    c = jnp.floor((points_xyz - pcr[None, :3]) / vs[None]).astype(jnp.int32)
    ok = valid & (c >= 0).all(-1) & (c[:, 0] < nx) & (c[:, 1] < ny) & (c[:, 2] < nz)
    key = (c[:, 2] * ny + c[:, 1]) * nx + c[:, 0]
    size = nx * ny * nz
    return jnp.where(ok, key, size), ok, size


def delta_points_mask(cur_xyz, cur_valid, prev_xyz, prev_valid,
                      point_cloud_range, voxel_size):
    """[P_cur] mask of current points whose voxel is empty in the previous
    point set (per sample). Current points outside the range are kept
    (reference keeps out-of-range behavior by masking only in-range)."""
    pkey, pok, size = _voxel_keys(prev_xyz, prev_valid, point_cloud_range,
                                  voxel_size)
    occ = jnp.zeros((size + 1,), jnp.bool_).at[pkey].set(True, mode="drop")
    ckey, cok, _ = _voxel_keys(cur_xyz, cur_valid, point_cloud_range,
                               voxel_size)
    seen = occ[jnp.minimum(ckey, size)]
    return cur_valid & (~cok | ~seen)
