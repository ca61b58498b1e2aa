"""Functional LiDAR 3D box ops (JAX), mmdet3d-v0.15 box convention.

A box is a row [x, y, z, w, l, h, yaw, (vx, vy)...] where (x, y, z) is the
BOTTOM center, w = x-size, l = y-size, h = z-size, and yaw rotates around +z
with the mmdet3d-0.15 sign (x' = x cos θ + y sin θ, y' = -x sin θ + y cos θ
— see /root/reference/mmdet3d/core/bbox/structures/utils.py:46-51 and
lidar_box3d.py:15).

All functions are batched over a leading N dimension and mask-friendly:
padding rows (zeros) produce finite garbage that callers mask out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def limit_period(val, offset: float = 0.5, period: float = np.pi):
    """Wrap into [-offset*period, (1-offset)*period) (structures/utils.py:5)."""
    return val - jnp.floor(val / period + offset) * period


def rotate_2d(xy, yaw):
    """Rotate [..., 2] points by per-row yaw, mmdet3d axis=2 sign convention."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    x = xy[..., 0] * c + xy[..., 1] * s
    y = -xy[..., 0] * s + xy[..., 1] * c
    return jnp.stack([x, y], axis=-1)


def gravity_center(boxes):
    """[N, 3] center with z at mid-height (lidar_box3d.py:45)."""
    return jnp.concatenate(
        [boxes[:, :2], (boxes[:, 2] + boxes[:, 5] * 0.5)[:, None]], axis=-1
    )


def bev(boxes):
    """[N, 5] (x, y, w, l, yaw) rotated BEV boxes (lidar_box3d.py:117)."""
    return boxes[:, [0, 1, 3, 4, 6]]


def nearest_bev(boxes):
    """[N, 4] axis-aligned (x1, y1, x2, y2) with w/l swapped when the box is
    closer to 90° (lidar_box3d.py:123-141)."""
    b = bev(boxes)
    rot = limit_period(b[:, 4], 0.5, np.pi)
    cond = (jnp.abs(rot) > np.pi / 4)[:, None]
    dims = jnp.where(cond, b[:, [3, 2]], b[:, [2, 3]])
    centers = b[:, :2]
    return jnp.concatenate([centers - dims / 2, centers + dims / 2], axis=-1)


_CORNERS_NORM_2D = np.array(
    [[-0.5, -0.5], [-0.5, 0.5], [0.5, 0.5], [0.5, -0.5]], np.float32
)


def bev_corners(boxes_bev):
    """[N, 4, 2] corners of (x, y, w, l, yaw) BEV boxes, counter-ordered
    consistently for polygon ops."""
    dims = boxes_bev[:, None, 2:4] * _CORNERS_NORM_2D[None]
    rot = rotate_2d(dims, boxes_bev[:, None, 4])
    return rot + boxes_bev[:, None, :2]


def corners(boxes):
    """[N, 8, 3] 3D corners, bottom 4 then top 4 (lidar_box3d.py:54-91)."""
    cb = bev_corners(bev(boxes))
    z0 = jnp.broadcast_to(boxes[:, None, 2], cb.shape[:2])
    z1 = z0 + boxes[:, None, 5]
    bot = jnp.concatenate([cb, z0[..., None]], -1)
    top = jnp.concatenate([cb, z1[..., None]], -1)
    return jnp.concatenate([bot, top], axis=1)


def enlarged_box(boxes, extra_width):
    """Symmetric wlh enlargement, bottom z shifted down (lidar_box3d.py:269)."""
    out = boxes.at[:, 3:6].add(extra_width * 2)
    out = out.at[:, 2].add(-extra_width)
    return out


def points_in_boxes(points_xyz, boxes, margin: float = 0.0):
    """[P, N] bool — rotated containment test.

    Equivalent of the roiaware_pool3d CUDA points_in_boxes
    (/root/reference/mmdet3d/ops/roiaware_pool3d/points_in_boxes.py:6) but as
    one dense masked comparison; callers chunk if P*N is large.
    """
    rel = points_xyz[:, None, :2] - boxes[None, :, :2]
    local = rotate_2d(rel, -boxes[None, :, 6])  # into box frame
    in_x = jnp.abs(local[..., 0]) <= boxes[None, :, 3] / 2 + margin
    in_y = jnp.abs(local[..., 1]) <= boxes[None, :, 4] / 2 + margin
    z = points_xyz[:, None, 2]
    in_z = (z >= boxes[None, :, 2] - margin) & (
        z <= boxes[None, :, 2] + boxes[None, :, 5] + margin
    )
    return in_x & in_y & in_z


def rotate_boxes(boxes, angle):
    """Rotate boxes (and velocities if present) around z by `angle` (scalar)."""
    xy = rotate_2d(boxes[:, :2], jnp.full((boxes.shape[0],), angle))
    out = boxes.at[:, :2].set(xy).at[:, 6].add(angle)
    if boxes.shape[1] > 7:
        v = rotate_2d(boxes[:, 7:9], jnp.full((boxes.shape[0],), angle))
        out = out.at[:, 7:9].set(v)
    return out


def flip_boxes(boxes, axis: str = "x"):
    """BEV flip: 'x' = flip y coords (horizontal), 'y' = flip x (vertical),
    matching LiDARInstance3DBoxes.flip (lidar_box3d.py:209-216). With the
    v0.15 heading unit vector (sin yaw, cos yaw), a y-flip negates cos →
    yaw' = -yaw + pi; an x-flip negates sin → yaw' = -yaw."""
    if axis == "x":
        out = boxes.at[:, 1].mul(-1.0).at[:, 6].set(-boxes[:, 6] + np.pi)
        if boxes.shape[1] > 7:
            out = out.at[:, 8].mul(-1.0)
    else:
        out = boxes.at[:, 0].mul(-1.0).at[:, 6].mul(-1.0)
        if boxes.shape[1] > 7:
            out = out.at[:, 7].mul(-1.0)
    return out


def scale_boxes(boxes, factor):
    out = boxes.at[:, :6].mul(factor)
    if boxes.shape[1] > 7:
        out = out.at[:, 7:9].mul(factor)
    return out
