"""Flagship model builders at several capacity scales, shared by bench,
tests, and the graft entry.

"sst_waymo" mirrors configs/sst/sst_waymoD5_1x_3class_8heads.py +
configs/_base_/models/sst_base.py: 468x468 pillar grid, 12x12 windows,
drop buckets {30, 60, 100(, 144)}, 6-block d128 SSTv2, SECONDFPN(384),
3-class Anchor3DHead."""

from __future__ import annotations

import numpy as np

from sst_tpu.models import DynamicVoxelNet, PointBatch
from sst_tpu.ops.window import BucketSpec


def sst_waymo(max_points: int = 196608, max_voxels: int = 65536,
              train_buckets: bool = True, dtype=None):
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    # Static caps: a Waymo D5 frame has ~160-180k points in range and ~30k
    # occupied pillars; caps chosen with ~2x headroom (SURVEY §7.3 item 3).
    if train_buckets:
        buckets = (
            BucketSpec(30, 0, 30, 8192),
            BucketSpec(60, 30, 60, 2048),
            BucketSpec(100, 60, 100000, 1024),
        )
    else:
        buckets = (
            BucketSpec(30, 0, 30, 8192),
            BucketSpec(60, 30, 60, 2048),
            BucketSpec(100, 60, 100, 1024),
            BucketSpec(144, 100, 100000, 256),
        )
    return DynamicVoxelNet(
        voxel_size=(0.32, 0.32, 6.0),
        point_cloud_range=(-74.88, -74.88, -2.0, 74.88, 74.88, 4.0),
        max_voxels=max_voxels,
        max_total_windows=16384,
        window_shape=(12, 12),
        buckets=buckets,
        vfe=dict(feat_channels=(64, 128)),
        backbone=dict(
            d_model=(128,) * 6, nhead=(8,) * 6, num_blocks=6,
            dim_feedforward=(256,) * 6, num_attached_conv=3,
            conv_kwargs=(
                {"kernel_size": 3, "dilation": 1},
                {"kernel_size": 3, "dilation": 1},
                {"kernel_size": 3, "dilation": 2},
            ),
            conv_out_channel=128, in_channel=128,
        ),
        neck=dict(out_channels=(384,)),
        head=dict(num_classes=3, feat_channels=384),
        dtype=dtype,
    )


def synthetic_waymo_batch(batch_size: int = 1, num_points: int = 196608, seed: int = 0):
    """A Waymo-like synthetic frame (plausible density distribution)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    p = num_points
    # radial density falloff like a spinning lidar
    r = np.abs(rng.randn(batch_size, p)) * 25 + rng.rand(batch_size, p) * 45
    th = rng.uniform(-np.pi, np.pi, (batch_size, p))
    x = (r * np.cos(th)).astype(np.float32)
    y = (r * np.sin(th)).astype(np.float32)
    z = rng.uniform(-1.5, 3.0, (batch_size, p)).astype(np.float32)
    pts = np.stack([x, y, z], -1)
    valid = (np.abs(x) < 74.8) & (np.abs(y) < 74.8)
    g = 64
    boxes = np.concatenate(
        [
            rng.uniform(-70, 70, (batch_size, g, 2)),
            np.full((batch_size, g, 1), -0.1),
            rng.uniform(0.8, 5.0, (batch_size, g, 3)),
            rng.uniform(-np.pi, np.pi, (batch_size, g, 1)),
        ],
        -1,
    ).astype(np.float32)
    return PointBatch(
        points=jnp.asarray(pts),
        valid=jnp.asarray(valid),
        gt_boxes=jnp.asarray(boxes),
        gt_labels=jnp.asarray(rng.randint(0, 3, (batch_size, g)).astype(np.int32)),
        gt_valid=jnp.asarray(np.ones((batch_size, g), bool)),
    )


def tiny_sst(grid: int = 32):
    """Small config for CPU tests and the multi-chip dryrun."""
    half = grid * 0.4 / 2
    return DynamicVoxelNet(
        voxel_size=(0.4, 0.4, 6.0),
        point_cloud_range=(-half, -half, -2.0, half, half, 4.0),
        max_voxels=512,
        max_total_windows=128,
        window_shape=(4, 4),
        buckets=(BucketSpec(8, 0, 8, 64), BucketSpec(16, 8, 100000, 32)),
        vfe=dict(feat_channels=(16, 32)),
        backbone=dict(
            d_model=(32, 32), nhead=(2, 2), num_blocks=2,
            dim_feedforward=(64, 64), num_attached_conv=1,
            conv_kwargs=({"kernel_size": 3, "dilation": 1},),
            conv_out_channel=32, in_channel=32, remat_blocks=False,
        ),
        neck=dict(out_channels=(64,)),
        head=dict(
            num_classes=3, feat_channels=64,
            anchor_ranges=(
                (-half, -half, -0.0345, half, half, -0.0345),
                (-half, -half, -0.1188, half, half, -0.1188),
                (-half, -half, 0.0, half, half, 0.0),
            ),
        ),
        test_cfg=dict(score_thr=0.1, nms_thr=0.25, nms_pre=64, max_num=32,
                      use_rotate_nms=True),
    )


def tiny_batch(batch_size: int = 2, num_points: int = 512, seed: int = 0):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    pts = rng.uniform(-6, 6, (batch_size, num_points, 3)).astype(np.float32)
    pts[..., 2] = rng.uniform(-1, 2, (batch_size, num_points))
    g = 8
    boxes = np.concatenate(
        [
            rng.uniform(-5, 5, (batch_size, g, 2)),
            np.full((batch_size, g, 1), -0.1),
            rng.uniform(0.8, 4.0, (batch_size, g, 3)),
            rng.uniform(-np.pi, np.pi, (batch_size, g, 1)),
        ],
        -1,
    ).astype(np.float32)
    return PointBatch(
        points=jnp.asarray(pts),
        valid=jnp.asarray(np.ones((batch_size, num_points), bool)),
        gt_boxes=jnp.asarray(boxes),
        gt_labels=jnp.asarray(rng.randint(0, 3, (batch_size, g)).astype(np.int32)),
        gt_valid=jnp.asarray(np.ones((batch_size, g), bool)),
    )
