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
    # occupied pillars. The 468/12 = 39x39 window grid bounds TOTAL windows
    # per shift at 1521 (shifted: 1600), and a measured dense frame fills
    # ~1500 of them (582/569/198/114 across the four test buckets) — so the
    # per-bucket caps below carry ~2x headroom while cutting padded window
    # slots 2.6x vs worst-case caps (profiled: flat2window gathers + window
    # MHA scale with slot count; 82 ms + 62 ms at 508k slots). Overflow is
    # observable via num_window_dropped_voxels in the train metrics.
    if train_buckets:
        buckets = (
            BucketSpec(30, 0, 30, 1536),
            BucketSpec(60, 30, 60, 1280),
            BucketSpec(100, 60, 100000, 768),
        )
    else:
        # test-time caps sized from measured occupancy of Waymo-density
        # frames (max over 4 frames x 2 shifts: 667/569/230/114 occupied
        # windows per bucket; the 39x39 window grid bounds the total at
        # ~1600) with ~1.35x headroom — 128k window slots vs 211k at the
        # former 2.2x-headroom caps; attention + flat2window gathers scale
        # with slots. Overflow stays observable via
        # num_window_dropped_voxels.
        buckets = (
            BucketSpec(30, 0, 30, 896),
            BucketSpec(60, 30, 60, 768),
            BucketSpec(100, 60, 100, 320),
            BucketSpec(144, 100, 100000, 160),
        )
    return DynamicVoxelNet(
        voxel_size=(0.32, 0.32, 6.0),
        point_cloud_range=(-74.88, -74.88, -2.0, 74.88, 74.88, 4.0),
        max_voxels=max_voxels,
        max_total_windows=2048,
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


def fsdv2_waymo(max_points: int = 196608, dtype=None, as_rpn: bool = False,
                backbone: str = "dense_bev"):
    """Full-scale FSDv2-Waymo (configs/fsdv2/fsdv2_waymo_1x.py), the
    BASELINE.md flagship: seg voxels 0.25x0.25x0.2 over (-80,80) range,
    0.5m virtual voxels.

    backbone="dense_bev" (default): TPU-native z-packed dense 2D UNet
    segmentor + dense mixer (models/dense_bev.py) — the fast path every
    FLOP of which lands on the MXU.
    backbone="sparse": reference-topology spconv-style UNet + sparse mixer.
    Level caps are sized from measured occupancy of a Waymo-density frame
    (196k points → 119k/184k/76k/22k/3.2k/0.4k active sites; the stride-2
    pad-1 downsample DILATES, so level 1 exceeds level 0).
    """
    if backbone == "dense_bev":
        return fsdv2_waymo_dense(max_points=max_points, dtype=dtype,
                                 as_rpn=as_rpn)
    import jax.numpy as jnp

    from sst_tpu.models.fsd import FSDV2Caps, SingleStageFSDV2

    dtype = dtype or jnp.float32
    return SingleStageFSDV2(
        point_cloud_range=(-80.0, -80.0, -2.0, 80.0, 80.0, 4.0),
        virtual_voxel_size=(0.5, 0.5, 0.5),
        score_thresh=(0.3, 0.25, 0.25),
        caps=FSDV2Caps(
            fg_per_class=(8192, 4096, 4096),
            voxels=81920,
            union_voxels=98304,
            virtual_out=16384,
        ),
        multiscale_levels=(0, 1),
        ms_projector_hiddens=((128,), (128,)),
        ms_output_dim=128,
        segmentor=dict(
            voxel_size=(0.25, 0.25, 0.2),
            max_voxels=131072,
            # measured occupancy (synthetic Waymo-density frame): 119458,
            # 184049, 76228, 21516, 3175, 400 — the k=3/s=2/p=1 downsample
            # dilates, so level 1 NEEDS more slots than level 0.
            unet_level_caps=(131072, 204800, 98304, 32768, 8192, 2048),
            unet_strides=((2, 2, 2),) * 5,
            unet_paddings=((1, 1, 1),) * 5,
            vfe=dict(feat_channels=(64, 64), mode="max"),
            unet=dict(
                in_channels=64, base_channels=64,
                encoder_channels=((128,), (128, 128), (128, 128),
                                  (128, 128, 128), (256, 256, 256),
                                  (256, 256, 256)),
                decoder_channels=((256, 256, 256), (256, 256, 128),
                                  (128, 128, 128), (128, 128, 128),
                                  (128, 128, 128), (128, 128, 128)),
                # full-cap train step overflows HBM without backward
                # rematerialization of the 27-tap gather intermediates
                remat=True,
            ),
            head=dict(num_classes=3, hidden_dims=(128, 128)),
        ),
        vfe=dict(feat_channels=(64, 128), mode="max"),
        mixer=dict(
            base_channels=64, output_channels=128,
            encoder_channels=((64,), (64, 64), (64, 64)),
            decoder_channels=((64, 64, 64), (64, 64, 64), (64, 64, 64)),
            remat=True,
        ),
        head=dict(
            in_channel=128,
            shared_mlp_dims=(256, 256),
            common_attrs=(("center", 3, 2, 128), ("dim", 3, 2, 128),
                          ("rot", 2, 2, 128)),
            num_cls_layer=2,
            cls_hidden_dim=128,
        ),
        as_rpn=as_rpn,
        test_cfg=dict(score_thr=0.1, nms_thr=0.25, nms_pre=1024, max_num=500,
                      use_rotate_nms=True),
        dtype=dtype,
    )


def fsdv2_waymo_dense(max_points: int = 196608, dtype=None,
                      as_rpn: bool = False, z_groups: int = 4,
                      cap_scale: int = 1):
    """TPU-native FSDv2-Waymo flagship: dense-BEV segmentor (z packed into
    channels, 2D UNet at 640² → 80²) + dense z-sliced mixer over the 0.5m
    virtual grid. Same sampling / virtual-voxel / head pipeline as the sparse
    build; only the two gather-bound sparse UNets are replaced by MXU-native
    dense convs (see models/dense_bev.py).

    z_groups: z-band channel slices in the segmentor canvas (4 bands of 7-8
    z-voxels over the 30-voxel column; A/B-selected — G=4 and G=6 both beat
    the sparse UNet, G=4 scored highest and has the cheapest canvas);
    z_groups=1 is the legacy full-column max collapse, which measured -10
    overall mAP (-25 pedestrian) vs the sparse UNet
    (AB_DENSE_SPARSE_r03.json).

    cap_scale: multiply every batch-global capacity (voxel / fg / virtual
    caps are flattened across the batch) — set to the batch size when
    running batched-throughput inference (bench.py bench_fsdv2_b4).

    dtype defaults to bfloat16 (the measured flagship policy): the 640²
    canvas / BEV maps are HBM-bound, so the dtype halves their bytes, and
    the convs double their MXU rate. f32 islands stay where the modules
    keep them (BN statistics, box decode, losses). Quality gates: the
    bf16-vs-f32 dense ablation at matched seeds/steps/scenes is
    AB_DENSE_F32_r05.json (tools/ab_dense_vs_sparse.py --builds dense_f32);
    dense-vs-sparse topology evidence is AB_DENSE_SPARSE_r05.json.
    Pass dtype=jnp.float32 for the full-precision build."""
    import jax.numpy as jnp

    from sst_tpu.models.fsd import FSDV2Caps, SingleStageFSDV2

    dtype = dtype or jnp.bfloat16
    k = cap_scale
    return SingleStageFSDV2(
        point_cloud_range=(-80.0, -80.0, -2.0, 80.0, 80.0, 4.0),
        virtual_voxel_size=(0.5, 0.5, 0.5),
        score_thresh=(0.3, 0.25, 0.25),
        caps=FSDV2Caps(
            fg_per_class=(8192 * k, 4096 * k, 4096 * k),
            voxels=81920 * k,
            union_voxels=81920 * k,  # dense path: union slots == virtual slots
            virtual_out=16384 * k,
        ),
        multiscale_levels=(0, 1),  # decoder maps at 1/4 and 1/2 resolution
        ms_projector_hiddens=((128,), (128,)),
        ms_output_dim=128,
        mixer_type="dense_bev",
        segmentor=dict(
            voxel_size=(0.25, 0.25, 0.2),
            max_voxels=131072 * k,
            backbone="dense_bev",
            z_groups=z_groups,
            # 640²-resolution canvas/out-map widths are HBM-bound: 6 bands
            # x (24+1) in, 6 x 24 out ≈ 250/240 MB f32 per frame (32 -> +60
            # MB each, measured +9 ms on the z6 bench)
            dense_pre_channels=24,
            dense_group_channels=24,
            vfe=dict(feat_channels=(64, 64), mode="max"),
            unet=dict(
                encoder_channels=((64, 64), (128, 128), (256, 256),
                                  (256, 256)),
                decoder_channels=(256, 128, 128),
                out_channels=128,
            ),
            head=dict(num_classes=3, hidden_dims=(128, 128)),
        ),
        vfe=dict(feat_channels=(64, 128), mode="max"),
        mixer=dict(
            z_channels=32, output_channels=128,
            encoder_channels=((128, 128), (128, 128)),
            decoder_channels=(128,),
        ),
        head=dict(
            in_channel=128,
            shared_mlp_dims=(256, 256),
            common_attrs=(("center", 3, 2, 128), ("dim", 3, 2, 128),
                          ("rot", 2, 2, 128)),
            num_cls_layer=2,
            cls_hidden_dim=128,
        ),
        as_rpn=as_rpn,
        test_cfg=dict(score_thr=0.1, nms_thr=0.25, nms_pre=1024, max_num=500,
                      use_rotate_nms=True),
        dtype=dtype,
    )


def tiny_fsdv2_dense(grid: int = 16, z_groups: int = 2):
    """Small dense-BEV FSDv2 for CPU tests (mirrors tiny_fsdv2_flagship).
    z_groups=2 exercises the grouped z-band scatter/decode path by default
    (z_groups=1 = legacy full-column collapse)."""
    from sst_tpu.models.fsd import FSDV2Caps, SingleStageFSDV2

    half = grid * 0.5 / 2
    return SingleStageFSDV2(
        point_cloud_range=(-half, -half, -2.0, half, half, 4.0),
        virtual_voxel_size=(0.5, 0.5, 0.5),
        score_thresh=(0.05, 0.05, 0.05),
        caps=FSDV2Caps(fg_per_class=(64, 32, 32), voxels=256,
                       union_voxels=256, virtual_out=64),
        multiscale_levels=(0,),
        ms_projector_hiddens=((16,),),
        ms_output_dim=16,
        mixer_type="dense_bev",
        segmentor=dict(
            voxel_size=(0.5, 0.5, 0.5),
            max_voxels=256,
            backbone="dense_bev",
            z_groups=z_groups,
            dense_group_channels=16,
            dense_pre_channels=16,
            vfe=dict(feat_channels=(16, 16), mode="max"),
            unet=dict(
                encoder_channels=((16, 16), (16, 16)),
                decoder_channels=(16,),
                out_channels=16,
            ),
            head=dict(num_classes=3, hidden_dims=(16, 16)),
        ),
        vfe=dict(feat_channels=(16, 16), mode="max"),
        mixer=dict(z_channels=8, output_channels=16,
                   encoder_channels=((16, 16), (16, 16)),
                   decoder_channels=(16,)),
        head=dict(
            in_channel=16, shared_mlp_dims=(32,),
            common_attrs=(("center", 3, 1, 16), ("dim", 3, 1, 16),
                          ("rot", 2, 1, 16)),
            num_cls_layer=1, cls_hidden_dim=16,
        ),
        test_cfg=dict(score_thr=0.05, nms_thr=0.25, nms_pre=32, max_num=16,
                      use_rotate_nms=True),
    )


def tiny_fsdv2_flagship(grid: int = 16):
    """Small FSDv2 for the multi-chip dryrun (CPU mesh) and smoke tests."""
    from sst_tpu.models.fsd import FSDV2Caps, SingleStageFSDV2

    half = grid * 0.5 / 2
    return SingleStageFSDV2(
        point_cloud_range=(-half, -half, -2.0, half, half, 4.0),
        virtual_voxel_size=(0.5, 0.5, 0.5),
        score_thresh=(0.05, 0.05, 0.05),
        caps=FSDV2Caps(fg_per_class=(64, 32, 32), voxels=256,
                       union_voxels=512, virtual_out=64),
        multiscale_levels=(0,),
        ms_projector_hiddens=((16,),),
        ms_output_dim=16,
        segmentor=dict(
            voxel_size=(0.5, 0.5, 0.5),
            max_voxels=256,
            unet_level_caps=(256, 128, 64),
            unet_strides=((2, 2, 2),) * 2,
            unet_paddings=((1, 1, 1),) * 2,
            vfe=dict(feat_channels=(16, 16), mode="max"),
            unet=dict(
                in_channels=16, base_channels=16,
                encoder_channels=((16,), (16, 16), (16, 16)),
                decoder_channels=((16, 16, 16), (16, 16, 16), (16, 16, 16)),
            ),
            head=dict(num_classes=3, hidden_dims=(16, 16)),
        ),
        vfe=dict(feat_channels=(16, 16), mode="max"),
        mixer=dict(
            base_channels=16, output_channels=16,
            encoder_channels=((16,), (16, 16)),
            decoder_channels=((16, 16, 16), (16, 16, 16)),
        ),
        mixer_strides=((2, 2, 2),),
        mixer_paddings=((1, 1, 1),),
        head=dict(
            in_channel=16, shared_mlp_dims=(32,),
            common_attrs=(("center", 3, 1, 16), ("dim", 3, 1, 16),
                          ("rot", 2, 1, 16)),
            num_cls_layer=1, cls_hidden_dim=16,
        ),
        test_cfg=dict(score_thr=0.05, nms_thr=0.25, nms_pre=32, max_num=16,
                      use_rotate_nms=True),
    )


def synthetic_waymo_batch(batch_size: int = 1, num_points: int = 196608, seed: int = 0,
                          num_extra_feats: int = 0, pcr_half: float = 74.8):
    """A Waymo-like synthetic frame: radial density falloff + surface
    structure (ground plane + clustered verticals), so voxel occupancy
    matches real lidar (~60-90k voxels at 0.25 m for ~190k points) rather
    than one-point-per-voxel uniform noise."""
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    p = num_points
    # ground returns lie on scan rings (64 beams x dense azimuth): adjacent
    # azimuth steps land in the same 0.25 m voxel near the sensor, giving the
    # ~2 points/voxel concentration of real spinning lidar.
    n_beams = 64
    beam = rng.randint(0, n_beams, (batch_size, p))
    elev = -np.radians(1.0 + 17.0 * (beam + 0.5) / n_beams)  # -1 .. -18 deg
    ring_r = np.clip(2.1 / np.tan(-elev), 0.0, 78.0)
    az = rng.uniform(-np.pi, np.pi, (batch_size, p))
    rr = ring_r * (1 + rng.randn(batch_size, p) * 0.01)
    x = (rr * np.cos(az)).astype(np.float32)
    y = (rr * np.sin(az)).astype(np.float32)
    z_ground = (rng.randn(batch_size, p) * 0.05 - 0.8).astype(np.float32)
    # 30% of returns hit vertical structures clustered in xy
    is_ground = rng.rand(batch_size, p) < 0.7
    n_struct = 1024
    cx = rng.uniform(-pcr_half, pcr_half, (batch_size, n_struct))
    cy = rng.uniform(-pcr_half, pcr_half, (batch_size, n_struct))
    which = rng.randint(0, n_struct, (batch_size, p))
    xs = np.take_along_axis(cx, which, 1) + rng.randn(batch_size, p) * 0.6
    ys = np.take_along_axis(cy, which, 1) + rng.randn(batch_size, p) * 0.6
    z_struct = rng.uniform(-1.0, 3.0, (batch_size, p)).astype(np.float32)
    x = np.where(is_ground, x, xs.astype(np.float32))
    y = np.where(is_ground, y, ys.astype(np.float32))
    z = np.where(is_ground, z_ground, z_struct).astype(np.float32)
    pts = np.stack([x, y, z], -1)
    if num_extra_feats:
        pts = np.concatenate(
            [pts, rng.rand(batch_size, p, num_extra_feats).astype(np.float32)], -1
        )
    valid = (np.abs(x) < pcr_half) & (np.abs(y) < pcr_half)
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


# --------------------------------------------------------------------------
# tiny builds of the remaining three families (FSD two-stage, FSD++, CTRL)
# — canonical small configs shared by tests and the multi-chip dryrun
# (reference capability: all five families train DDP, tools/dist_train.sh:8)

_TINY_FSD_PCR = (-8.0, -8.0, -2.0, 8.0, 8.0, 4.0)


def tiny_fsd():
    """Tiny SingleStageFSD (segmentor → CCL clustering → SIR → cluster head)."""
    from sst_tpu.models.fsd import FSDCaps, SingleStageFSD

    return SingleStageFSD(
        point_cloud_range=_TINY_FSD_PCR,
        score_thresh=(0.05, 0.05, 0.05),
        cluster_voxel_size=((0.3, 0.3, 6.0), (0.05, 0.05, 6.0),
                            (0.2, 0.2, 6.0)),
        connected_dist=(0.6, 0.1, 0.4),
        min_points=1,
        pre_voxelization_size=(0.1, 0.1, 0.1),
        caps=FSDCaps(
            fg_per_class=(256, 128, 128),
            cluster_voxels_per_class=(256, 256, 256),
            clusters_per_class=(32, 32, 32),
            pre_voxels=1024,
        ),
        segmentor=dict(
            voxel_size=(0.25, 0.25, 0.2),
            max_voxels=1024,
            unet_level_caps=(1024, 512, 256, 128),
            unet_strides=((2, 2, 2),) * 3,
            unet_paddings=((1, 1, 1),) * 3,
            vfe=dict(feat_channels=(16, 16), mode="max"),
            unet=dict(
                in_channels=16, base_channels=16,
                encoder_channels=((16,), (16, 16), (32, 32)),
                decoder_channels=((32, 32, 16), (16, 16, 16), (16, 16, 16)),
            ),
            head=dict(num_classes=3, hidden_dims=(32, 32)),
        ),
        backbone=dict(
            num_blocks=2,
            in_channels=(0, 0),
            feat_channels=((32, 32), (32, 32)),
            rel_mlp_hidden=((8, 8), (8, 8)),
        ),
        head=dict(
            in_channel=128,
            shared_mlp_dims=(64, 64),
            common_attrs=(("center", 3, 1, 32), ("dim", 3, 1, 32),
                          ("rot", 2, 1, 32)),
            num_cls_layer=1,
            cls_hidden_dim=32,
        ),
        test_cfg=dict(score_thr=0.05, nms_thr=0.25, nms_pre=64, max_num=32,
                      use_rotate_nms=True),
    )


def tiny_fsd_grouped():
    """Tiny SingleStageFSD in group_sample mode (the Argo2 26-class recipe,
    single_stage_fsd.py:818, scaled down to 5 classes in 2 groups): the
    segmentor head carries a background column (6 logits), sampling and
    clustering run per group, head tasks are the groups."""
    from sst_tpu.models.fsd import FSDCaps, SingleStageFSD

    class_names = ("A", "B", "C", "D", "E")
    return SingleStageFSD(
        point_cloud_range=_TINY_FSD_PCR,
        num_classes=5,
        class_names=class_names,
        group_names=(class_names[:2], class_names[2:]),
        score_thresh=(0.05, 0.05),
        cluster_voxel_size=((0.3, 0.3, 6.0), (0.2, 0.2, 6.0)),
        connected_dist=(0.6, 0.4),
        min_points=1,
        pre_voxelization_size=(0.1, 0.1, 0.1),
        caps=FSDCaps(
            fg_per_class=(256, 128),
            cluster_voxels_per_class=(256, 256),
            clusters_per_class=(32, 32),
            pre_voxels=1024,
        ),
        segmentor=dict(
            voxel_size=(0.25, 0.25, 0.2),
            max_voxels=1024,
            unet_level_caps=(1024, 512, 256, 128),
            unet_strides=((2, 2, 2),) * 3,
            unet_paddings=((1, 1, 1),) * 3,
            vfe=dict(feat_channels=(16, 16), mode="max"),
            unet=dict(
                in_channels=16, base_channels=16,
                encoder_channels=((16,), (16, 16), (32, 32)),
                decoder_channels=((32, 32, 16), (16, 16, 16), (16, 16, 16)),
            ),
            head=dict(num_classes=6, hidden_dims=(32, 32)),  # + background
        ),
        backbone=dict(
            num_blocks=2,
            in_channels=(0, 0),
            feat_channels=((32, 32), (32, 32)),
            rel_mlp_hidden=((8, 8), (8, 8)),
        ),
        head=dict(
            in_channel=128,
            shared_mlp_dims=(64, 64),
            common_attrs=(("center", 3, 1, 32), ("dim", 3, 1, 32),
                          ("rot", 2, 1, 32)),
            num_cls_layer=1,
            cls_hidden_dim=32,
        ),
        test_cfg=dict(score_thr=0.05, nms_thr=0.25, nms_pre=64, max_num=32,
                      use_rotate_nms=True),
    )


def _tiny_roi_head_cfg(max_inbox_point: int = 32):
    return dict(
        max_inbox_point=max_inbox_point,
        bbox_head=dict(
            num_blocks=2,
            feat_channels=((32, 32),) * 2,
            rel_mlp_hidden=((8, 8),) * 2,
            reg_mlp=(64, 64),
            cls_mlp=(64, 64),
        ),
    )


def _single_stage_cfg(ss):
    return {f.name: getattr(ss, f.name)
            for f in ss.__dataclass_fields__.values()
            if f.name not in ("parent", "name", "dtype")}


def tiny_fsd_two_stage():
    """Tiny FSD (two-stage: + GroupCorrectionHead / SIR² refinement)."""
    from sst_tpu.models.fsd import FSD

    return FSD(
        single_stage=_single_stage_cfg(tiny_fsd()),
        roi_head=_tiny_roi_head_cfg(),
        rois_per_sample=16,
    )


def tiny_fsdpp():
    """Tiny TwoStageFSDPP (incremental multi-frame FSD++)."""
    from sst_tpu.models.fsd import TwoStageFSDPP

    return TwoStageFSDPP(
        fsd=dict(
            single_stage=_single_stage_cfg(tiny_fsd()),
            roi_head=_tiny_roi_head_cfg(),
            rois_per_sample=16,
        ),
        point_cloud_range=_TINY_FSD_PCR,
        inc_voxel_size=(0.4, 0.4, 0.4),
        pre_score_thr=0.1,
        center_noise=0.1, dim_noise=0.05, yaw_noise=0.1,
    )


def tiny_ctrl():
    """Tiny CTRL TrackletDetector (tracklet segmentor + track RoI head)."""
    from sst_tpu.models.ctrl import TrackletDetector

    return TrackletDetector(
        segmentor=dict(
            point_cloud_range=(-3.2, -3.2, -4.0, 3.2, 3.2, 4.0),
            voxel_size=(0.2, 0.2, 0.4),
            max_voxels=512,
            unet_level_caps=(512, 256, 128),
            vfe=dict(feat_channels=(16, 16), mode="max"),
            unet=dict(
                in_channels=16, base_channels=16,
                encoder_channels=((16,), (16, 16), (16, 16)),
                decoder_channels=((16, 16, 16), (16, 16, 16), (16, 16, 16)),
            ),
        ),
        roi_head=dict(num_classes=1, **_tiny_roi_head_cfg()),
    )


def fsd_batch(rng, b=2, p=1024, g=6):
    """Clustered PointBatch in the tiny-FSD range so fg/clustering paths
    are exercised."""
    import jax.numpy as jnp

    boxes = np.concatenate(
        [
            rng.uniform(-6, 6, (b, g, 2)),
            np.full((b, g, 1), -0.5),
            rng.uniform(1.0, 3.0, (b, g, 3)),
            rng.uniform(-np.pi, np.pi, (b, g, 1)),
        ],
        -1,
    ).astype(np.float32)
    pts = []
    for i in range(b):
        obj = boxes[i, rng.randint(0, g, p // 2), :3] \
            + rng.randn(p // 2, 3) * 0.5
        bgp = rng.uniform(-7, 7, (p - p // 2, 3))
        pp = np.concatenate([obj, bgp]).astype(np.float32)
        pp[:, 2] = np.clip(pp[:, 2], -1.5, 3.5)
        inten = rng.rand(p, 2).astype(np.float32)
        pts.append(np.concatenate([pp, inten], -1))
    return PointBatch(
        points=jnp.asarray(np.stack(pts)),
        valid=jnp.ones((b, p), bool),
        gt_boxes=jnp.asarray(boxes),
        gt_labels=jnp.asarray(rng.randint(0, 3, (b, g)).astype(np.int32)),
        gt_valid=jnp.ones((b, g), bool),
    )


def temporal_batch(rng, b=2, p=1024, g=6, s=8):
    """TemporalBatch (FSD++): fsd_batch + frame indices + seed boxes."""
    import jax.numpy as jnp

    from sst_tpu.models.fsd import TemporalBatch

    base = fsd_batch(rng, b, p, g)
    frame_inds = jnp.asarray(rng.randint(0, 3, (b, p)).astype(np.int32))
    seed_boxes = np.concatenate(
        [rng.uniform(-6, 6, (b, s, 2)), np.full((b, s, 1), -0.5),
         rng.uniform(1, 3, (b, s, 3)), rng.uniform(-3, 3, (b, s, 1))], -1,
    ).astype(np.float32)
    return TemporalBatch(
        points=base.points, valid=base.valid, frame_inds=frame_inds,
        gt_boxes=base.gt_boxes, gt_labels=base.gt_labels,
        gt_valid=base.gt_valid,
        seed_boxes=jnp.asarray(seed_boxes),
        seed_labels=jnp.asarray(rng.randint(0, 3, (b, s)).astype(np.int32)),
        seed_scores=jnp.asarray(rng.rand(b, s).astype(np.float32)),
        seed_valid=jnp.ones((b, s), bool),
    )


def tracklet_batch(rng, b=2, p=512, f=8):
    """TrackletBatch (CTRL): track-frame points + tracker boxes + gts."""
    import jax.numpy as jnp

    from sst_tpu.models.ctrl import TrackletBatch

    pts = np.clip(rng.randn(b, p, 3).astype(np.float32), -3.0, 3.0)
    inten = rng.rand(b, p, 2).astype(np.float32)
    ts = rng.randint(0, f, (b, p)).astype(np.int32)
    points = np.concatenate(
        [pts, inten, ts[..., None].astype(np.float32) * 0.1], -1)
    trk = np.concatenate(
        [rng.uniform(-0.5, 0.5, (b, f, 2)), np.full((b, f, 1), -1.0),
         np.tile([[.9, 2.0, 1.5]], (b, f, 1))
         * rng.uniform(0.9, 1.1, (b, f, 3)),
         rng.uniform(-0.3, 0.3, (b, f, 1))], -1,
    ).astype(np.float32)
    gt = trk + rng.randn(b, f, 7).astype(np.float32) * 0.05
    return TrackletBatch(
        points=jnp.asarray(points),
        valid=jnp.ones((b, p), bool),
        frame_inds=jnp.asarray(ts),
        trk_boxes=jnp.asarray(trk),
        trk_scores=jnp.asarray(rng.rand(b, f).astype(np.float32)),
        trk_valid=jnp.ones((b, f), bool),
        labels=jnp.zeros((b,), jnp.int32),
        gt_boxes=jnp.asarray(gt),
        gt_valid=jnp.ones((b, f), bool),
    )


# --------------------------------------------------------------------------
# labeled synthetic scenes: gt boxes GENERATE their points, so detection
# quality on held-out scenes is a meaningful metric (dense-vs-sparse A/B,
# convergence soaks). Class size priors follow the Waymo anchor sizes.

_CLASS_SIZE_PRIORS = (
    # (l_lo, l_hi, w_lo, w_hi, h_lo, h_hi)
    (3.8, 5.5, 1.7, 2.2, 1.5, 2.0),   # Car / Vehicle
    (0.6, 1.0, 0.6, 1.0, 1.6, 1.9),   # Pedestrian
    (1.6, 2.0, 0.6, 0.9, 1.5, 1.9),   # Cyclist
)


def synthetic_labeled_batch(batch_size: int = 1, num_points: int = 196608,
                            seed: int = 0, num_extra_feats: int = 2,
                            pcr_half: float = 79.8, num_objects: int = 48,
                            size_scale: float = 1.0):
    """Waymo-like scene whose gt boxes OWN their points.

    Background = the lidar-like generator of synthetic_waymo_batch (ground
    rings + vertical clutter); on top, ``num_objects`` boxes with
    class-dependent size priors each replace a range-scaled number of
    background points with points sampled inside the (rotated) box. Returns
    (PointBatch, gt_meta) where gt_meta[i] carries per-box 'num_points' for
    L1/L2 eval levels."""
    import jax.numpy as jnp

    base = synthetic_waymo_batch(batch_size, num_points, seed,
                                 num_extra_feats, pcr_half)
    rng = np.random.RandomState(seed + 70000)
    pts = np.asarray(base.points).copy()
    g = num_objects
    boxes = np.zeros((batch_size, g, 7), np.float32)
    labels = rng.randint(0, 3, (batch_size, g)).astype(np.int32)
    npts_meta = np.zeros((batch_size, g), np.int64)
    gvalid = np.ones((batch_size, g), bool)
    for i in range(batch_size):
        # centers on a coarse grid → no overlapping objects
        cells = rng.choice((2 * 24) ** 2, size=g, replace=False)
        cx = (cells % 48 - 24 + rng.uniform(0.25, 0.75, g)) * (pcr_half / 24.4)
        cy = (cells // 48 - 24 + rng.uniform(0.25, 0.75, g)) * (pcr_half / 24.4)
        cursor = 0
        for j in range(g):
            lo_hi = _CLASS_SIZE_PRIORS[labels[i, j]]
            l = rng.uniform(lo_hi[0], lo_hi[1]) * size_scale
            w = rng.uniform(lo_hi[2], lo_hi[3]) * size_scale
            h = rng.uniform(lo_hi[4], lo_hi[5]) * size_scale
            yaw = rng.uniform(-np.pi, np.pi)
            zb = -0.9
            boxes[i, j] = (cx[j], cy[j], zb, w, l, h, yaw)
            r = float(np.hypot(cx[j], cy[j]))
            # beam-density falloff: ~1/r points, scaled by footprint and by
            # the frame's point budget; never overrun the (static) buffer
            base = 9000.0 * num_points / 196608
            n = int(np.clip(base * np.sqrt(l * w) / max(r, 5.0), 8, 1500))
            n = min(n, num_points - cursor)
            if n <= 0:  # point budget exhausted: drop the box entirely
                boxes[i, j, :] = 0
                gvalid[i, j] = False
                continue
            local = np.stack([
                rng.uniform(-l / 2, l / 2, n),
                rng.uniform(-w / 2, w / 2, n),
                rng.uniform(0, h, n)], -1).astype(np.float32)
            # push most points to the hull (lidar sees surfaces)
            surf = rng.rand(n) < 0.8
            ax = rng.randint(0, 2, n)
            local[surf & (ax == 0), 0] = np.sign(
                local[surf & (ax == 0), 0]) * l / 2
            local[surf & (ax == 1), 1] = np.sign(
                local[surf & (ax == 1), 1]) * w / 2
            c, s = np.cos(yaw), np.sin(yaw)
            gx = local[:, 0] * c - local[:, 1] * s + cx[j]
            gy = local[:, 0] * s + local[:, 1] * c + cy[j]
            gz = local[:, 2] + zb
            sl = slice(cursor, cursor + n)
            pts[i, sl, 0] = gx
            pts[i, sl, 1] = gy
            pts[i, sl, 2] = gz
            npts_meta[i, j] = n
            cursor += n
        # shuffle so object points are not index-contiguous
        perm = rng.permutation(num_points)
        pts[i] = pts[i][perm]
    batch = PointBatch(
        points=jnp.asarray(pts),
        valid=jnp.asarray(
            (np.abs(pts[..., 0]) < pcr_half)
            & (np.abs(pts[..., 1]) < pcr_half)),
        gt_boxes=jnp.asarray(boxes),
        gt_labels=jnp.asarray(labels),
        gt_valid=jnp.asarray(gvalid),
    )
    gt_meta = [dict(boxes=boxes[i][gvalid[i]], labels=labels[i][gvalid[i]],
                    num_points=npts_meta[i][gvalid[i]])
               for i in range(batch_size)]
    return batch, gt_meta
