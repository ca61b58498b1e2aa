# FSD two-stage with an SST (pillar transformer) segmentor encoder —
# counterpart of the reference's configs/fsd/fsd_waymoD1_1x_sst_encoder.py:
# the VoteSegmentor's sparse UNet is replaced by SSTInputLayerV2 + a 4-block
# SSTv2 over a 0.32 m pillar grid (to_bev=False, per-voxel outputs decoded
# back to points); everything after the segmentor matches fsd_waymoD1_1x.
_base_ = ["fsd_waymoD1_1x.py"]

point_cloud_range = (-74.88, -74.88, -2.0, 74.88, 74.88, 4.0)

_segmentor = dict(
    _delete_=True,  # full replacement — the base's UNet keys must not merge
    voxel_size=(0.32, 0.32, 6.0),  # full-height pillars (468x468 grid)
    max_voxels=65536,
    backbone="sst",
    # reference seg_drop_info_training + 12x12 windows
    sst=dict(
        window_shape=(12, 12),
        buckets=((30, 0, 30, 1536), (60, 30, 60, 1280),
                 (100, 60, 100000, 768)),
        max_total_windows=2048,
    ),
    vfe=dict(feat_channels=(64, 64, 128), mode="max"),
    unet=dict(
        d_model=(128,) * 4, nhead=(8,) * 4, num_blocks=4,
        dim_feedforward=(256,) * 4, num_attached_conv=0,
    ),
    head=dict(num_classes=3, hidden_dims=(128, 128)),
)

model = dict(
    single_stage=dict(
        point_cloud_range=point_cloud_range,
        # reference fsd_waymoD1_1x_sst_encoder.py seg_score_thresh
        score_thresh=(0.5, 0.25, 0.25),
        segmentor=_segmentor,
    ),
)
