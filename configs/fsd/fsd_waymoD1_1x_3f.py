# FSD two-stage on 3-sweep Waymo frames (counterpart of the reference's
# configs/fsd/fsd_waymoD1_1x_3f.py): LoadPointsFromMultiSweeps concatenates
# two past sweeps with a time-lag channel; the segmentor average-dedups the
# overlapping sweeps at 0.05 m (voxel_downsampling_size) before voxelizing,
# and tanh_dims squashes only intensity/elongation (channel 5 is time lag).
_base_ = ["fsd_waymoD1_1x.py"]

point_cloud_range = (-80.0, -80.0, -2.0, 80.0, 80.0, 4.0)

model = dict(
    single_stage=dict(
        segmentor=dict(
            voxel_downsampling_size=(0.05, 0.05, 0.05),
            tanh_dims=(3, 4),
            # 3-sweep VFE (reference: in_channels=6, feat_channels 32/64)
            vfe=dict(feat_channels=(32, 64), mode="max"),
        ),
    ),
)

# 3 sweeps ≈ 3x the per-frame points before dedup
capacity = dict(max_points=393216)
data = dict(
    dataset="waymo", load_interval=1, samples_per_device=1,
    train_pipeline=[
        dict(type="LoadPointsFromMultiSweeps", sweeps_num=2, load_dim=6,
             use_dim=(0, 1, 2, 3, 4, 5)),
        dict(type="RandomFlip3D"),
        dict(type="GlobalRotScaleTrans"),
        dict(type="PointsRangeFilter", point_cloud_range=point_cloud_range),
        dict(type="ObjectRangeFilter", point_cloud_range=point_cloud_range),
        dict(type="PointShuffle"),
        dict(type="PadToCap", max_points=393216),
    ],
)
