# Tiny SST for CLI smoke tests / CI on CPU (not a reference counterpart).
half = 6.4

model = dict(
    type="DynamicVoxelNet",
    voxel_size=(0.4, 0.4, 6.0),
    point_cloud_range=(-half, -half, -2.0, half, half, 4.0),
    window_shape=(4, 4),
    vfe=dict(feat_channels=(16, 32)),
    backbone=dict(
        d_model=(32, 32), nhead=(2, 2), num_blocks=2,
        dim_feedforward=(64, 64), num_attached_conv=1,
        conv_kwargs=(dict(kernel_size=3, dilation=1),),
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

capacity = dict(max_points=2048, max_voxels=512, max_total_windows=128)
region_batching_train = [
    dict(max_tokens=8, drop_range=(0, 8), max_windows=64),
    dict(max_tokens=16, drop_range=(8, 100000), max_windows=32),
]
region_batching_test = region_batching_train
data = dict(dataset="synthetic", samples_per_device=2)
optimizer = dict(base_lr=1e-4, weight_decay=0.01, clip_norm=10.0)
schedule = dict(max_steps=10)
fsd_detection_schedule = dict(enable_after=2, buffer_start=0.2,
                              delay_buffer_until=4)
