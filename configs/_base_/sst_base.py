# Base SST model config (counterpart of the reference's
# configs/_base_/models/sst_base.py, expressed in sst_tpu's schema).
model = dict(
    type="DynamicVoxelNet",
    voxel_size=(0.32, 0.32, 6.0),
    point_cloud_range=(-74.88, -74.88, -2.0, 74.88, 74.88, 4.0),
    window_shape=(12, 12),
    vfe=dict(feat_channels=(64, 128)),
    backbone=dict(
        d_model=(128,) * 6,
        nhead=(8,) * 6,
        num_blocks=6,
        dim_feedforward=(256,) * 6,
        num_attached_conv=3,
        conv_kwargs=(
            dict(kernel_size=3, dilation=1),
            dict(kernel_size=3, dilation=1),
            dict(kernel_size=3, dilation=2),
        ),
        conv_out_channel=128,
        in_channel=128,
    ),
    neck=dict(out_channels=(384,)),
    head=dict(
        num_classes=3,
        feat_channels=384,
        anchor_ranges=(
            (-74.88, -74.88, -0.0345, 74.88, 74.88, -0.0345),
            (-74.88, -74.88, -0.1188, 74.88, 74.88, -0.1188),
            (-74.88, -74.88, 0.0, 74.88, 74.88, 0.0),
        ),
        anchor_sizes=((2.08, 4.73, 1.77), (0.84, 1.81, 1.77), (0.84, 0.91, 1.74)),
        assigner_thrs=((0.55, 0.4, 0.4), (0.5, 0.3, 0.3), (0.5, 0.3, 0.3)),
    ),
    test_cfg=dict(score_thr=0.1, nms_thr=0.25, nms_pre=4096, max_num=500,
                  use_rotate_nms=True),
)

optimizer = dict(base_lr=1e-5, weight_decay=0.05, clip_norm=10.0)
schedule = dict(max_epochs=24)
