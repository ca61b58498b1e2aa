# FSDv2 single-stage, Waymo (counterpart of the reference's
# configs/fsdv2/fsdv2_waymo_1x.py). Mirrors sst_tpu.flagship.fsdv2_waymo.

point_cloud_range = (-80.0, -80.0, -2.0, 80.0, 80.0, 4.0)

model = dict(
    type="SingleStageFSDV2",
    point_cloud_range=point_cloud_range,
    virtual_voxel_size=(0.5, 0.5, 0.5),
    score_thresh=(0.3, 0.25, 0.25),
    caps=dict(
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
        unet_level_caps=(131072, 65536, 32768, 16384, 8192, 4096),
        unet_strides=((2, 2, 2),) * 5,
        unet_paddings=((1, 1, 1),) * 5,
        vfe=dict(feat_channels=(64, 64), mode="max"),
        unet=dict(
            in_channels=64, base_channels=64,
            encoder_channels=((128,), (128, 128), (128, 128), (128, 128, 128),
                              (256, 256, 256), (256, 256, 256)),
            decoder_channels=((256, 256, 256), (256, 256, 128),
                              (128, 128, 128), (128, 128, 128),
                              (128, 128, 128), (128, 128, 128)),
        ),
        head=dict(num_classes=3, hidden_dims=(128, 128)),
    ),
    vfe=dict(feat_channels=(64, 128), mode="max"),
    mixer=dict(
        base_channels=64, output_channels=128,
        encoder_channels=((64,), (64, 64), (64, 64)),
        decoder_channels=((64, 64, 64), (64, 64, 64), (64, 64, 64)),
    ),
    head=dict(
        in_channel=128,
        shared_mlp_dims=(256, 256),
        common_attrs=(("center", 3, 2, 128), ("dim", 3, 2, 128),
                      ("rot", 2, 2, 128)),
        num_cls_layer=2,
        cls_hidden_dim=128,
    ),
    test_cfg=dict(score_thr=0.1, nms_thr=0.25, nms_pre=1024, max_num=500,
                  use_rotate_nms=True),
)

capacity = dict(max_points=196608)
data = dict(dataset="waymo", load_interval=1, samples_per_device=1)
optimizer = dict(base_lr=1e-5, weight_decay=0.05, clip_norm=10.0)
schedule = dict(max_epochs=12)
fsd_detection_schedule = dict(enable_after=4000, buffer_start=0.3,
                              delay_buffer_until=8000)
