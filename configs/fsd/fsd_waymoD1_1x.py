# FSD two-stage, Waymo full-resolution (counterpart of the reference's
# configs/fsd/fsd_waymoD1_1x.py). Static caps sized for a full Waymo frame.

point_cloud_range = (-80.0, -80.0, -2.0, 80.0, 80.0, 4.0)

_segmentor = dict(
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
        decoder_channels=((256, 256, 256), (256, 256, 128), (128, 128, 128),
                          (128, 128, 128), (128, 128, 128), (128, 128, 128)),
        # full-cap train steps overflow HBM without backward
        # rematerialization of the 27-tap gather intermediates
        remat=True,
    ),
    head=dict(num_classes=3, hidden_dims=(128, 128)),
)

model = dict(
    type="FSD",
    single_stage=dict(
        point_cloud_range=point_cloud_range,
        num_classes=3,
        class_names=("Car", "Pedestrian", "Cyclist"),
        score_thresh=(0.3, 0.25, 0.25),
        cluster_voxel_size=((0.3, 0.3, 6.0), (0.05, 0.05, 6.0), (0.2, 0.2, 6.0)),
        connected_dist=(0.6, 0.1, 0.4),
        min_points=2,
        pre_voxelization_size=(0.1, 0.1, 0.1),
        caps=dict(
            fg_per_class=(8192, 4096, 4096),
            cluster_voxels_per_class=(8192, 8192, 8192),
            clusters_per_class=(512, 512, 512),
            pre_voxels=131072,
        ),
        segmentor=_segmentor,
        backbone=dict(
            num_blocks=3,
            in_channels=(0, 0, 0),
            feat_channels=((128, 128), (128, 128), (128, 128)),
            rel_mlp_hidden=((16, 32), (16, 32), (16, 32)),
        ),
        head=dict(
            in_channel=128 * 3,
            shared_mlp_dims=(1024, 1024),
            common_attrs=(("center", 3, 2, 128), ("dim", 3, 2, 128),
                          ("rot", 2, 2, 128)),
            num_cls_layer=2,
            cls_hidden_dim=128,
        ),
        test_cfg=dict(score_thr=0.1, nms_thr=0.25, nms_pre=1024, max_num=500,
                      use_rotate_nms=True),
    ),
    roi_head=dict(
        extra_wlh=(0.5, 0.5, 0.5),
        max_inbox_point=256,
        # candidate buffer for points inside ≥1 enlarged roi (pairing itself
        # is uncapped per point, matching the reference CUDA op,
        # ops/dynamic_point_pool_op.py:12); overflow is observable via
        # losses['roi_membership_overflow'] and asserted zero by the soak
        max_paired_points=65536,
        pos_iou_thr=(0.55, 0.5, 0.5),
        # reference train_cfg.rcnn.sampler (configs/fsd/fsd_waymoD1_1x.py:234)
        sampler=dict(num=256, pos_fraction=0.55,
                     neg_piece_fractions=(0.8, 0.2),
                     neg_iou_piece_thrs=(0.55, 0.1)),
        cls_pos_thr=(0.75, 0.6, 0.6),
        cls_neg_thr=(0.25, 0.15, 0.15),
        bbox_head=dict(
            num_blocks=6,
            feat_channels=((128, 128),) * 6,
            rel_mlp_hidden=((16, 32),) * 6,
            reg_mlp=(512, 512),
            cls_mlp=(512, 512),
        ),
    ),
    rois_per_sample=256,
)

capacity = dict(max_points=196608)
data = dict(dataset="waymo", load_interval=1, samples_per_device=1)
optimizer = dict(base_lr=1e-5, weight_decay=0.05, clip_norm=10.0)
schedule = dict(max_epochs=12)
fsd_detection_schedule = dict(enable_after=4000, buffer_start=0.3,
                              delay_buffer_until=8000)
