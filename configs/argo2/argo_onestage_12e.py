# FSD one-stage on Argoverse 2 (counterpart of the reference's
# configs/argo2/argo_onestage_12e.py): 26 classes sampled/clustered in 6
# groups via group_sample (single_stage_fsd.py:818) — the segmentor head
# carries a background column (27 logits) and group fg scores are softmax
# member-probability sums.

point_cloud_range = (-204.8, -204.8, -3.2, 204.8, 204.8, 3.2)

class_names = (
    "Regular_vehicle",
    "Pedestrian", "Bicyclist", "Motorcyclist", "Wheeled_rider",
    "Bollard", "Construction_cone", "Sign", "Construction_barrel",
    "Stop_sign", "Mobile_pedestrian_crossing_sign",
    "Large_vehicle", "Bus", "Box_truck", "Truck", "Vehicular_trailer",
    "Truck_cab", "School_bus", "Articulated_bus", "Message_board_trailer",
    "Bicycle", "Motorcycle", "Wheeled_device", "Wheelchair", "Stroller",
    "Dog",
)
group_names = (
    class_names[:1],      # regular vehicle
    class_names[1:5],     # pedestrian-like
    class_names[5:11],    # small static objects
    class_names[11:20],   # large vehicles
    class_names[20:25],   # two-wheelers & devices
    class_names[25:],     # dog
)

_segmentor = dict(
    voxel_size=(0.2, 0.2, 0.2),
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
        remat=True,
    ),
    # 26 classes + background column (reference uses softmax CE with a 0.1
    # background weight; the repo's focal-with-background idiom matches the
    # nuScenes FSDv2 recipe, configs/fsdv2/fsdv2_nusc_1x.py)
    head=dict(num_classes=27, hidden_dims=(128, 128)),
)

model = dict(
    type="SingleStageFSD",
    point_cloud_range=point_cloud_range,
    num_classes=26,
    class_names=class_names,
    group_names=group_names,
    # per-group (reference argo_onestage_12e.py seg_score_thresh /
    # cluster_assigner)
    score_thresh=(0.4, 0.25, 0.25, 0.25, 0.25, 0.25),
    cluster_voxel_size=((0.3, 0.3, 6.4), (0.05, 0.05, 6.4), (0.08, 0.08, 6.4),
                        (0.5, 0.5, 6.4), (0.1, 0.1, 6.4), (0.08, 0.08, 6.4)),
    connected_dist=(0.6, 0.1, 0.15, 1.0, 0.2, 0.15),
    min_points=2,
    pre_voxelization_size=(0.1, 0.1, 0.1),
    caps=dict(
        fg_per_class=(8192, 4096, 4096, 4096, 4096, 1024),
        cluster_voxels_per_class=(8192, 8192, 8192, 8192, 8192, 2048),
        clusters_per_class=(512, 512, 512, 512, 512, 128),
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
)

capacity = dict(max_points=131072)
data = dict(dataset="argo2", load_interval=1, samples_per_device=1)
optimizer = dict(base_lr=1e-5, weight_decay=0.05, clip_norm=10.0)
schedule = dict(max_epochs=12)
fsd_detection_schedule = dict(enable_after=4000, buffer_start=0.3,
                              delay_buffer_until=8000)
