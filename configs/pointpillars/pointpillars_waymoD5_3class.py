# PointPillars Waymo baseline (counterpart of the mmdet3d-inherited
# hv_pointpillars configs; SURVEY §2.11 legacy family): hard pillars 0.32m,
# PFN(64), SECOND(64,128,256)/FPN(128x3), 3-class Anchor3DHead.

point_cloud_range = (-74.88, -74.88, -2.0, 74.88, 74.88, 4.0)

model = dict(
    type="PointPillars",
    voxel_size=(0.32, 0.32, 6.0),
    point_cloud_range=point_cloud_range,
    max_voxels=32000,
    max_points_per_voxel=20,
    vfe_type="pillar",
    vfe=dict(feat_channels=(64,)),
    backbone=dict(out_channels=(64, 128, 256), layer_nums=(3, 5, 5),
                  # (1, 2, 2): keeps every FPN level an even multiple of the
                  # 468 grid (the reference dv_pointpillars_secfpn_waymo.py:31
                  # strides; (2,2,2) left level 2 at 117 -> 468/117 not an
                  # integer upsample and the FPN concat shapes diverged)
                  layer_strides=(1, 2, 2)),
    neck=dict(out_channels=(128, 128, 128), upsample_strides=(1, 2, 4)),
    head=dict(num_classes=3, feat_channels=384),
    test_cfg=dict(score_thr=0.1, nms_thr=0.25, nms_pre=1024, max_num=500,
                  use_rotate_nms=True),
)

capacity = dict(max_points=196608)
data = dict(dataset="waymo", load_interval=5, samples_per_device=2,
            data_root="data/waymo/kitti_format",
            info_path="data/waymo/kitti_format/waymo_infos_train.pkl")
optimizer = dict(base_lr=1e-3, weight_decay=0.01, clip_norm=35.0)
schedule = dict(max_epochs=24)
