# FSDv2 on nuScenes (counterpart of configs/fsdv2/fsdv2_nusc_1x.py):
# 10 classes in 6 task groups, velocity regression (code_size 10), CBGS.
_base_ = ["fsdv2_waymo_1x.py"]

point_cloud_range = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
class_names = (
    "car", "truck", "trailer", "bus", "construction_vehicle", "bicycle",
    "motorcycle", "pedestrian", "traffic_cone", "barrier",
)

model = dict(
    point_cloud_range=point_cloud_range,
    virtual_voxel_size=(0.4, 0.4, 0.4),
    num_classes=10,
    class_names=class_names,
    # batched_group_sample (single_stage_fsd_v2.py:790): 6 groups, per-group
    # thresholds; the segmentor carries a background column (11 logits).
    group_names=(("car",), ("truck", "construction_vehicle"),
                 ("bus", "trailer"), ("barrier",),
                 ("motorcycle", "bicycle"), ("pedestrian", "traffic_cone")),
    score_thresh=(0.2,) * 6,
    caps=dict(
        fg_per_class=(4096,) * 6,
        voxels=65536,
        union_voxels=81920,
        virtual_out=16384,
    ),
    segmentor=dict(
        voxel_size=(0.2, 0.2, 0.2),
        head=dict(num_classes=11, hidden_dims=(128, 128)),
    ),
    head=dict(
        tasks=(("car",), ("truck", "construction_vehicle"), ("bus", "trailer"),
               ("barrier",), ("motorcycle", "bicycle"),
               ("pedestrian", "traffic_cone")),
        class_names=class_names,
        with_vel=True,
    ),
)

data = dict(dataset="nuscenes", load_interval=1, samples_per_device=2,
            cbgs=True)
