# FSD on Argoverse 2 (counterpart of configs/argo/*, 26 classes).
_base_ = ["fsd_waymoD1_1x.py"]

point_cloud_range = (-200.0, -200.0, -4.0, 200.0, 200.0, 4.0)
class_names = (
    "Regular_vehicle", "Pedestrian", "Bicyclist", "Motorcyclist",
    "Wheeled_rider", "Bollard", "Construction_cone", "Sign",
    "Construction_barrel", "Stop_sign", "Mobile_pedestrian_crossing_sign",
    "Large_vehicle", "Bus", "Box_truck", "Truck", "Vehicular_trailer",
    "Truck_cab", "School_bus", "Articulated_bus", "Message_board_trailer",
    "Bicycle", "Motorcycle", "Wheeled_device", "Wheelchair", "Stroller", "Dog",
)

model = dict(
    single_stage=dict(
        point_cloud_range=point_cloud_range,
        num_classes=26,
        class_names=class_names,
        score_thresh=(0.2,) * 26,
        cluster_voxel_size=tuple([(0.3, 0.3, 8.0)] * 26),
        connected_dist=tuple([0.5] * 26),
        caps=dict(
            fg_per_class=tuple([2048] * 26),
            cluster_voxels_per_class=tuple([2048] * 26),
            clusters_per_class=tuple([128] * 26),
            pre_voxels=131072,
        ),
        segmentor=dict(
            voxel_size=(0.32, 0.32, 0.32),
            head=dict(num_classes=26, hidden_dims=(128, 128)),
        ),
        head=dict(
            tasks=tuple((n,) for n in class_names),
            class_names=class_names,
        ),
    ),
    roi_head=dict(
        pos_iou_thr=(0.5,) * 26,
        cls_pos_thr=(0.7,) * 26,
        cls_neg_thr=(0.2,) * 26,
    ),
)

data = dict(dataset="argo2", load_interval=1, samples_per_device=1)
