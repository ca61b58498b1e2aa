# FSDv2 on Argoverse 2 (counterpart of the reference's
# configs/fsdv2/fsdv2_argo_2x.py): 26 classes in 6 batched_group_sample
# groups, 0.4 m virtual voxels over the ±204.8 m range.
_base_ = ["fsdv2_waymo_1x.py"]

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
    class_names[:1], class_names[1:5], class_names[5:11], class_names[11:20],
    class_names[20:25], class_names[25:],
)

model = dict(
    point_cloud_range=point_cloud_range,
    virtual_voxel_size=(0.4, 0.4, 0.4),
    num_classes=26,
    class_names=class_names,
    group_names=group_names,
    # per-group seg_score_thresh (reference fsdv2_argo_2x.py)
    score_thresh=(0.4, 0.25, 0.25, 0.25, 0.25, 0.25),
    caps=dict(
        fg_per_class=(8192, 4096, 4096, 4096, 4096, 1024),
        voxels=81920,
        union_voxels=98304,
        virtual_out=16384,
    ),
    multiscale_levels=(0, 1, 2),
    ms_projector_hiddens=((256, 128), (128, 128), (128, 128)),
    segmentor=dict(
        voxel_size=(0.2, 0.2, 0.2),
        # 26 classes + background column (batched_group_sample softmax)
        head=dict(num_classes=27, hidden_dims=(128, 128)),
    ),
    head=dict(
        tasks=group_names,
        class_names=class_names,
    ),
)

capacity = dict(max_points=131072)
data = dict(dataset="argo2", load_interval=1, samples_per_device=1)
schedule = dict(max_epochs=24)
