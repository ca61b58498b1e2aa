# SST Waymo-D5 3-class single-frame (counterpart of the reference's
# configs/sst/sst_waymoD5_1x_3class_8heads.py). Static caps sized for a Waymo
# frame (~180k in-range points, ~30k pillars) with headroom.
_base_ = ["../_base_/sst_base.py"]

capacity = dict(
    max_points=196608,
    max_voxels=65536,
    max_total_windows=16384,
)

# train/test drop-info variants (reference drop_info_training / drop_info_test)
region_batching_train = [
    dict(max_tokens=30, drop_range=(0, 30), max_windows=8192),
    dict(max_tokens=60, drop_range=(30, 60), max_windows=2048),
    dict(max_tokens=100, drop_range=(60, 100000), max_windows=1024),
]
region_batching_test = [
    dict(max_tokens=30, drop_range=(0, 30), max_windows=8192),
    dict(max_tokens=60, drop_range=(30, 60), max_windows=2048),
    dict(max_tokens=100, drop_range=(60, 100), max_windows=1024),
    dict(max_tokens=144, drop_range=(100, 100000), max_windows=256),
]

data = dict(
    dataset="waymo",
    load_interval=5,
    samples_per_device=1,
)
