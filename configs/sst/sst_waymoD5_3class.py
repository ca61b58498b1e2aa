# SST Waymo-D5 3-class single-frame (counterpart of the reference's
# configs/sst/sst_waymoD5_1x_3class_8heads.py). Static caps sized for a Waymo
# frame (~180k in-range points, ~30k pillars) with headroom.
_base_ = ["../_base_/sst_base.py"]

capacity = dict(
    max_points=196608,
    max_voxels=65536,
    # the 468/12 window grid holds at most 39*39=1521 (shifted 40*40=1600)
    # windows per shift, so 2048 covers the theoretical maximum
    max_total_windows=2048,
)

# train/test drop-info variants (reference drop_info_training / drop_info_test).
# Window caps sized from measured dense-frame occupancy (~600/550/200/120
# windows per bucket) with >=2x headroom; the hard grid bound is 1600 total.
# Caps cover the whole per-device batch: scale max_windows (and
# max_total_windows) by samples_per_device when raising it above 1.
# Overflow drops are observable as num_window_dropped_voxels in train metrics.
region_batching_train = [
    dict(max_tokens=30, drop_range=(0, 30), max_windows=1536),
    dict(max_tokens=60, drop_range=(30, 60), max_windows=1280),
    dict(max_tokens=100, drop_range=(60, 100000), max_windows=768),
]
region_batching_test = [
    dict(max_tokens=30, drop_range=(0, 30), max_windows=1536),
    dict(max_tokens=60, drop_range=(30, 60), max_windows=1280),
    dict(max_tokens=100, drop_range=(60, 100), max_windows=512),
    dict(max_tokens=144, drop_range=(100, 100000), max_windows=256),
]

data = dict(
    dataset="waymo",
    load_interval=5,
    samples_per_device=1,
)
