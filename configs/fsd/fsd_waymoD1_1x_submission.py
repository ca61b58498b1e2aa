# FSD Waymo leaderboard submission (reference
# configs/fsd/fsd_waymoD1_1x_submission.py: identical model; train on
# train+val infos, run inference on the test split).
_base_ = ["fsd_waymoD1_1x.py"]

data = dict(
    dataset="waymo", load_interval=1, samples_per_device=1,
    info_path="data/waymo/kitti_format/waymo_infos_trainval.pkl",
    val_info_path="data/waymo/kitti_format/waymo_infos_test.pkl",
)
