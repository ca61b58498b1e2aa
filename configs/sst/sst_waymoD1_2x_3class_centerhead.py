# SST + CenterHead on full-resolution Waymo, 2x schedule (counterpart of the
# reference's configs/sst_refactor/sst_waymoD1_2x_3class_centerhead.py:
# same model as the D5 centerhead build, load_interval 5 -> 1, 12 -> 24
# epochs).
_base_ = ["sst_waymoD5_3class_centerhead.py"]

data = dict(dataset="waymo", load_interval=1, samples_per_device=1)
schedule = dict(max_epochs=24)
