# FSDv2 Waymo, 2x schedule (reference configs/fsdv2/fsdv2_waymo_2x.py:
# identical model, max_epochs 12 -> 24).
_base_ = ["fsdv2_waymo_1x.py"]

schedule = dict(max_epochs=24)
