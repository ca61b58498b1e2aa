# FSDv2 nuScenes, 2x schedule (reference configs/fsdv2/fsdv2_nusc_2x.py:
# identical model, max_epochs 12 -> 24, aug disabled for the last 5 epochs
# instead of 3).
_base_ = ["fsdv2_nusc_1x.py"]

schedule = dict(max_epochs=24)
disable_aug_schedule = dict(disable_after_step=19 * 3500,
                            disabled_types=("ObjectSample",))
