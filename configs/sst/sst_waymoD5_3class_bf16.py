# SST Waymo-D5 3-class with the bf16 compute policy — the TPU counterpart of
# the reference's fp16 training flag (configs/sst/sst_waymoD5_1x_3class_8heads.py
# `fp16 = dict(loss_scale=32.0)`). bf16 keeps fp32 range, so no loss scaling;
# params/optimizer state stay fp32 (flax dtype= policy), activations run bf16
# through the MXU.
_base_ = ["sst_waymoD5_3class.py"]

model = dict(dtype="bfloat16")
