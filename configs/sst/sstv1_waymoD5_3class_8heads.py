# SSTv1 Waymo-D5 3-class (counterpart of the reference's
# configs/sst/sst_waymoD5_1x_3class_8heads.py: type='SSTv1' backbone +
# SSTInputLayer v1, same window shape / drop info / head as the v2 config).
_base_ = ["sst_waymoD5_3class.py"]

model = dict(
    backbone_type="sstv1",
    backbone=dict(
        num_attached_conv=3,
        conv_kwargs=(
            dict(kernel_size=3, dilation=1),
            dict(kernel_size=3, dilation=1),
            dict(kernel_size=3, dilation=2),
        ),
    ),
)
