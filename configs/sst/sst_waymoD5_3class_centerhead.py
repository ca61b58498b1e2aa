# SST with CenterPoint head (counterpart of the reference's
# configs/sst_refactor/sst_waymoD5_1x_3class_centerhead*.py).
_base_ = ["sst_waymoD5_3class.py"]

model = dict(
    head_type="center",
    head=dict(
        _delete_=True,
        in_channels=384,
        share_conv_channel=64,
        head_conv=64,
        common_heads=(("reg", 2, 2), ("height", 1, 2), ("dim", 3, 2),
                      ("rot", 2, 2)),
        tasks=(("Car",), ("Pedestrian",), ("Cyclist",)),
        class_names=("Car", "Pedestrian", "Cyclist"),
        out_size_factor=1,
        gaussian_overlap=0.1,
        min_radius=2.0,
    ),
    test_cfg=dict(
        _delete_=True,
        score_thr=0.1, nms_thr=0.25, nms_pre=1024, max_num=500,
        use_rotate_nms=True,
    ),
)
