# SST with weighted NMS (counterpart of the reference's
# configs/sst/sst_waymoD5_1x_car_8heads_wnms.py, RangeDet-style wnms).
_base_ = ["sst_waymoD5_3class.py"]

model = dict(
    test_cfg=dict(
        _delete_=True,
        score_thr=0.1, nms_thr=0.25, nms_pre=1024, max_num=500,
        use_rotate_nms=True, use_wnms=True, wnms_thr_lo=0.1, wnms_thr_hi=0.7,
    ),
)
