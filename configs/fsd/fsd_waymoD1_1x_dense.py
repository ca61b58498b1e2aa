# FSD two-stage, Waymo full-resolution — TPU-native dense-BEV segmentor
# variant. Identical single-stage sampling / clustering / SIR / SIR² RoI
# pipeline to fsd_waymoD1_1x.py; only the VoteSegmentor's sparse 3D UNet is
# replaced by the z-banded dense 2D BEV UNet (models/dense_bev.py) — the
# same module-for-module swap the FSDv2 flagship A/B validated at
# matched-or-better quality (AB_DENSE_SPARSE_r03.json: z_groups=4 dense
# Overall L1 mAP 35.6 vs sparse 33.2 on identical data). The sparse
# segmentor was 211 of 278 ms/frame (profiled via /tmp stage timing, round
# 3); every FLOP of the dense UNet lands on the MXU instead of 27-tap row
# gathers.

_base_ = ["fsd_waymoD1_1x.py"]

model = dict(
    single_stage=dict(
        segmentor=dict(
            backbone="dense_bev",
            z_groups=4,
            # 640²-resolution canvas widths are HBM-bound; 24 channels per
            # band matches the A/B-selected FSDv2 flagship settings
            dense_pre_channels=24,
            dense_group_channels=24,
            unet=dict(
                _delete_=True,  # dense UNet schema differs from the sparse one
                encoder_channels=((64, 64), (128, 128), (256, 256),
                                  (256, 256)),
                decoder_channels=(256, 128, 128),
                out_channels=128,
            ),
        ),
    ),
)
