# FSD++ incremental multi-frame Waymo — dense-BEV segmentor variant.
# Same residual-point super-sparsity pipeline as fsdpp_waymo_2x.py (seed
# boxes + incremental voxel mask, reference two_stage_fsdpp.py:37); the
# VoteSegmentor's sparse 3D UNet is swapped for the z-banded dense 2D BEV
# UNet — the module-for-module swap A/B-validated on the FSD family
# (configs/fsd/fsd_waymoD1_1x_dense.py, AB_FSD_r03: dense quality >= sparse
# at 3.3x the FPS). The residual buffer is half-scale (65536 points), so
# the dense canvas work is the same 640² BEV grid at ~1/4 the occupancy.

import copy as _copy
import os as _os

from sst_tpu.utils.config import load_config as _load

_fsd = _load(_os.path.join(_os.path.dirname(__file__), "..", "fsd",
                           "fsd_waymoD1_1x_dense.py"))

_ss = _copy.deepcopy(_fsd["model"]["single_stage"])
_ss["segmentor"]["max_voxels"] = 65536
_ss["segmentor"]["unet_level_caps"] = (65536, 32768, 16384, 8192, 4096, 2048)
_ss["caps"]["pre_voxels"] = 65536

model = dict(
    type="TwoStageFSDPP",
    point_cloud_range=(-80.0, -80.0, -2.0, 80.0, 80.0, 4.0),
    inc_voxel_size=(0.4, 0.4, 0.4),
    extra_width=(0.5, 0.5, 0.5),
    pre_score_thr=0.3,
    center_noise=0.3,
    dim_noise=0.1,
    yaw_noise=0.1,
    residual_points_cap=65536,
    fsd=dict(
        single_stage=_ss,
        roi_head=_fsd["model"]["roi_head"],
        rois_per_sample=_fsd["model"]["rois_per_sample"],
    ),
)

capacity = dict(max_points=262144,  # multi-frame concat needs headroom
                max_seeds=256, max_gt=128)
data = dict(dataset="waymo", load_interval=1, samples_per_device=1,
            sequential=True, num_previous_frames=6,
            data_root="data/waymo/kitti_format",
            info_path="data/waymo/kitti_format/waymo_infos_train.pkl",
            seeds_path="data/fsdpp/seed_boxes.pkl")
optimizer = dict(base_lr=1e-5, weight_decay=0.05, clip_norm=10.0)
schedule = dict(max_epochs=24)
