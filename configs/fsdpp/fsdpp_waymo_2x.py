# FSD++ incremental multi-frame Waymo (counterpart of the reference's
# configs/fsd/fsd++_waymo*.py, docs/FSD++_instructions.md): FSD two-stage
# over residual current-frame points + seed-cropped history points.

import copy as _copy
import os as _os

from sst_tpu.utils.config import load_config as _load

_fsd = _load(_os.path.join(_os.path.dirname(__file__), "..", "fsd",
                           "fsd_waymoD1_1x.py"))

# Residual-sized capacity: after the incremental mask, a 7-frame Waymo
# stack keeps ~15-25% of its points (residual current-frame voxels + seed
# crops), so the FSD pipeline runs at ~1/2-scale caps over a compacted
# [B, 65536, C] buffer instead of the raw 262k multi-frame buffer. This is
# FSD++'s super-sparsity made real under static shapes — overflow is
# observable via num_residual_overflow / the segmentor cap counters.
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
# seeds_path from tools/fsdpp/generate_seeds.py; data_root/info_path from
# tools/create_data.py waymo; override with --cfg-options.
data = dict(dataset="waymo", load_interval=1, samples_per_device=1,
            sequential=True, num_previous_frames=6,
            data_root="data/waymo/kitti_format",
            info_path="data/waymo/kitti_format/waymo_infos_train.pkl",
            seeds_path="data/fsdpp/seed_boxes.pkl")
optimizer = dict(base_lr=1e-5, weight_decay=0.05, clip_norm=10.0)
schedule = dict(max_epochs=24)
