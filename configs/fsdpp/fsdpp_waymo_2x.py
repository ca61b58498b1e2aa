# FSD++ incremental multi-frame Waymo (counterpart of the reference's
# configs/fsd/fsd++_waymo*.py, docs/FSD++_instructions.md): FSD two-stage
# over residual current-frame points + seed-cropped history points.

import os as _os

from sst_tpu.utils.config import load_config as _load

_fsd = _load(_os.path.join(_os.path.dirname(__file__), "..", "fsd",
                           "fsd_waymoD1_1x.py"))

model = dict(
    type="TwoStageFSDPP",
    point_cloud_range=(-80.0, -80.0, -2.0, 80.0, 80.0, 4.0),
    inc_voxel_size=(0.4, 0.4, 0.4),
    extra_width=(0.5, 0.5, 0.5),
    pre_score_thr=0.3,
    center_noise=0.3,
    dim_noise=0.1,
    yaw_noise=0.1,
    fsd=dict(
        single_stage=_fsd["model"]["single_stage"],
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
