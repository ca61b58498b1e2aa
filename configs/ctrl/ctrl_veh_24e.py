# CTRL vehicle auto-labeling (counterpart of the reference's
# configs/ctrl/*vehicle* + docs/CTRL_instructions.md): per-tracklet
# multi-frame refinement in the track-centric frame.

model = dict(
    type="TrackletDetector",
    segmentor=dict(
        point_cloud_range=(-6.4, -6.4, -4.0, 6.4, 6.4, 4.0),
        voxel_size=(0.1, 0.1, 0.2),
        max_voxels=16384,
        unet_level_caps=(16384, 8192, 4096),
        unet_strides=((2, 2, 2),) * 2,
        unet_paddings=((1, 1, 1),) * 2,
        ts_normalizer=20.0,
        vfe=dict(feat_channels=(64, 64), mode="max"),
        unet=dict(
            in_channels=64, base_channels=64,
            encoder_channels=((64,), (64, 64), (128, 128)),
            decoder_channels=((128, 128, 64), (64, 64, 64), (64, 64, 64)),
        ),
    ),
    roi_head=dict(
        num_classes=1,
        extra_wlh=(0.5, 0.5, 0.5),
        max_inbox_point=256,
        cls_pos_thr=0.8,
        cls_neg_thr=0.2,
        bbox_head=dict(
            num_blocks=6,
            feat_channels=((128, 128),) * 6,
            rel_mlp_hidden=((16, 32),) * 6,
            reg_mlp=(512, 512),
            cls_mlp=(512, 512),
        ),
    ),
)

capacity = dict(max_points=32768, max_frames=200)
# tools/ctrl/generate_track_input.py + extract_poses.py + generate_candidates.py
# produce the pkl inputs; override paths with --cfg-options.
data = dict(
    dataset="waymo_tracklet", samples_per_device=2,
    data_root="data/waymo/kitti_format/training",
    tracklet_path="data/ctrl/tracklets.pkl",
    poses_path="data/ctrl/poses.pkl",
    frame_index_path="data/ctrl/frame_index.pkl",
    candidates_path="data/ctrl/candidates.pkl",
)
optimizer = dict(base_lr=1e-4, weight_decay=0.01, clip_norm=10.0)
schedule = dict(max_epochs=24)
