from sst_tpu.ops.segment import (
    UniqueResult,
    gather_segments,
    scatter_v2,
    segment_max_with_argmax,
    segment_reduce,
    unique_segments,
)
from sst_tpu.ops.voxelize import (
    VoxelMapping,
    compute_voxel_coords,
    delinearize_key,
    dynamic_voxelize,
    grid_shape_zyx,
    hard_voxelize,
    linearize_coords,
)
from sst_tpu.ops.ccl import compact_labels, connected_components, topk_compact
from sst_tpu.ops.fps import furthest_point_sample, group_fps_mask
from sst_tpu.ops.incremental import (
    box_frame_transform,
    delta_points_mask,
    points_frame_transform,
)
from sst_tpu.ops.pallas_attention import window_mha
from sst_tpu.ops.pointnet import (
    ball_query,
    gather_points,
    grouping_operation,
    knn,
    query_and_group,
    three_interpolate,
    three_nn,
)
from sst_tpu.ops.window import (
    BucketSpec,
    FlatToWindow,
    build_flat2win,
    drop_and_bucket,
    flat2window,
    get_window_coors,
    window2flat,
    window_key_padding,
)
